"""Multimodal column plumbing — images/audio/video as opaque
``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` (LLM-data-pipeline operators).

The heavyweight codec libraries (PIL, ffmpeg, librosa) are NOT in
this container. Where a format has a tractable public spec the codec
is implemented for real (PNG decode/resize/encode in
functions/png.py, used by ``resize_images``); elsewhere the kernels
keep real Spark-side plumbing (schemas, batching, partitioning, UDF
signatures) with the codec call swapped for either the real library
(if importable) or a clearly-marked deterministic fake. The fake
derives metadata from byte content arithmetic so tests and oracles
are reproducible.

Scale notes: binary payloads stay in Arrow record batches end to
end (no Python-object per-row boxing); ``mapInPandas`` streams
batches so a partition never materializes fully in memory; decode
parallelism = partition count. Partition by content-size buckets
when payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - PIL not present in this environment
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_dims(byte_len: int) -> tuple[int, int]:
    """Deterministic stand-in for a codec's header parse — derived
    from payload length only, reproducible in SQL."""
    return 64 + byte_len % 257, 64 + (byte_len * 31) % 257


def decode_image_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column. Uses
    PIL when available; otherwise the deterministic fake decode."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame()
            out["doc_id"] = pdf[id_col]
            out["byte_len"] = pdf[bin_col].map(len).astype("int64")
            if _HAS_PIL:
                import io

                def real(b):
                    try:
                        im = Image.open(io.BytesIO(b))
                        return im.format or "UNKNOWN", im.width, im.height
                    except Exception:
                        return "INVALID", -1, -1

                meta = pdf[bin_col].map(real)
                out["format"] = meta.map(lambda m: m[0])
                out["width"] = meta.map(lambda m: m[1]).astype("int32")
                out["height"] = meta.map(lambda m: m[2]).astype("int32")
            else:
                dims = out["byte_len"].map(_fake_dims)
                out["format"] = "FAKE"
                out["width"] = dims.map(lambda d: d[0]).astype("int32")
                out["height"] = dims.map(lambda d: d[1]).astype("int32")
            yield out

    return df.mapInPandas(fn, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("resized", BinaryType()),
        StructField("out_format", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_energy", LongType()),
        StructField("peak_frame", LongType()),
    ]
)


def audio_frame_energy(df: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Audio feature-extraction plumbing: frame the payload into
    fixed byte windows and compute per-frame energy (sum of sample
    bytes — the stand-in for RMS over decoded PCM; a real deploy
    swaps the numpy line for soundfile/librosa decode behind the
    same signature). Ties on peak energy resolve to the FIRST frame
    (numpy argmax ≡ SQL row_number ordered by energy desc, idx asc),
    which is what makes the value oracle exact."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                n = (len(a) + frame_bytes - 1) // frame_bytes
                energies = [
                    int(a[i * frame_bytes : (i + 1) * frame_bytes].sum(dtype=np.int64))
                    for i in range(n)
                ]
                if energies:
                    peak = int(np.argmax(energies))
                    rows.append((did, n, sum(energies), energies[peak], peak))
                else:
                    rows.append((did, 0, 0, 0, -1))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_ENERGY_SCHEMA.fields]
            )

    return df.mapInPandas(fn, AUDIO_ENERGY_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_video_frames(df: DataFrame, frame_bytes: int = 512, every_n: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as a stream
    of fixed-size frames and emit every ``every_n``-th one — the
    1-row-in / N-rows-out expansion shape of keyframe extraction
    (a real deploy swaps the byte slice for an ffmpeg/pyav seek
    behind the same signature). Emits the frame's md5 rather than
    the bytes so downstream frame-level dedup joins on 16-byte keys,
    not payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n = (len(raw) + frame_bytes - 1) // frame_bytes
                for j in range(0, n, every_n):
                    fr = raw[j * frame_bytes : (j + 1) * frame_bytes]
                    rows.append((did, j, len(fr), hashlib.md5(fr).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def ahash_images(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Perceptual average-hash (aHash) over PNG payloads: decode →
    8×8 floor-mapped nearest-neighbor downsample → threshold each
    cell against the 8×8 mean → 64-bit signature (bit y*8+x set when
    cell*64 >= total, i.e. cell >= mean without ever leaving integer
    arithmetic). Color images reduce to integer luma
    ((299R + 587G + 114B) // 1000) first.

    The signature is returned as a SIGNED 64-bit long (two's
    complement), so downstream band extraction ``(sig >> 16*i) &
    0xFFFF`` and ``bit_count(a ^ b)`` Hamming are plain JVM integer
    expressions — identical semantics in Spark and ANSI engines.

    Scale shape: one Arrow-batched mapInPandas stage, no shuffle —
    hashing is embarrassingly parallel; pair-finding on top of it is
    the caller's banded join (see queries/multimodal.py
    image_ahash_near_dupes)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                hashed = ahash_payload(bytes(b))
                if hashed is None:
                    # undecodable/unsupported payload: EXCLUDE from
                    # hashing rather than kill the stage (mirrors
                    # resize_images' mixed-corpus stance; a sentinel
                    # sig would band-collide all bad images into
                    # fake duplicate pairs)
                    continue
                rows.append((int(did),) + hashed)
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    return df.mapInPandas(fn, AHASH_SCHEMA)


def ahash_payload(raw: bytes) -> tuple | None:
    """The per-payload aHash worker behind :func:`ahash_images` —
    (sig, width, height) for ONE payload, or None when undecodable.
    Factored out (r12) so callers already inside a Python batch
    (``image_ahash_near_dupes``'s fused synthesize→hash kernel) run
    the IDENTICAL decode+hash path without routing payload bytes
    through extra JVM↔Python Arrow hops."""
    import numpy as np

    from ..functions import png as P

    try:
        img = P.decode_png(raw)
    except Exception:
        return None
    if img.ndim == 3 and img.shape[2] >= 3:
        # integer luma; alpha (if any) ignored
        r, g, bl = (img[..., i].astype(np.int64) for i in range(3))
        gray = (299 * r + 587 * g + 114 * bl) // 1000
    else:
        # 2-D gray, or (h, w, 1)/(h, w, 2) gray(+alpha)
        gray = (img if img.ndim == 2 else img[..., 0]).astype(np.int64)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = gray[np.ix_(ys, xs)]
    bits = (cells * 64 >= cells.sum()).flatten()  # row-major y*8+x
    sig_u = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        dtype=np.uint64
    )
    return (int(sig_u.astype(np.int64)), w, h)


def resize_images(
    df: DataFrame, max_w: int = 256, max_h: int = 256, raw_fallback_bytes: int = 1024
) -> DataFrame:
    """Real image resize over a binary column: decode → aspect-fit
    nearest-neighbor resample within (max_w, max_h) → re-encode PNG.

    Codec resolution per payload (binary-in / binary-out, Arrow
    batches end to end):
    - PNG payload → the pure-numpy codec in functions/png.py (8-bit
      non-interlaced gray/RGB/±alpha; public PNG spec). This path is
      CANONICAL regardless of PIL availability: its floor-mapped
      nearest-neighbor + fit_dims math is what the registered value
      oracle (``image_resize_pixelsum``) pins, and PIL's thumbnail
      rounds dims and maps source pixels differently — letting PIL
      take PNGs would flip the oracle red wherever PIL happens to be
      importable.
    - non-PNG payload, PIL importable → ``Image.thumbnail`` (NEAREST)
      + PNG re-encode (JPEG etc. get a real decode when the container
      has one).
    - anything else → deterministic RAW passthrough truncated to
      ``raw_fallback_bytes`` with out_format='RAW' and -1 dims, so a
      mixed corpus flows through instead of failing the batch.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA.fields]
        for pdf in batches:
            rows = [
                (did,) + resize_payload(bytes(b), max_w, max_h, raw_fallback_bytes)
                for did, b in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(fn, RESIZE_SCHEMA)


def resize_payload(
    raw: bytes, max_w: int, max_h: int, raw_fallback_bytes: int = 1024
) -> tuple:
    """The per-payload codec worker behind :func:`resize_images` —
    (resized_bytes, out_format, out_w, out_h) for ONE payload.
    Factored out (r12) so callers that already sit inside a Python
    batch (``image_resize_pixelsum``'s fused synthesize→resize→measure
    kernel) execute the IDENTICAL codec path without routing the
    payload bytes through extra JVM↔Python Arrow hops."""
    from ..functions import png as P

    try:
        if P.is_png(raw):
            img = P.decode_png(raw)
            nw, nh = P.fit_dims(img.shape[1], img.shape[0], max_w, max_h)
            return (P.encode_png(P.nn_resize(img, nw, nh)), "PNG", nw, nh)
        if _HAS_PIL:  # pragma: no cover - PIL absent here
            import io

            im = Image.open(io.BytesIO(raw))
            im.thumbnail((max_w, max_h), Image.NEAREST)
            buf = io.BytesIO()
            im.save(buf, "PNG")
            return (buf.getvalue(), "PNG", im.width, im.height)
    except Exception:
        pass  # undecodable/unsupported → RAW fallback below
    return (raw[:raw_fallback_bytes], "RAW", -1, -1)
