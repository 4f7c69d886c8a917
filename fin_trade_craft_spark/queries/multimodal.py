"""Driver query for the multimodal binary plumbing: documents text
encoded to a binary payload column, metadata extracted through the
Arrow-batched mapInPandas kernel (stub decode — the fake-dims
arithmetic is reproducible in SQL, so this pandas-UDF path gets a
full value oracle, unusual but deliberate: it proves the binary
batch plumbing end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_image_metadata
from ..sources.catalog import load_table


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = decode_image_metadata(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    hashes = docs.select("doc_id", F.md5("text").alias("content_md5"))
    return meta.join(hashes, "doc_id")


ORACLE_MULTIMODAL_METADATA = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS byte_len,
       'FAKE' AS format,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 257 AS INT) AS width,
       CAST(64 + (octet_length(CAST(text AS BLOB)) * 31) % 257 AS INT) AS height,
       md5(text) AS content_md5
FROM documents
"""


def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed energy profile over binary payloads (audio
    feature-extract plumbing; ASCII text bytes stand in for PCM)."""
    from ..operators.multimodal import audio_frame_energy as op

    docs = load_table(spark, sf_dir, "documents")
    return op(docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")), frame_bytes=256)


ORACLE_AUDIO_FRAME_ENERGY = """
WITH d AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS blen FROM documents
), fr AS (
  SELECT doc_id, j,
         list_sum(list_transform(range(j * 256 + 1, least((j + 1) * 256, blen) + 1),
                  i -> ord(substr(text, CAST(i AS INT), 1)))) AS energy
  FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(blen / 256.0) AS BIGINT))) AS j)
  WHERE blen > 0
), ranked AS (
  SELECT doc_id, j, energy,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY energy DESC, j ASC) AS rn
  FROM fr
)
SELECT d.doc_id,
       CAST(ceil(blen / 256.0) AS BIGINT) AS n_frames,
       CAST(COALESCE(s.total_energy, 0) AS BIGINT) AS total_energy,
       CAST(COALESCE(p.energy, 0) AS BIGINT) AS peak_energy,
       COALESCE(p.j, -1) AS peak_frame
FROM d
LEFT JOIN (SELECT doc_id, SUM(energy) AS total_energy FROM fr GROUP BY doc_id) s USING (doc_id)
LEFT JOIN (SELECT doc_id, j, energy FROM ranked WHERE rn = 1) p USING (doc_id)
"""


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over binary payloads (video keyframe
    plumbing; 512-byte frames, md5 identity per frame)."""
    from ..operators.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        frame_bytes=512,
        every_n=4,
    )


ORACLE_VIDEO_FRAME_SAMPLE = """
WITH d AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS blen FROM documents
)
SELECT doc_id, j AS frame_idx,
       least((j + 1) * 512, blen) - j * 512 AS frame_len,
       md5(substr(text, CAST(j * 512 + 1 AS INT), 512)) AS frame_md5
FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(blen / 512.0) AS BIGINT), 4)) AS j)
WHERE blen > 0
"""


def image_resize_pixelsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end proof of the REAL image resize (decode → NN resample
    → re-encode, functions/png.py): synthesize a deterministic
    gradient PNG per document (dims and pixels derived from doc_id by
    integer math), push it through ``resize_images`` (fit within
    24×24), then decode the EMITTED bytes and report the actual
    dimensions and pixel sum. Every output value is reproduced by the
    SQL oracle from doc_id alone — so a wrong filter, resample
    mapping, or encoder bug flips the value hash.

    Scale shape: ONE Arrow-batched mapInPandas stage and zero
    collects. Until r12 this was three chained mapInPandas stages
    (synthesize → resize_images → measure), which moved every PNG
    payload across the JVM↔Python Arrow boundary four times purely
    to hand it to the next Python stage (guide §4.1: you control how
    many columns cross the boundary — here the payload never needs
    to cross at all). The fused kernel calls the IDENTICAL codec
    worker ``operators.multimodal.resize_payload`` that
    ``resize_images`` wraps, so the canonical decode → fit →
    nn_resize → encode path (and the value oracle pinning it) is
    unchanged; only doc_id enters Python and four ints leave.
    Measured 1.9-2.1s → 1.1-1.2s at sf0.1 (A/B/A/B min-of-3).
    The one repartition exists ONLY because payloads are
    synthesized from doc_id here: a bare-id projection scans a few
    KB, so the file source yields 1-2 input splits and the codec
    stage would run near-serial (measured: the sf1 bench entry).
    Spreading the 8-byte ids across the session's cores costs ~ms;
    a real image corpus has byte-heavy payload splits and needs no
    such step."""
    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth_resize_measure(batches):
        from ..functions import png as P
        from ..operators.multimodal import resize_payload

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 49, 16 + (did * 7) % 49
                img = (
                    (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + did) % 256
                ).astype(np.uint8)
                resized_bytes = resize_payload(P.encode_png(img), 24, 24)[0]
                out = P.decode_png(resized_bytes)
                rows.append(
                    (did, out.shape[1], out.shape[0], int(out.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_width", "out_height", "pixel_sum"]
            )

    return docs.mapInPandas(
        synth_resize_measure, "doc_id long, out_width int, out_height int, pixel_sum long"
    ).orderBy("doc_id")


# fit_dims with max 24×24: width-limited iff w*24 >= h*24 iff w >= h;
# NN sample at (y, x) reads source pixel ((y*h)//nh, (x*w)//nw).
ORACLE_IMAGE_RESIZE_PIXELSUM = """
WITH d AS (
  SELECT doc_id, 16 + doc_id % 49 AS w, 16 + (doc_id * 7) % 49 AS h FROM documents
), dims AS (
  SELECT doc_id, w, h,
         CASE WHEN w <= 24 AND h <= 24 THEN w
              WHEN w >= h THEN 24
              ELSE GREATEST(1, (w * 24) // h) END AS nw,
         CASE WHEN w <= 24 AND h <= 24 THEN h
              WHEN w >= h THEN GREATEST(1, (h * 24) // w)
              ELSE 24 END AS nh
  FROM d
)
SELECT doc_id,
       CAST(nw AS INT) AS out_width,
       CAST(nh AS INT) AS out_height,
       CAST(SUM((((x * w) // nw) * 3 + ((y * h) // nh) * 5 + doc_id) % 256) AS BIGINT)
         AS pixel_sum
FROM dims,
     LATERAL (SELECT unnest(range(0, nh)) AS y),
     LATERAL (SELECT unnest(range(0, nw)) AS x)
GROUP BY doc_id, nw, nh
ORDER BY doc_id
"""


AHASH_MAX_HAMMING = 6


def image_ahash_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image deduplication, end to end on REAL pixel
    data: synthesize a deterministic gradient PNG per document
    (consecutive doc_id triples share a base pattern, each member
    perturbed by a tiny per-member noise term — planted near-dups),
    aHash the DECODED bytes (operators/multimodal.ahash_images),
    then find near-duplicate pairs with a banded join: candidates
    are pairs agreeing exactly on ≥1 of four 16-bit bands (the
    pigeonhole GUARANTEE covers Hamming ≤ 3; distances 4-6 are
    caught at high recall — a miss needs the flipped bits spread
    across all 4 bands — same contract as simhash_hamming_pairs),
    then verified with exact ``bit_count(a ^ b)``; never an
    all-pairs scan.

    Because every pixel derives from doc_id by integer math and the
    whole aHash pipeline (floor-NN 8×8, mean threshold) stays in
    integers, the SQL oracle reproduces the signatures bit-for-bit
    from doc_id alone — a wrong decode, resample or threshold flips
    the value hash.

    Scale shape: hash = map-only; candidates = 4 equi-joins keyed
    by (band_idx, band_value) with distinct-pair dedup; verify =
    O(candidates). Identical shape to simhash_hamming_pairs, which
    covers text — this is its image twin. The doc_id repartition
    exists only because payloads are synthesized from the id (see
    image_resize_pixelsum: a bare-id scan is 1-2 input splits and
    would serialize the codec stages)."""
    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    # Fused synthesize→hash kernel (r12, guide §4 — same treatment as
    # image_resize_pixelsum): the payload used to cross the Arrow
    # boundary twice (out of the synth stage, into the hash stage)
    # purely to reach the next Python stage. The fused kernel runs
    # the IDENTICAL codec path — encode_png then the factored
    # ahash_payload worker, i.e. still a real encode→decode→hash of
    # PNG bytes — so only doc_id enters Python and (doc_id, sig)
    # leaves. Plan: 2 Python eval nodes → 1.
    def synth_hash(batches):
        from ..functions import png as P
        from ..operators.multimodal import ahash_payload

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                p, m = did // 3, did % 3
                sx, sy = 1 + p % 251, 1 + (p * 7) % 241
                base = (p * 97) % 256
                w, h = 16 + p % 49, 16 + (p * 7) % 49
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                noise = m * ((x * 7 + y * 13) % 5 == 0)
                img = ((x * sx + y * sy + base + noise) % 256).astype(np.uint8)
                hashed = ahash_payload(P.encode_png(img))
                if hashed is None:  # pragma: no cover - synth PNGs decode
                    continue
                rows.append((did, hashed[0]))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    sigs = docs.mapInPandas(synth_hash, "doc_id long, ahash long")
    bands = sigs.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_idx"),
                    (F.shiftright("ahash", 16 * i).bitwiseAND(F.lit(65535))).alias(
                        "band_val"
                    ),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "ahash", "b.band_idx", "b.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= AHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


# Mirrors the synth + aHash integer math exactly: source pixel at
# 8x8 cell (y, x) is ((x*w)//8, (y*h)//8); bit set iff cell*64 >=
# total; signature assembled as HUGEINT then wrapped to signed i64.
ORACLE_IMAGE_AHASH_NEAR_DUPES = f"""
WITH d AS (
  SELECT doc_id, doc_id // 3 AS p, doc_id % 3 AS m FROM documents
), dims AS (
  SELECT doc_id, m,
         1 + p % 251 AS sx, 1 + (p * 7) % 241 AS sy,
         (p * 97) % 256 AS base,
         16 + p % 49 AS w, 16 + (p * 7) % 49 AS h
  FROM d
), px AS (
  SELECT doc_id, y, x,
         (((x * w) // 8) * sx + ((y * h) // 8) * sy + base
          + m * (CASE WHEN (((x * w) // 8) * 7 + ((y * h) // 8) * 13) % 5 = 0
                      THEN 1 ELSE 0 END)) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, 8)) AS y),
       LATERAL (SELECT unnest(range(0, 8)) AS x)
), tot AS (
  SELECT doc_id, y, x, v, SUM(v) OVER (PARTITION BY doc_id) AS total FROM px
), bits AS (
  SELECT doc_id, y * 8 + x AS pos,
         CASE WHEN v * 64 >= total THEN 1 ELSE 0 END AS bit
  FROM tot
), bandv AS (
  -- 16-bit unsigned band values: what (sig >> 16*i) & 65535 yields
  -- on the signed signature for every band including the top one
  SELECT doc_id, pos // 16 AS band_idx,
         CAST(SUM(bit * (1 << (pos % 16))) AS BIGINT) AS band_val
  FROM bits GROUP BY doc_id, pos // 16
), sig AS (
  -- reassemble the signed i64: top band's sign bit folds in as
  -- (b3 - 2^16) * 2^48 when set (two's complement, no overflow)
  SELECT doc_id, CAST(SUM(
           CASE band_idx
             WHEN 0 THEN band_val
             WHEN 1 THEN band_val * 65536
             WHEN 2 THEN band_val * 4294967296
             ELSE (band_val - CASE WHEN band_val >= 32768 THEN 65536 ELSE 0 END)
                  * 281474976710656
           END) AS BIGINT) AS ahash
  FROM bandv GROUP BY doc_id
), bands AS (
  SELECT b.doc_id, s.ahash, b.band_idx, b.band_val
  FROM bandv b JOIN sig s USING (doc_id)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {AHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "image_ahash_near_dupes": image_ahash_near_dupes,
    "audio_frame_energy": audio_frame_energy,
    "video_frame_sample": video_frame_sample,
    "image_resize_pixelsum": image_resize_pixelsum,
}
ORACLES = {
    "multimodal_metadata": ORACLE_MULTIMODAL_METADATA,
    "image_ahash_near_dupes": ORACLE_IMAGE_AHASH_NEAR_DUPES,
    "audio_frame_energy": ORACLE_AUDIO_FRAME_ENERGY,
    "video_frame_sample": ORACLE_VIDEO_FRAME_SAMPLE,
    "image_resize_pixelsum": ORACLE_IMAGE_RESIZE_PIXELSUM,
}
