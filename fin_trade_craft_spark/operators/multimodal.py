"""Multimodal column plumbing — images/audio/video as opaque
``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` (LLM-data-pipeline operators).

The image/audio codec libraries are NOT in this container, so the
decode kernels are stubbed exactly as designed for: real Spark-side
plumbing (schemas, batching, partitioning, UDF signatures) with the
codec call swapped for either the real library (if importable) or a
clearly-marked deterministic fake. The fake derives metadata from
byte content arithmetic so tests and oracles are reproducible.

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
        StructField("payload", BinaryType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(df: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """Resize stub: without a codec the 'resize' truncates payload
    bytes (deterministic); with PIL it would re-encode. Demonstrates
    binary-in/binary-out batch transform."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError("real resize needs codec parameters")
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["payload"] = pdf["payload"]
            out["resized"] = pdf["payload"].map(lambda b: bytes(b)[:max_bytes])
            yield out

    return df.mapInPandas(fn, RESIZE_SCHEMA)
