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


QUERIES = {"multimodal_metadata": multimodal_metadata}
ORACLES = {"multimodal_metadata": ORACLE_MULTIMODAL_METADATA}
