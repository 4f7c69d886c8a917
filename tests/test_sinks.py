"""CSV source/sink round-trips (SURVEY S3/S5: symbol-universe CSV
reads, backtest/recommendation CSV exports)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "SYM001", 99.5), (2, "SYM002", None)], "symbol_id int, symbol string, score double"
    )
    out = str(tmp_path / "recs")
    df.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out, schema=df.schema)
    got = sorted((r.symbol_id, r.symbol, r.score) for r in back.collect())
    assert got == [(1, "SYM001", 99.5), (2, "SYM002", None)]


def test_parquet_sink_snappy(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    out = str(tmp_path / "pq")
    df.write.option("compression", "snappy").parquet(out)
    assert spark.read.parquet(out).count() == 1
    assert any(".snappy.parquet" in p.name for p in Path(out).iterdir())


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink coverage: typed round-trip incl. arrays and
    decimals (the other columnar warehouse format Spark reads
    natively)."""
    df = spark.createDataFrame(
        [(1, [1.5, 2.5], "x"), (2, [], None)],
        "k int, emb array<double>, tag string",
    ).withColumn("price", F.col("k").cast("decimal(10,2)") * 1.5)
    out = str(tmp_path / "orc")
    df.write.option("compression", "zstd").orc(out)
    back = spark.read.orc(out)
    assert back.schema == df.schema
    got = sorted((r.k, r.emb, r.tag, float(r.price)) for r in back.collect())
    assert got == [(1, [1.5, 2.5], "x", 1.5), (2, [], None, 3.0)]


def test_json_lines_roundtrip(spark, tmp_path):
    """JSON-lines source/sink: schema-on-read with explicit schema
    (the interchange format for document corpora)."""
    df = spark.createDataFrame(
        [(1, "hello world", {"lang": "en"}), (2, "bonjour", {"lang": "fr"})],
        "doc_id long, text string, meta map<string,string>",
    )
    out = str(tmp_path / "jsonl")
    df.write.json(out)
    back = spark.read.schema(df.schema).json(out)
    got = sorted((r.doc_id, r.text, dict(r.meta)) for r in back.collect())
    assert got == [(1, "hello world", {"lang": "en"}), (2, "bonjour", {"lang": "fr"})]
