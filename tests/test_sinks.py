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
