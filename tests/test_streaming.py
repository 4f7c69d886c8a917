"""Structured Streaming: the streaming hourly rollup over the
events parquet must agree with the equivalent batch aggregation."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from fin_trade_craft_spark.sources.catalog import load_table  # noqa: E402
from fin_trade_craft_spark.streaming.stream_agg import (  # noqa: E402
    hourly_rollup_stream,
    read_events_stream,
    run_available_now,
)

from conftest import SF_SMOKE  # noqa: E402


def test_stream_rollup_matches_batch(spark, tmp_path):
    # schema as stored on disk (ts is INT64 nanos under nanosAsLong)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    # file-source streams require a directory: stage via symlink
    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    (src_dir / "events.parquet").symlink_to(f"{SF_SMOKE}/events.parquet")
    stream = read_events_stream(spark, str(src_dir), schema)
    rolled = hourly_rollup_stream(stream, watermark="2 hours")
    rows = run_available_now(rolled, str(tmp_path / "ckpt"))
    got = {(r.hour, r.event_type): (r.n, r.total_value) for r in rows}

    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .collect()
    )
    want = {(r.hour, r.event_type): (r.n, r.total_value) for r in batch}
    assert got == want
    assert len(got) > 100  # sf0.001: ~30 days x 24h x 5 types, sparse
