"""Warehouse layout: bucketed tables give shuffle-free co-located
joins (SCALING.md / SURVEY §4.2.5 — the replacement for the
reference's b-tree indexes). Verifies the physical plan has NO
shuffle exchange when joining two tables bucketed on the join key."""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — tables land in the session's
    # default spark-warehouse; drop them afterwards
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    prices = spark.range(0, 10000).selectExpr(
        "id % 50 as symbol_id", "id as seq", "rand(7) * 100 as close"
    )
    signals = spark.range(0, 2000).selectExpr(
        "id % 50 as symbol_id", "id as sid", "id % 2 = 0 as buy"
    )
    prices.write.mode("overwrite").bucketBy(8, "symbol_id").sortBy("symbol_id").saveAsTable("b_prices")
    signals.write.mode("overwrite").bucketBy(8, "symbol_id").saveAsTable("b_signals")

    j = spark.table("b_prices").join(spark.table("b_signals"), "symbol_id")
    plan = _plan(j)
    n_exchange = plan.count("Exchange")
    assert n_exchange == 0, f"expected shuffle-free bucketed join, got {n_exchange} exchanges:\n{plan[:2000]}"
    assert j.count() > 0

    # control: the same join on non-bucketed parquet shuffles both sides
    prices.write.mode("overwrite").parquet(str(tmp_path / "p"))
    signals.write.mode("overwrite").parquet(str(tmp_path / "s"))
    j2 = spark.read.parquet(str(tmp_path / "p")).join(spark.read.parquet(str(tmp_path / "s")), "symbol_id")
    assert _plan(j2).count("Exchange") >= 1
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS b_prices")
    spark.sql("DROP TABLE IF EXISTS b_signals")
