"""Driver queries exercising the reference-facing domain engine on
the driver's test tables: events are resampled into daily OHLCV
bars per user (user≈symbol), then the full indicator + signal
pipeline runs on them.

``ohlcv_resample`` is oracle-checked; the indicator/signal pipeline
contains the EWM island so it is rows-only (its correctness
evidence is tests/test_domain_signals.py — an exact differential
against a faithful re-simulation of the reference loops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..sources.catalog import load_table


def ohlcv_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick→bar resampling: per (user, day) open/high/low/close/
    volume (the time-series ingestion step of the fin pipeline).

    open/close are ``min_by``/``max_by`` on the (ts, event_id) tick
    order — a plain hash aggregate with map-side partial combine:
    ONE shuffle of pre-aggregated bars. The previous formulation
    ranked ticks with two row_number windows first, which shuffled
    and sorted every raw tick before aggregating; at 100 TB the
    difference is shuffling bars vs shuffling ticks."""
    ev = load_table(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    return (
        ev.select("user_id", F.date_trunc("day", "ts").alias("date"), "ts", "event_id", "value")
        .groupBy("user_id", "date")
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            dsum("value").alias("traded_value"),
        )
    )


ORACLE_OHLCV_RESAMPLE = """
WITH t AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS date, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, date,
  MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
  COUNT(*) AS volume,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS traded_value
FROM t
GROUP BY user_id, date
"""


def fin_signals_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full domain pipeline: resample → compute_indicators (54
    ohlcv_* + 20 target_* columns, EWM island included) →
    all 11 trading strategies. Rows-only (EWM recurrences)."""
    from ..domain.indicators import compute_indicators
    from ..domain.trading_signals import all_signals

    bars = ohlcv_resample(spark, sf_dir).select(
        F.col("user_id").alias("symbol_id"),
        F.concat(F.lit("USER"), F.col("user_id")).alias("symbol"),
        "date",
        "open",
        "high",
        "low",
        "close",
        F.col("volume").cast("long").alias("volume"),
    )
    # Partition-count sizing: the pipeline fans out into ~40 window
    # stages over the persisted feature frame, and the persisted
    # partitioning bypasses AQE coalescing — at fixture scale (150
    # symbols, ~4k bars) full-parallelism partitioning means 4×
    # task overhead for no gain (measured 45s → 13s). Derived from
    # session parallelism (override via conf) rather than a literal;
    # at production scale the symbol_bucket layout (SCALING.md)
    # governs this instead.
    n_parts = int(
        spark.conf.get(
            "spark.fin_trade_craft.signals.partitions",
            str(max(1, spark.sparkContext.defaultParallelism // 4)),
        )
    )
    bars = bars.repartition(n_parts, "symbol_id")
    return all_signals(compute_indicators(bars))


QUERIES = {
    "ohlcv_resample": ohlcv_resample,
    "fin_signals_pipeline": fin_signals_pipeline,
}

ORACLES = {"ohlcv_resample": ORACLE_OHLCV_RESAMPLE}
