"""Driver queries for the pandas-UDF islands (EWM family + the
sequential backtest simulator). No DuckDB oracles by design — these
are the genuinely non-SQL-expressible recurrences (SURVEY §7.2); the
driver records rows-only checks and correctness comes from the
pytest parity/golden suites (tests/test_ewm.py,
tests/test_backtest.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ewm
from ..sources.catalog import load_table


def ema_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ewm.ema_features(
        ev, "user_id", ["ts", "event_id"], "value", spans=(8, 21),
        keep=["user_id", "ts", "event_id", "value"],
    )


def macd_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ewm.macd_features(ev, "user_id", ["ts", "event_id"], "value")


def rsi_wilder_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ewm.rsi_wilder(ev, "user_id", ["ts", "event_id"], "value", 14)


def backtest_sma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential trade simulation (U5) driven by the SMA-crossover
    signals over each user's value series; see operators/backtest."""
    from ..operators.backtest import simulate_trades
    from .windows import sma_crossover_signals

    sigs = sma_crossover_signals(spark, sf_dir).select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("date"),
        F.col("cross_up").alias("buy_signal"),
        F.col("cross_down").alias("sell_signal"),
        F.lit("sma_crossover").alias("strategy"),
    )
    prices = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("symbol"), F.col("ts").alias("date"), F.col("value").alias("close")
    )
    # events span ~30 days → cooldown scaled to 1 day (reference
    # default is 60 days on daily bars)
    return simulate_trades(sigs, prices, cooldown_days=1)


QUERIES = {
    "ema_features": ema_features,
    "macd_features": macd_features,
    "rsi_wilder_14": rsi_wilder_14,
    "backtest_sma_events": backtest_sma_events,
}

ORACLES: dict[str, str] = {}
