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


# The simulator's open/close/cooldown ledger IS SQL-expressible at
# fixture scale: a recursive CTE advances one (symbol-parallel) state
# row per bar — the same transition function as the Python kernel
# (operators/backtest.py), with every float expression written in the
# kernel's exact IEEE operation order so pnl/commission agree
# bit-for-bit. Recursion depth = max bars per symbol (≤ ~90 on the
# fixtures). This flips U5 from rows-only to value-verified; the
# grouped-pandas kernel remains the execution path (a recursive CTE
# over 100 TB would be absurd — the oracle exists to pin semantics).
_BT_POS_VALUE = 100_000.0 * 0.02       # == 2000.0 exactly
_BT_COMMISSION = 0.001
_BT_COOLDOWN_US = 86_400_000_000       # cooldown_days=1 in microseconds

_BT_OPENING = (
    "s.ed IS NULL AND r.buy_signal "
    "AND (s.lx IS NULL OR epoch_us(r.date) - epoch_us(s.lx) >= "
    f"{_BT_COOLDOWN_US}) "
    f"AND r.close > 0 AND FLOOR({_BT_POS_VALUE!r} / r.close) >= 1"
)
_BT_CLOSING = "s.ed IS NOT NULL AND r.sell_signal"


def _backtest_oracle() -> str:
    from .windows import ORACLE_SMA_CROSSOVER_SIGNALS

    return f"""
WITH sigs AS (
  SELECT user_id AS symbol, ts AS date, cross_up AS buy_signal,
         cross_down AS sell_signal
  FROM ({ORACLE_SMA_CROSSOVER_SIGNALS})
), series AS (
  SELECT e.user_id AS symbol, CAST(e.ts AS TIMESTAMP) AS date,
         CAST(e.value AS DOUBLE) AS close,
         COALESCE(s.buy_signal, FALSE) AS buy_signal,
         COALESCE(s.sell_signal, FALSE) AS sell_signal,
         ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts) AS rn,
         COUNT(*) OVER (PARTITION BY e.user_id) AS n_rows
  FROM events e
  LEFT JOIN sigs s ON e.user_id = s.symbol AND CAST(e.ts AS TIMESTAMP) = s.date
), rec AS (
  WITH RECURSIVE st(symbol, rn, ed, ep, sh, lx, t_ed, t_ep, t_sh, t_xd, t_xp) AS (
    SELECT symbol, CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE)
    FROM (SELECT DISTINCT symbol FROM series)
    UNION ALL
    SELECT s.symbol, r.rn,
      CASE WHEN {_BT_OPENING} THEN r.date WHEN {_BT_CLOSING} THEN NULL ELSE s.ed END,
      CASE WHEN {_BT_OPENING} THEN r.close WHEN {_BT_CLOSING} THEN NULL ELSE s.ep END,
      CASE WHEN {_BT_OPENING} THEN CAST(FLOOR({_BT_POS_VALUE!r} / r.close) AS BIGINT)
           WHEN {_BT_CLOSING} THEN NULL ELSE s.sh END,
      CASE WHEN {_BT_CLOSING} THEN r.date ELSE s.lx END,
      CASE WHEN {_BT_CLOSING} THEN s.ed END,
      CASE WHEN {_BT_CLOSING} THEN s.ep END,
      CASE WHEN {_BT_CLOSING} THEN s.sh END,
      CASE WHEN {_BT_CLOSING} THEN r.date END,
      CASE WHEN {_BT_CLOSING} THEN r.close END
    FROM st s JOIN series r ON r.symbol = s.symbol AND r.rn = s.rn + 1
  )
  SELECT * FROM st
), closed AS (
  SELECT symbol, t_ed AS entry_date, t_xd AS exit_date, t_ep AS entry_price,
         t_xp AS exit_price, CAST(t_sh AS DOUBLE) AS shares,
         'sell_signal' AS exit_reason
  FROM rec WHERE t_xd IS NOT NULL
), final_state AS (
  SELECT symbol, ed, ep, sh FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY rn DESC) AS rr
    FROM rec
  ) WHERE rr = 1 AND ed IS NOT NULL
), last_row AS (
  SELECT symbol, date, close FROM series WHERE rn = n_rows
), forced AS (
  SELECT f.symbol, f.ed AS entry_date, l.date AS exit_date, f.ep AS entry_price,
         l.close AS exit_price, CAST(f.sh AS DOUBLE) AS shares,
         'end_of_period' AS exit_reason
  FROM final_state f JOIN last_row l USING (symbol)
), all_trades AS (
  SELECT * FROM closed UNION ALL SELECT * FROM forced
)
SELECT 'sma_crossover' AS strategy, symbol, entry_date, exit_date,
       entry_price, exit_price, shares,
       exit_price * shares - entry_price * shares
         - ((entry_price * shares + exit_price * shares) * {_BT_COMMISSION!r}) AS pnl,
       (exit_price * shares - entry_price * shares
         - ((entry_price * shares + exit_price * shares) * {_BT_COMMISSION!r}))
         / (entry_price * shares) * 100.0 AS pnl_pct,
       (entry_price * shares + exit_price * shares) * {_BT_COMMISSION!r} AS commission,
       exit_reason
FROM all_trades
"""


QUERIES = {
    "ema_features": ema_features,
    "macd_features": macd_features,
    "rsi_wilder_14": rsi_wilder_14,
    "backtest_sma_events": backtest_sma_events,
}

ORACLES: dict[str, str] = {"backtest_sma_events": _backtest_oracle()}
