"""Driver queries for the pandas-UDF islands (EWM family + the
sequential backtest simulator) — WITH fixture-scale value oracles.

These recurrences are not SQL-expressible at corpus scale, but at
driver-fixture scale (≤ ~90 bars per entity) each one replays
exactly in a recursive CTE that advances one entity-parallel state
row per bar. The EWM oracles reproduce pandas' ``ewm(adjust=True)``
kernel VERBATIM — including its weight recurrence (old_wt ← old_wt
· (1−α) then +1 per observation), its skip-update-on-equal-value
guard, and the leading-NaN observation rule — in the kernel's exact
IEEE operation order, so Spark (running real pandas in the island)
and DuckDB (running the CTE) agree bit-for-bit (r05 verdict task
10: rows-only shrinks to the truly SQL-impossible set). The
grouped-pandas islands remain the execution path; the oracles exist
to pin semantics."""

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


# ------------------------------------------------------------------
# pandas-ewm replay oracles. pandas ewm(adjust=True).mean() is the
# recurrence (pandas/_libs/window/aggregations.pyx::ewm):
#
#   w = NaN; ow = 1.0
#   per row x:
#     if w is defined:        ow *= (1 - α)
#       if x is defined:      if w != x: w = (ow*w + x) / (ow + 1.0)
#                             ow += 1.0
#     elif x is defined:      w = x           # first observation
#   emit w  (NaN until the min_periods-th observation)
#
# Every branch below mirrors that order of IEEE operations; the
# (1−α) constant is precomputed in Python and embedded via repr()
# (round-trips to the identical double in DuckDB's literal parser).
# Verified bit-exact against pandas.Series.ewm across spans, NaN
# placements, and the equal-value guard before being encoded here.
# ------------------------------------------------------------------


def _owf(span: int | None = None, alpha: float | None = None) -> float:
    if alpha is None:
        alpha = 1.0 / (1.0 + (span - 1) / 2.0)
    return 1.0 - alpha


def _ewm_step(w: str, ow: str, x: str, owf: float) -> tuple[str, str]:
    """(new_w, new_ow) SQL for one adjusted-EWM step, INCLUDING the
    NULL-observation (NaN) branches of the pandas kernel with
    ignore_na=False (ADVICE-of-round fix — the first cut required
    non-NULL x and would have diverged on a mid-series NULL):

    - x NULL, w undefined → nothing happens;
    - x NULL, w defined   → the weight DECAYS (ow·(1−α)) but no
      observation is added and w is unchanged;
    - x defined, w undefined → w = x, ow stays 1 (no decay);
    - x defined, w defined → decay, update-unless-equal, ow += 1.
    """
    # every literal in DOUBLE form: DuckDB types bare decimal
    # literals as DECIMAL, and the recursive CTE's column types come
    # from the base case — decimal arithmetic would both overflow
    # and diverge from the IEEE kernel. The (1−α) constant uses the
    # e0 exponent form, which parses as a correctly-rounded DOUBLE;
    # CAST(0.9090909090909091 AS DOUBLE) routes through DECIMAL and
    # lands 1 ulp off for the span-21/26 constants (measured).
    one = "CAST(1.0 AS DOUBLE)"
    ow1 = f"({ow} * {owf!r}e0)"
    new_w = (
        f"CASE WHEN {x} IS NULL THEN {w} "
        f"WHEN {w} IS NULL THEN {x} "
        f"WHEN {w} <> {x} THEN ({ow1} * {w} + {x}) / ({ow1} + {one}) "
        f"ELSE {w} END"
    )
    new_ow = (
        f"CASE WHEN {w} IS NULL THEN {ow} "
        f"WHEN {x} IS NULL THEN {ow1} "
        f"ELSE {ow1} + {one} END"
    )
    return new_w, new_ow


_EVENT_SERIES_SQL = """series AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)"""


def _ema_oracle(spans: tuple[int, ...] = (8, 21)) -> str:
    state_cols = ", ".join(f"w{n}, ow{n}" for n in spans)
    base = ", ".join("CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE)" for _ in spans)
    steps = []
    for n in spans:
        w, ow = _ewm_step(f"s.w{n}", f"s.ow{n}", "r.value", _owf(span=n))
        steps.append(f"{w}, {ow}")
    out_cols = ", ".join(
        f"c.w{n} AS ema_{n}, r.value / c.w{n} AS value_ema_{n}_ratio" for n in spans
    )
    return f"""
WITH {_EVENT_SERIES_SQL}, rec AS (
  WITH RECURSIVE st(user_id, rn, {state_cols}) AS (
    SELECT user_id, CAST(0 AS BIGINT), {base}
    FROM (SELECT DISTINCT user_id FROM series)
    UNION ALL
    SELECT s.user_id, r.rn, {', '.join(steps)}
    FROM st s JOIN series r ON r.user_id = s.user_id AND r.rn = s.rn + 1
  ) SELECT * FROM st WHERE rn >= 1
)
SELECT r.user_id, r.ts, r.event_id, r.value, {out_cols}
FROM series r JOIN rec c ON r.user_id = c.user_id AND r.rn = c.rn
"""


def _macd_oracle(fast: int = 12, slow: int = 26, signal: int = 9) -> str:
    wf, owf_ = _ewm_step("s.wf", "s.owf", "r.value", _owf(span=fast))
    ws, ows_ = _ewm_step("s.ws", "s.ows", "r.value", _owf(span=slow))
    # signal EWM consumes the row's macd = (new wf) − (new ws),
    # computed in an inner subquery so the state SELECT stays flat
    sg, osg_ = _ewm_step("wg", "og", "macd", _owf(span=signal))
    return f"""
WITH {_EVENT_SERIES_SQL}, rec AS (
  WITH RECURSIVE st(user_id, rn, wf, owf, ws, ows, wg, og) AS (
    SELECT user_id, CAST(0 AS BIGINT), CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE)
    FROM (SELECT DISTINCT user_id FROM series)
    UNION ALL
    SELECT user_id, rn, wf, owf, ws, ows, {sg}, {osg_}
    FROM (
      SELECT s.user_id, r.rn,
             {wf} AS wf, {owf_} AS owf, {ws} AS ws, {ows_} AS ows,
             ({wf}) - ({ws}) AS macd, s.wg AS wg, s.og AS og
      FROM st s JOIN series r ON r.user_id = s.user_id AND r.rn = s.rn + 1
    )
  ) SELECT * FROM st WHERE rn >= 1
)
SELECT r.user_id, r.ts, r.event_id, r.value,
       c.wf - c.ws AS macd, c.wg AS macd_signal,
       (c.wf - c.ws) - c.wg AS macd_hist
FROM series r JOIN rec c ON r.user_id = c.user_id AND r.rn = c.rn
"""


def _rsi_oracle(length: int = 14) -> str:
    owf = _owf(alpha=1.0 / length)
    # deltas exist from rn=2 on (diff of the first row is NaN — not
    # an observation; _ewm_step handles the NULL internally); the
    # min_periods mask assumes nobs at row rn is rn−1, which holds
    # because events.value is non-NULL in every fixture (a mid-series
    # NULL value would need a real observation counter here)
    wg, owg_ = _ewm_step("wg0", "owg0", "g", owf)
    wl, owl_ = _ewm_step("wl0", "owl0", "l", owf)
    return f"""
WITH {_EVENT_SERIES_SQL}, rec AS (
  WITH RECURSIVE st(user_id, rn, pv, wg, owg, wl, owl) AS (
    SELECT user_id, CAST(0 AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE)
    FROM (SELECT DISTINCT user_id FROM series)
    UNION ALL
    SELECT user_id, rn, value,
      {wg}, {owg_}, {wl}, {owl_}
    FROM (
      SELECT s.user_id, r.rn, r.value,
             CASE WHEN s.pv IS NULL THEN CAST(NULL AS DOUBLE)
                  ELSE GREATEST(r.value - s.pv, CAST(0.0 AS DOUBLE)) END AS g,
             CASE WHEN s.pv IS NULL THEN CAST(NULL AS DOUBLE)
                  ELSE GREATEST(-(r.value - s.pv), CAST(0.0 AS DOUBLE)) END AS l,
             s.wg AS wg0, s.owg AS owg0, s.wl AS wl0, s.owl AS owl0
      FROM st s JOIN series r ON r.user_id = s.user_id AND r.rn = s.rn + 1
    )
  ) SELECT * FROM st WHERE rn >= 1
)
SELECT r.user_id, r.ts, r.event_id, r.value,
       CASE WHEN c.rn <= {length} THEN CAST(NULL AS DOUBLE)
            WHEN c.wl = CAST(0.0 AS DOUBLE) AND c.wg = CAST(0.0 AS DOUBLE) THEN CAST(NULL AS DOUBLE)
            WHEN c.wl = CAST(0.0 AS DOUBLE) THEN CAST(100.0 AS DOUBLE)
            ELSE CAST(100.0 AS DOUBLE) - CAST(100.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + c.wg / c.wl) END AS rsi_{length}
FROM series r JOIN rec c ON r.user_id = c.user_id AND r.rn = c.rn
"""


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


def _bt_sim_sql(series_ctes: str, strategy: str, cooldown_us: int) -> str:
    """The recursive-CTE trade-ledger replay, parameterized by the
    bar series (``series_ctes`` must define a CTE ``series(symbol,
    date, close, buy_signal, sell_signal, rn, n_rows)``), the
    strategy label, and the cooldown. Shared by the SMA-crossover
    oracle and the edge-case fixture oracle so both replay the SAME
    transition function."""
    opening = (
        "s.ed IS NULL AND r.buy_signal "
        "AND (s.lx IS NULL OR epoch_us(r.date) - epoch_us(s.lx) >= "
        f"{cooldown_us}) "
        f"AND r.close > 0 AND FLOOR({_BT_POS_VALUE!r} / r.close) >= 1"
    )
    closing = "s.ed IS NOT NULL AND r.sell_signal"
    return f"""
WITH {series_ctes}, rec AS (
  WITH RECURSIVE st(symbol, rn, ed, ep, sh, lx, t_ed, t_ep, t_sh, t_xd, t_xp) AS (
    SELECT symbol, CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE)
    FROM (SELECT DISTINCT symbol FROM series)
    UNION ALL
    SELECT s.symbol, r.rn,
      CASE WHEN {opening} THEN r.date WHEN {closing} THEN NULL ELSE s.ed END,
      CASE WHEN {opening} THEN r.close WHEN {closing} THEN NULL ELSE s.ep END,
      CASE WHEN {opening} THEN CAST(FLOOR({_BT_POS_VALUE!r} / r.close) AS BIGINT)
           WHEN {closing} THEN NULL ELSE s.sh END,
      CASE WHEN {closing} THEN r.date ELSE s.lx END,
      CASE WHEN {closing} THEN s.ed END,
      CASE WHEN {closing} THEN s.ep END,
      CASE WHEN {closing} THEN s.sh END,
      CASE WHEN {closing} THEN r.date END,
      CASE WHEN {closing} THEN r.close END
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
SELECT '{strategy}' AS strategy, symbol, entry_date, exit_date,
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


def _backtest_oracle() -> str:
    from .windows import ORACLE_SMA_CROSSOVER_SIGNALS

    series = f"""sigs AS (
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
)"""
    return _bt_sim_sql(series, "sma_crossover", 86_400_000_000)


# ------------------------------------------------------------------
# U5 edge-case fixture (VERDICT r05 task 6): the simulator edges the
# pytest suite pinned now ALSO ride the driver's value gate. One
# shared literal bar table drives BOTH engines — the Spark query
# simulates it through the real grouped-pandas kernel, the oracle
# replays the same recursive-CTE transition function — covering:
# same-day buy+sell while flat (buy wins) and while in position
# (sell executes), a cooldown-skipped buy then a post-cooldown
# reopen, end-of-period force-close of that reopened position,
# shares=0 skip (price > position value), zero and NULL closes on
# buy days, sell with no open position, and a symbol with prices
# but no signals (no output rows).
# ------------------------------------------------------------------
_EDGE_COOLDOWN_DAYS = 2
# (symbol, bar, close, buy, sell)
_EDGE_BARS: list[tuple[int, int, float | None, bool, bool]] = [
    (1, 0, 10.0, True, True),     # flat + buy&sell same bar -> opens
    (1, 1, 11.0, True, True),     # in position + buy&sell -> closes
    (1, 2, 12.0, True, False),    # 1 day after exit: cooldown skip
    (1, 3, 13.0, True, False),    # 2 days after exit: reopens
    (1, 4, 14.0, False, False),
    (1, 5, 9.0, False, False),    # open at end -> force close @9
    (2, 0, 5000.0, True, False),  # floor(2000/5000)=0 shares -> skip
    (2, 1, 0.0, True, False),     # zero close -> skip
    (2, 2, None, True, False),    # NULL close -> skip
    (2, 3, 20.0, True, False),    # opens, 100 shares
    (2, 4, 25.0, False, True),    # closes
    (3, 0, 50.0, False, False),   # symbol with no signals:
    (3, 1, 51.0, False, False),   #   no trades, no output rows
    (4, 0, 39.0, False, True),    # sell with no position -> no-op
    (4, 1, 40.0, True, False),    # opens, 50 shares
    (4, 2, 44.0, False, True),    # closes
    (4, 3, 41.0, True, False),    # cooldown skip
    (4, 4, 42.0, True, False),    # reopens after cooldown
    (4, 5, 43.0, True, True),     # in position: sell wins -> closes
]


def backtest_edge_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The U5 simulator run over the shared edge-case bar fixture
    (see the block comment above) through the SAME grouped-pandas
    kernel as production — value-verified against the recursive-CTE
    ledger replay of the same literal bars."""
    import datetime as _dt

    from ..operators.backtest import simulate_trades

    d0 = _dt.datetime(2024, 1, 1)
    rows = [
        (s, d0 + _dt.timedelta(days=b), c, buy, sell)
        for s, b, c, buy, sell in _EDGE_BARS
    ]
    bars = spark.createDataFrame(
        rows,
        "symbol long, date timestamp, close double, buy_signal boolean, sell_signal boolean",
    )
    sigs = bars.select(
        "symbol", "date", "buy_signal", "sell_signal", F.lit("edge").alias("strategy")
    )
    prices = bars.select("symbol", "date", "close")
    return simulate_trades(sigs, prices, cooldown_days=float(_EDGE_COOLDOWN_DAYS))


def _edge_oracle() -> str:
    def lit(c):
        return "CAST(NULL AS DOUBLE)" if c is None else f"{c!r}"

    values = ", ".join(
        f"({s}, {b}, {lit(c)}, {str(buy).upper()}, {str(sell).upper()})"
        for s, b, c, buy, sell in _EDGE_BARS
    )
    series = f"""bars(symbol, bar, close, buy_signal, sell_signal) AS (VALUES {values}),
series AS (
  SELECT CAST(symbol AS BIGINT) AS symbol,
         TIMESTAMP '2024-01-01' + INTERVAL 1 DAY * bar AS date,
         CAST(close AS DOUBLE) AS close, buy_signal, sell_signal,
         ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY bar) AS rn,
         COUNT(*) OVER (PARTITION BY symbol) AS n_rows
  FROM bars
)"""
    return _bt_sim_sql(series, "edge", _EDGE_COOLDOWN_DAYS * 86_400_000_000)


QUERIES = {
    "ema_features": ema_features,
    "macd_features": macd_features,
    "rsi_wilder_14": rsi_wilder_14,
    "backtest_sma_events": backtest_sma_events,
    "backtest_edge_cases": backtest_edge_cases,
}

ORACLES: dict[str, str] = {
    "backtest_sma_events": _backtest_oracle(),
    "backtest_edge_cases": _edge_oracle(),
    "ema_features": _ema_oracle(),
    "macd_features": _macd_oracle(),
    "rsi_wilder_14": _rsi_oracle(),
}
