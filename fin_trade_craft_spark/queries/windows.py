"""Window / time-series queries over the ``events`` table.

Covers SURVEY §2.5 — the heart of the reference: rolling features
W1/W11/W12/W13/W15/W16, cumulative W7/W8, lag/lead W9/W10 (+F10
bucketize), crossover W17, stateful zone W18, simple-RSI W3-variant,
cross-sectional rank W14, bounded recompute W21, plus sessionization
and tumbling-window aggregation (the Structured-Streaming-shaped
batch analogs).

Every query partitions by ``user_id`` and orders by ``(ts,
event_id)`` — the Spark translation of the reference's per-symbol
pandas loops. One shuffle on the partition key serves all window
features in a query (Catalyst reuses the sort), which is the 100 TB
design point: feature count scales without extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators import ranks, rolling, signals
from ..sources.catalog import load_table

_W_SQL = "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _w():
    return rolling.rows_window("user_id", [F.col("ts"), F.col("event_id")])


# ---------------------------------------------------------------- W1/W11/W12
def rolling_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        rolling.rolling_mean(F.col("value"), w, 5).alias("sma5"),
        rolling.rolling_std(F.col("value"), w, 10).alias("std10"),
        rolling.rolling_zscore(F.col("value"), w, 10).alias("z10"),
    )


ORACLE_ROLLING_USER_FEATURES = f"""
WITH base AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    COUNT(value) OVER w5 AS c5,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w5 AS DOUBLE) AS s5,
    COUNT(value) OVER w10 AS c10,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w10 AS DOUBLE) AS s10,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) OVER w10 AS DOUBLE) AS ss10
  FROM events
  WINDOW
    w5 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    w10 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, value,
  CASE WHEN c5 >= 5 THEN s5 / c5 END AS sma5,
  -- GREATEST(...,0): a constant window's exact sums subtract to a
  -- tiny NEGATIVE in double (≈ -2e-20) — sqrt must give 0, and
  -- DuckDB sqrt of a negative RAISES (mirrors rolling.rolling_std)
  CASE WHEN c10 >= 10 THEN SQRT(GREATEST((ss10 - s10 * s10 / c10) / (c10 - 1), 0)) END AS std10,
  (value - CASE WHEN c10 >= 10 THEN s10 / c10 END)
    / (CASE WHEN c10 >= 10 THEN SQRT(GREATEST((ss10 - s10 * s10 / c10) / (c10 - 1), 0)) END + 1e-8) AS z10
FROM base
"""


# ---------------------------------------------------------------- W9/W10/F10
def lag_lead_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    ev = _events(spark, sf_dir)
    prev = F.lag("value").over(w)
    fwd5 = F.lead("value", 5).over(w)
    ret1 = F.col("value") / F.nullif(prev, F.lit(0)) - 1
    fwd_ret5 = fwd5 / F.nullif(F.col("value"), F.lit(0)) - 1
    direction = (
        F.when(fwd_ret5 <= -0.02, 0).when(fwd_ret5 <= 0.02, 1).when(fwd_ret5.isNotNull(), 2)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        ret1.alias("ret1"),
        fwd_ret5.alias("fwd_ret5"),
        direction.alias("direction"),
    )


ORACLE_LAG_LEAD_RETURNS = f"""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
  value / NULLIF(LAG(value) OVER w, 0) - 1 AS ret1,
  LEAD(value, 5) OVER w / NULLIF(value, 0) - 1 AS fwd_ret5,
  CASE WHEN LEAD(value, 5) OVER w / NULLIF(value, 0) - 1 <= -0.02 THEN 0
       WHEN LEAD(value, 5) OVER w / NULLIF(value, 0) - 1 <= 0.02 THEN 1
       WHEN LEAD(value, 5) OVER w / NULLIF(value, 0) - 1 IS NOT NULL THEN 2
  END AS direction
FROM events
{_W_SQL}
"""


# ---------------------------------------------------------------- W7/W8
def cumulative_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (signed) equity curve + running max + drawdown."""
    w = _w()
    ev = _events(spark, sf_dir)
    signed = F.when(F.col("event_type") == "error", -F.col("value")).otherwise(F.col("value"))
    from pyspark.sql import Window

    cum_dec = F.sum(signed.cast("decimal(12,2)")).over(w.rowsBetween(Window.unboundedPreceding, 0))
    step1 = ev.select("event_id", "user_id", "ts", cum_dec.alias("cum_dec"))
    runmax_dec = F.max("cum_dec").over(
        rolling.rows_window("user_id", [F.col("ts"), F.col("event_id")]).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    step2 = step1.withColumn("runmax_dec", runmax_dec)
    cum = F.col("cum_dec").cast("double")
    runmax = F.col("runmax_dec").cast("double")
    return step2.select(
        "event_id",
        "user_id",
        "ts",
        cum.alias("cum_value"),
        runmax.alias("run_peak"),
        F.when(runmax != 0, (cum - runmax) / runmax).alias("drawdown"),
    )


ORACLE_CUMULATIVE_USER_STATS = """
WITH c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
    SUM(CAST(CASE WHEN event_type = 'error' THEN -value ELSE value END AS DECIMAL(12,2)))
      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
  FROM events
), m AS (
  SELECT *, MAX(cum_dec) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax_dec
  FROM c
)
SELECT event_id, user_id, ts,
  CAST(cum_dec AS DOUBLE) AS cum_value,
  CAST(runmax_dec AS DOUBLE) AS run_peak,
  CASE WHEN CAST(runmax_dec AS DOUBLE) <> 0
       THEN (CAST(cum_dec AS DOUBLE) - CAST(runmax_dec AS DOUBLE)) / CAST(runmax_dec AS DOUBLE)
  END AS drawdown
FROM m
"""


# ---------------------------------------------------------------- W17 + W1
def sma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow SMA crossover — the vectorized form of the
    reference's per-row crossover loops (W17)."""
    w = _w()
    ev = _events(spark, sf_dir)
    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        rolling.rolling_mean(F.col("value"), w, 5).alias("sma5"),
        rolling.rolling_mean(F.col("value"), w, 20).alias("sma20"),
    )
    w2 = _w()
    up, down = signals.crossover(F.col("sma5"), F.col("sma20"), w2)
    flagged = feat.select(
        "event_id",
        "user_id",
        "ts",
        "sma5",
        "sma20",
        up.alias("cross_up"),
        down.alias("cross_down"),
    )
    return flagged.filter(F.col("cross_up") | F.col("cross_down"))


ORACLE_SMA_CROSSOVER_SIGNALS = """
WITH feat AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN COUNT(value) OVER w5 >= 5
         THEN CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w5 AS DOUBLE) / COUNT(value) OVER w5 END AS sma5,
    CASE WHEN COUNT(value) OVER w20 >= 20
         THEN CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w20 AS DOUBLE) / COUNT(value) OVER w20 END AS sma20
  FROM events
  WINDOW
    w5 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    w20 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), x AS (
  SELECT *,
    (LAG(sma5) OVER w <= LAG(sma20) OVER w) AND (sma5 > sma20) AS cross_up,
    (LAG(sma5) OVER w >= LAG(sma20) OVER w) AND (sma5 < sma20) AS cross_down
  FROM feat
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts, sma5, sma20, cross_up, cross_down
FROM x WHERE cross_up OR cross_down
"""


# ---------------------------------------------------------------- W15
def breakout_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-period high/low breakout vs the *previous* rolling extreme
    (transform_trading_signals.py:642-679)."""
    w = _w()
    ev = _events(spark, sf_dir)
    feat = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        rolling.rolling_max(F.col("value"), w, 20).alias("max20"),
        rolling.rolling_min(F.col("value"), w, 20).alias("min20"),
    )
    w2 = _w()
    prev_max = F.lag("max20").over(w2)
    prev_min = F.lag("min20").over(w2)
    out = feat.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") > prev_max).alias("breakout_up"),
        (F.col("value") < prev_min).alias("breakout_down"),
    )
    return out.filter(F.col("breakout_up") | F.col("breakout_down"))


ORACLE_BREAKOUT_SIGNALS = """
WITH feat AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    CASE WHEN COUNT(value) OVER w20 >= 20 THEN MAX(value) OVER w20 END AS max20,
    CASE WHEN COUNT(value) OVER w20 >= 20 THEN MIN(value) OVER w20 END AS min20
  FROM events
  WINDOW w20 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), x AS (
  SELECT event_id, user_id, ts, value,
    value > LAG(max20) OVER w AS breakout_up,
    value < LAG(min20) OVER w AS breakout_down
  FROM feat
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT * FROM x WHERE breakout_up OR breakout_down
"""


# ---------------------------------------------------------------- W16
def centered_extrema_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    ev = _events(spark, sf_dir)
    is_low, is_high = rolling.centered_extrema_flags(F.col("value"), w, half=2)
    out = ev.select(
        "event_id", "user_id", "ts", "value", is_low.alias("pivot_low"), is_high.alias("pivot_high")
    )
    return out.filter(F.col("pivot_low") | F.col("pivot_high"))


ORACLE_CENTERED_EXTREMA_PIVOTS = """
WITH x AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    COUNT(value) OVER wc = 5 AND value = MIN(value) OVER wc AS pivot_low,
    COUNT(value) OVER wc = 5 AND value = MAX(value) OVER wc AS pivot_high
  FROM events
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
)
SELECT * FROM x WHERE pivot_low OR pivot_high
"""


# ---------------------------------------------------------------- W13
def rolling_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    ev = _events(spark, sf_dir)
    step1 = ev.select("event_id", "user_id", "ts", "value", F.row_number().over(w).alias("x"))
    w2 = _w()
    slope = rolling.rolling_slope(F.col("value"), F.col("x"), w2, 21)
    return step1.select("event_id", "user_id", "ts", slope.alias("slope21"))


ORACLE_ROLLING_REGRESSION_SLOPE = """
WITH pos AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM events
), s AS (
  SELECT event_id, user_id, ts,
    COUNT(value) OVER w21 AS c,
    CAST(SUM(CAST(x AS DECIMAL(12,0))) OVER w21 AS DOUBLE) AS sx,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w21 AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(value AS DECIMAL(12,2))) OVER w21 AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0))) OVER w21 AS DOUBLE) AS sxx
  FROM pos
  WINDOW w21 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  CASE WHEN c >= 21
       THEN (CAST(c AS DOUBLE) * sxy - sx * sy) / (CAST(c AS DOUBLE) * sxx - sx * sx)
  END AS slope21
FROM s
"""


# ---------------------------------------------------------------- W3 (simple variant)
def rsi_sma_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id", "user_id", "ts", signals.rsi_simple(F.col("value"), w, 14).alias("rsi14")
    )


_RSI_SQL_CTE = """
WITH d AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
    CAST(value AS DECIMAL(12,2))
      - LAG(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
), g AS (
  SELECT event_id, user_id, ts,
    COUNT(delta) OVER w14 AS c,
    CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS DECIMAL(13,2)) END) OVER w14 AS DOUBLE) AS sgain,
    CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE CAST(0 AS DECIMAL(13,2)) END) OVER w14 AS DOUBLE) AS sloss
  FROM d
  WINDOW w14 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
  CASE WHEN c >= 14 THEN
    CASE WHEN sloss = 0 AND sgain > 0 THEN 100.0
         WHEN sloss = 0 THEN NULL
         ELSE 100.0 - 100.0 / (1.0 + sgain / sloss) END
  END AS rsi14
FROM g
"""

ORACLE_RSI_SMA_14 = _RSI_SQL_CTE


# ---------------------------------------------------------------- W18
def rsi_zone_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful zone-confirmation signals on the 14-period RSI
    (rsi_crossing, W18) — see operators.signals.
    zone_confirmation_signals for the de-stating proof."""
    w = _w()
    ev = _events(spark, sf_dir)
    feat = ev.select(
        "event_id", "user_id", "ts", signals.rsi_simple(F.col("value"), w, 14).alias("rsi14")
    )
    # zone_confirmation_signals' documented precondition: drop
    # null-rsi rows first (the reference dropna-then-iterates). With
    # warmup-only nulls this is a no-op vs lagging over the full
    # frame (nulls are a contiguous prefix), but a mid-series null
    # would otherwise swallow a crossing at the re-warm-up boundary.
    feat = feat.filter(F.col("rsi14").isNotNull())
    w2 = _w()
    buy, sell = signals.zone_confirmation_signals(F.col("rsi14"), w2)
    out = feat.select(
        "event_id",
        "user_id",
        "ts",
        "rsi14",
        buy.alias("buy_signal"),
        sell.alias("sell_signal"),
    )
    out = out.filter(F.col("buy_signal") | F.col("sell_signal"))
    strength = F.when(F.col("buy_signal"), F.col("rsi14")).otherwise(100.0 - F.col("rsi14"))
    return out.withColumn("signal_strength", strength)


ORACLE_RSI_ZONE_SIGNALS = f"""
WITH rsi AS ({_RSI_SQL_CTE}), nn AS (
  SELECT * FROM rsi WHERE rsi14 IS NOT NULL
), x AS (
  SELECT event_id, user_id, ts, rsi14,
    (LAG(rsi14) OVER w <= 30 AND rsi14 > 30 AND rsi14 < 70) AS buy_signal,
    (LAG(rsi14) OVER w >= 70 AND rsi14 < 70 AND rsi14 > 30) AS sell_signal
  FROM nn
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts, rsi14, buy_signal, sell_signal,
  CASE WHEN buy_signal THEN rsi14 ELSE 100.0 - rsi14 END AS signal_strength
FROM x WHERE buy_signal OR sell_signal
"""


# ---------------------------------------------------------------- W14
def daily_user_spend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional pandas-style percent rank (average ties) of
    per-user daily purchase spend (W14)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .agg(dsum("value").alias("spend"), F.count(F.lit(1)).alias("n_purchases"))
    )
    pct = ranks.pct_rank_avg_ties([F.col("day")], F.col("spend"))
    return daily.select("day", "user_id", "spend", "n_purchases", pct.alias("spend_pct_rank"))


ORACLE_DAILY_USER_SPEND_RANK = """
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
         COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT day, user_id, spend, n_purchases,
  (RANK() OVER (PARTITION BY day ORDER BY spend)
   + (COUNT(*) OVER (PARTITION BY day, spend) - 1) / 2.0)
  / COUNT(*) OVER (PARTITION BY day) AS spend_pct_rank
FROM daily
"""


# ---------------------------------------------------------------- W21
def latest_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-recompute window: newest 50 rows per key (W21)."""
    ev = _events(spark, sf_dir)
    return ranks.latest_n_per_key(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")], 50
    ).select("event_id", "user_id", "ts", "event_type", "value")


ORACLE_LATEST_EVENTS_PER_USER = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 50
"""


# ---------------------------------------------------------------- sessionization
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + per-session
    stats — the batch shape of a streaming session window."""
    from pyspark.sql import Window

    w = _w()
    ev = _events(spark, sf_dir)
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > 1_800_000_000), 1
    ).otherwise(0)
    step1 = ev.select("event_id", "user_id", "ts", "value", new_sess.alias("new_sess"))
    sid = F.sum("new_sess").over(
        rolling.rows_window("user_id", [F.col("ts"), F.col("event_id")]).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    step2 = step1.withColumn("session_id", sid)
    return step2.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        dsum("value").alias("total_value"),
    )


ORACLE_USER_SESSION_STATS = """
WITH t AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
    CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
           OR epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM t
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------- tumbling window
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup — identical logic runs under
    Structured Streaming via ``F.window`` (see streaming/)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
    )


ORACLE_HOURLY_EVENT_ROLLUP = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def trailing_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame: per user, the trailing-7-day
    value sum/count at each event — a TIME-based frame (every event
    whose ts is within 7 days), not a row-count frame, so irregular
    event gaps are handled correctly where ``rowsBetween`` would
    not be. Spark expresses it as rangeBetween over the epoch-second
    ordering column; sums are exact-decimal so the frame total is
    order-independent."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    # INTEGER microsecond ordering: epoch seconds as double carry
    # ~2.4e-7 s representation error, enough to flip inclusion of an
    # event sitting exactly on the 7-day boundary vs the oracle's
    # exact INTERVAL arithmetic; bigint micros are exact
    micros = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-7 * 86_400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("value_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


ORACLE_TRAILING_7D_USER_VALUE = """
SELECT user_id, event_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_7d,
       COUNT(*) OVER w AS n_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
)
"""


def vwap_trailing_5d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-day volume-weighted average price per user —
    the VWAP shape every market pipeline carries: daily bars
    (one shuffle, map-side combined) then a ratio of two exact
    rolling sums over the per-user frame. The rolling sums
    re-accumulate in DECIMAL so the 5-row fold is associative —
    double window sums can differ between engines' frame
    evaluation orders (and between executor counts) in the last
    ulp."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("date")
    ).agg(
        dsum("value").alias("day_value"),
        F.count(F.lit(1)).alias("day_volume"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("date")
        .rowsBetween(-4, 0)
    )
    vsum = F.sum(F.col("day_value").cast("decimal(18,2)")).over(w).cast("double")
    vol = F.sum("day_volume").over(w)
    return daily.select(
        "user_id",
        "date",
        "day_value",
        "day_volume",
        (vsum / vol).alias("vwap_5d"),
        vol.alias("volume_5d"),
    )


ORACLE_VWAP_TRAILING_5D = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS date,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value,
         COUNT(*) AS day_volume
  FROM events GROUP BY 1, 2
)
SELECT user_id, date, day_value, day_volume,
       CAST(SUM(CAST(day_value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY date
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(SUM(day_volume) OVER (PARTITION BY user_id ORDER BY date
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS vwap_5d,
       CAST(SUM(day_volume) OVER (PARTITION BY user_id ORDER BY date
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS volume_5d
FROM daily
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — users grouped by first-seen day, counted
    at each day offset they return: two hash aggregates (per-user
    min day, then distinct users per (cohort, offset)). The classic
    product-analytics rollup; both shuffles key on small columns."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    return (
        ev.join(first, "user_id")
        .groupBy("cohort_date", F.datediff("day", F.col("cohort_date")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_USER_RETENTION_COHORTS = """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_date FROM d GROUP BY user_id
)
SELECT cohort_date, datediff('day', cohort_date, day) AS day_offset,
       COUNT(DISTINCT d.user_id) AS n_users
FROM d JOIN first USING (user_id)
GROUP BY 1, 2
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel on first-occurrence ordering:
    one conditional-min aggregate per user (a single shuffle), then
    a global stage rollup. The strict-sequence variant (click after
    the qualifying view, not just after any view) is the same shape
    with windowed condition chains."""
    ev = _events(spark, sf_dir)
    per = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return per.agg(
        F.count(F.when(s1, 1)).alias("n_view"),
        F.count(F.when(s2, 1)).alias("n_view_click"),
        F.count(F.when(s3, 1)).alias("n_view_click_purchase"),
        (F.count(F.when(s2, 1)).cast("double") / F.count(F.when(s1, 1))).alias("view_to_click"),
        (F.count(F.when(s3, 1)).cast("double") / F.count(F.when(s2, 1))).alias("click_to_purchase"),
    )


ORACLE_EVENT_FUNNEL = """
WITH per AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS n_view_click_purchase,
       CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS DOUBLE)
         / COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS view_to_click,
       CAST(COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS DOUBLE)
         / COUNT(CASE WHEN t_click > t_view THEN 1 END) AS click_to_purchase
FROM per
"""


def calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-calendar gap fill with LOCF (last observation carried
    forward) — the time-series alignment step every market pipeline
    needs (sparse quotes → dense trading calendar): build each
    user's full day spine (``sequence`` + explode — per-row array,
    no cross join), left-join the daily aggregate, and forward-fill
    via ``last(ignorenulls)`` over the per-user frame.

    Scale shape: one shuffle on user_id for the daily agg, the
    spine explodes from the tiny per-user range frame, and the fill
    window reuses the user partitioning. No driver-side calendar,
    no cross join against a date dimension."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("date")
    ).agg(dsum("value").alias("day_value"))
    rng = daily.groupBy("user_id").agg(F.min("date").alias("d0"), F.max("date").alias("d1"))
    spine = rng.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("date")
    )
    j = spine.join(daily, ["user_id", "date"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "date",
        F.col("day_value").alias("raw_value"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("day_value").isNull().alias("was_filled"),
    )


ORACLE_CALENDAR_GAP_FILL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS date,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT user_id, MIN(date) AS d0, MAX(date) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS date
  FROM rng
), j AS (
  SELECT s.user_id, s.date, d.day_value
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.date = d.date
)
SELECT user_id, date, day_value AS raw_value,
       LAST_VALUE(day_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       day_value IS NULL AS was_filled
FROM j
"""


def linear_interpolation_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-calendar gap fill with LINEAR interpolation — the
    two-sided twin of ``calendar_gap_fill``'s LOCF: interior gaps
    take prev + (next − prev) · Δt/ΔT between the bracketing
    observations (pandas ``interpolate(method='time')`` semantics
    on a daily grid). Both brackets always exist because the spine
    spans exactly [min(date), max(date)] per user — the first and
    last spine days are observed by construction.

    Scale shape: identical to the LOCF twin — one shuffle on
    user_id, then TWO ordered window passes over the same
    partitioning (a forward last-ignorenulls carrying the (date,
    value) of the previous observation, a backward first-ignorenulls
    carrying the next); the interpolation itself is a pure
    projection. The carried pair rides ONE struct column per
    direction so each direction is a single window function, not
    two passes."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("date")
    ).agg(dsum("value").alias("day_value"))
    rng = daily.groupBy("user_id").agg(F.min("date").alias("d0"), F.max("date").alias("d1"))
    spine = rng.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("date")
    )
    j = spine.join(daily, ["user_id", "date"], "left")
    obs = F.when(F.col("day_value").isNotNull(), F.struct("date", "day_value"))
    wb = Window.partitionBy("user_id").orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy("user_id").orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    j = j.select(
        "user_id",
        "date",
        "day_value",
        F.last(obs, ignorenulls=True).over(wb).alias("prev_obs"),
        F.first(obs, ignorenulls=True).over(wf).alias("next_obs"),
    )
    frac = F.datediff(F.col("date"), F.col("prev_obs.date")).cast("double") / F.datediff(
        F.col("next_obs.date"), F.col("prev_obs.date")
    ).cast("double")
    lerp = F.col("prev_obs.day_value") + (
        F.col("next_obs.day_value") - F.col("prev_obs.day_value")
    ) * frac
    return j.select(
        "user_id",
        "date",
        F.col("day_value").alias("raw_value"),
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .otherwise(lerp)
        .alias("interp_value"),
        F.col("day_value").isNull().alias("was_interpolated"),
    )


ORACLE_LINEAR_INTERPOLATION_FILL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS date,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT user_id, MIN(date) AS d0, MAX(date) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS date
  FROM rng
), j AS (
  SELECT s.user_id, s.date, d.day_value
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.date = d.date
), br AS (
  SELECT user_id, date, day_value,
         LAST_VALUE(CASE WHEN day_value IS NOT NULL THEN date END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_date,
         LAST_VALUE(day_value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
         FIRST_VALUE(CASE WHEN day_value IS NOT NULL THEN date END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_date,
         FIRST_VALUE(day_value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY date
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val
  FROM j
)
SELECT user_id, date, day_value AS raw_value,
       CASE WHEN day_value IS NOT NULL THEN day_value
            ELSE prev_val + (next_val - prev_val) *
                 (CAST(date_diff('day', prev_date, date) AS DOUBLE) /
                  CAST(date_diff('day', prev_date, next_date) AS DOUBLE))
       END AS interp_value,
       day_value IS NULL AS was_interpolated
FROM br
"""


def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build — compress a per-day
    attribute history into validity intervals: per user, the daily
    activity tier (low/mid/high by fixed day-value thresholds)
    collapses into runs of equal tier; each run becomes one SCD2 row
    with ``effective_from`` (first day at the tier),
    ``effective_to`` (day before the next run starts — NULL on the
    open current run), ``is_current``, and the number of observed
    days backing it. This is the dimension-table maintenance shape
    every warehouse load runs.

    Scale shape: one shuffle on user_id; the change-detection lag,
    the run numbering (running sum), and the effective_to lead all
    reuse that single sort. The per-run aggregate shuffles only
    run-count rows."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("date")
    ).agg(dsum("value").alias("day_value"))
    tier = (
        F.when(F.col("day_value") < 50.0, "low")
        .when(F.col("day_value") < 200.0, "mid")
        .otherwise("high")
    )
    w = Window.partitionBy("user_id").orderBy("date")
    d = daily.select("user_id", "date", tier.alias("tier"))
    chg = F.when(F.lag("tier").over(w) == F.col("tier"), 0).otherwise(1)
    d = d.withColumn("chg", chg)
    d = d.withColumn(
        "version", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = d.groupBy("user_id", "version", "tier").agg(
        F.min("date").alias("effective_from"), F.count(F.lit(1)).alias("n_days")
    )
    wv = Window.partitionBy("user_id").orderBy("effective_from")
    nxt = F.lead("effective_from").over(wv)
    return runs.select(
        "user_id",
        "version",
        "tier",
        "effective_from",
        F.date_sub(nxt, 1).alias("effective_to"),
        nxt.isNull().alias("is_current"),
        "n_days",
    )


ORACLE_SCD2_BUILD = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS date,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
), tiers AS (
  SELECT user_id, date,
         CASE WHEN day_value < 50.0 THEN 'low'
              WHEN day_value < 200.0 THEN 'mid'
              ELSE 'high' END AS tier
  FROM daily
), chg AS (
  SELECT user_id, date, tier,
         CASE WHEN LAG(tier) OVER (PARTITION BY user_id ORDER BY date) = tier
              THEN 0 ELSE 1 END AS chg
  FROM tiers
), ver AS (
  SELECT user_id, date, tier,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY date
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM chg
), runs AS (
  SELECT user_id, version, tier,
         MIN(date) AS effective_from, COUNT(*) AS n_days
  FROM ver GROUP BY user_id, version, tier
)
SELECT user_id, version, tier, effective_from,
       CAST(LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from)
            - INTERVAL 1 DAY AS DATE) AS effective_to,
       LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from)
         IS NULL AS is_current,
       n_days
FROM runs
"""


def ols_beta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group OLS — regress each user's event value
    on its sequence index (the per-entity trend fit a factor
    pipeline runs across millions of entities): β = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²), α = ȳ − βx̄, plus R². One window pass assigns
    the index, one hash aggregate per user computes the five
    sufficient statistics; the algebra is a projection. No
    iteration, no matrix library — normal equations in exprs.

    Exactness: x is a small exact integer and y rides the
    fixed-point trick (floor(y·1e6+0.5) as BIGINT per term), so
    every Σ is order-independent and the derived doubles are
    bit-identical across engines. Groups with a degenerate variance
    (single row) yield NULL β. Scale shape: shuffle on user_id for
    the index window, map-side-partial aggregate, tiny output."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("x"),
        F.col("value").alias("y"),
    )
    # fixed-point y terms: y ≤ ~500 with 2 decimals — 1e6 scaling is
    # exact for y, x·y (x < ~1e4) and y² products
    fy = F.expr("CAST(floor(y * 1e6 + 0.5) AS BIGINT)")
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        (F.sum(fy).cast("double") / F.lit(1e6)).alias("sy"),
        (F.sum(F.col("x") * fy).cast("double") / F.lit(1e6)).alias("sxy"),
        (
            F.sum(F.expr("CAST(floor(y * y * 1e6 + 0.5) AS BIGINT)")).cast("double")
            / F.lit(1e6)
        ).alias("syy"),
    )
    n = F.col("n").cast("double")
    den = n * F.col("sxx") - (F.col("sx") * F.col("sx")).cast("double")
    beta = F.when(den != 0, (n * F.col("sxy") - F.col("sx") * F.col("sy")) / den)
    alpha = F.col("sy") / n - beta * (F.col("sx").cast("double") / n)
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / n
    ss_num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    r2 = F.when(
        (den != 0) & (ss_tot != 0), (ss_num * ss_num) / (den * (n * ss_tot))
    )
    return s.select("user_id", "n", beta.alias("beta"), alpha.alias("alpha"), r2.alias("r2"))


ORACLE_OLS_BETA_PER_USER = """
WITH d AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS x,
         value AS y
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
         CAST(SUM(CAST(floor(y * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sy,
         CAST(SUM(x * CAST(floor(y * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sxy,
         CAST(SUM(CAST(floor(y * y * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS syy
  FROM d GROUP BY user_id
)
SELECT user_id, n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE) <> 0 THEN
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE)) END AS beta,
       sy / CAST(n AS DOUBLE)
         - (CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE) <> 0 THEN
              (CAST(n AS DOUBLE) * sxy - sx * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE)) END)
           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS alpha,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE) <> 0
             AND syy - sy * sy / CAST(n AS DOUBLE) <> 0 THEN
         ((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy))
           / ((CAST(n AS DOUBLE) * sxx - CAST(sx * sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * (syy - sy * sy / CAST(n AS DOUBLE)))) END AS r2
FROM s
"""


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 table — the
    fact-to-dimension join every warehouse does with slowly-changing
    attributes: for EVERY day in each user's calendar spine (gap
    days included), the tier whose validity interval covers it.
    Joins on the user key with a residual interval predicate
    (effective_from ≤ day ≤ effective_to, open-ended current rows).

    The oracle is the INDEPENDENT formulation — LOCF of the daily
    tier over the same spine — so the hash match proves the interval
    semantics (inclusive bounds, open current row, no overlaps/gaps)
    rather than re-running the same join. Scale shape: equi-join on
    user_id with the interval as a residual filter; the SCD2 side is
    runs-compressed (orders of magnitude smaller than the fact
    side), so it broadcasts in production."""
    dim = scd2_build(spark, sf_dir).select(
        "user_id", "tier", "effective_from", "effective_to"
    )
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("date")
    ).agg(F.count(F.lit(1)).alias("_n"))
    rng = daily.groupBy("user_id").agg(F.min("date").alias("d0"), F.max("date").alias("d1"))
    spine = rng.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("date")
    )
    j = spine.join(dim, "user_id").filter(
        (F.col("date") >= F.col("effective_from"))
        & (F.col("effective_to").isNull() | (F.col("date") <= F.col("effective_to")))
    )
    return j.select("user_id", "date", "tier")


ORACLE_SCD2_POINT_IN_TIME = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS date,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
), tiers AS (
  SELECT user_id, date,
         CASE WHEN day_value < 50.0 THEN 'low'
              WHEN day_value < 200.0 THEN 'mid'
              ELSE 'high' END AS tier
  FROM daily
), rng AS (
  SELECT user_id, MIN(date) AS d0, MAX(date) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS date
  FROM rng
), joined AS (
  SELECT s.user_id, s.date, t.tier
  FROM spine s LEFT JOIN tiers t ON s.user_id = t.user_id AND s.date = t.date
)
SELECT user_id, date,
       LAST_VALUE(tier IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tier
FROM joined
"""


def autocorr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity autocorrelation features — ACF at lags 1 and 5
    over each user's value series (mean-reversion / momentum
    diagnostics; the stationarity screen before fitting any AR
    model). Closed form, no iteration:
    r_k = (Σx_t·x_{t+k} − x̄·Σ_head − x̄·Σ_tail + (n−k)·x̄²) /
    (Σx² − (Σx)²/n), with every Σ accumulated by the fixed-point
    discipline so the statistic is bit-identical at any parallelism
    and the double post-arithmetic is written in the same order in
    both engines.

    Scale shape: one shuffle on user_id; both lags ride the same
    sort (two lag() columns), and everything reduces in ONE hash
    aggregate per user."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fx = "CAST(floor(({e}) * 1e6 + 0.5) AS BIGINT)"
    d = ev.select(
        "user_id",
        F.col("value").alias("x"),
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 5).over(w).alias("l5"),
    )

    def fsum(expr: str) -> F.Column:
        return F.sum(F.expr(fx.format(e=expr))).cast("double") / F.lit(1e6)

    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        fsum("x").alias("s"),
        fsum("x * x").alias("sxx"),
        F.count("l1").alias("n1"),
        fsum("CASE WHEN l1 IS NOT NULL THEN x * l1 END").alias("sxy1"),
        fsum("CASE WHEN l1 IS NOT NULL THEN l1 END").alias("sh1"),
        fsum("CASE WHEN l1 IS NOT NULL THEN x END").alias("st1"),
        F.count("l5").alias("n5"),
        fsum("CASE WHEN l5 IS NOT NULL THEN x * l5 END").alias("sxy5"),
        fsum("CASE WHEN l5 IS NOT NULL THEN l5 END").alias("sh5"),
        fsum("CASE WHEN l5 IS NOT NULL THEN x END").alias("st5"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    den = F.col("sxx") - F.col("s") * F.col("s") / n

    def acf(k: int) -> F.Column:
        nk = F.col(f"n{k}").cast("double")
        num = (
            F.col(f"sxy{k}")
            - mean * F.col(f"sh{k}")
            - mean * F.col(f"st{k}")
            + nk * mean * mean
        )
        return F.when((den != 0) & (F.col(f"n{k}") > 0), num / den)

    return s.select("user_id", "n", acf(1).alias("acf1"), acf(5).alias("acf5"))


ORACLE_AUTOCORR_FEATURES = """
WITH d AS (
  SELECT user_id, value AS x,
         LAG(value, 1) OVER w AS l1,
         LAG(value, 5) OVER w AS l5
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, COUNT(*) AS n,
    CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS s,
    CAST(SUM(CAST(floor(x * x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sxx,
    COUNT(l1) AS n1,
    CAST(SUM(CAST(floor(CASE WHEN l1 IS NOT NULL THEN x * l1 END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sxy1,
    CAST(SUM(CAST(floor(CASE WHEN l1 IS NOT NULL THEN l1 END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sh1,
    CAST(SUM(CAST(floor(CASE WHEN l1 IS NOT NULL THEN x END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS st1,
    COUNT(l5) AS n5,
    CAST(SUM(CAST(floor(CASE WHEN l5 IS NOT NULL THEN x * l5 END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sxy5,
    CAST(SUM(CAST(floor(CASE WHEN l5 IS NOT NULL THEN l5 END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS sh5,
    CAST(SUM(CAST(floor(CASE WHEN l5 IS NOT NULL THEN x END * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS st5
  FROM d GROUP BY user_id
)
SELECT user_id, n,
  CASE WHEN sxx - s * s / CAST(n AS DOUBLE) <> 0 AND n1 > 0 THEN
    (sxy1 - (s / CAST(n AS DOUBLE)) * sh1 - (s / CAST(n AS DOUBLE)) * st1
      + CAST(n1 AS DOUBLE) * (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
    / (sxx - s * s / CAST(n AS DOUBLE)) END AS acf1,
  CASE WHEN sxx - s * s / CAST(n AS DOUBLE) <> 0 AND n5 > 0 THEN
    (sxy5 - (s / CAST(n AS DOUBLE)) * sh5 - (s / CAST(n AS DOUBLE)) * st5
      + CAST(n5 AS DOUBLE) * (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))
    / (sxx - s * s / CAST(n AS DOUBLE)) END AS acf5
FROM s
"""


ATTR_WINDOW_H = 24


def chained_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch chained attribution — the skip-till-next-match
    funnel (vs ``cep_pattern_matches``' strict contiguity): for each
    view, the FIRST click strictly after it within the window, then
    the FIRST purchase strictly after that click within the window.
    Fully-converted chains only, with end-to-end latency. This is
    two FORWARD as-of joins composed — each step is the same
    equi-join + range predicate + row_number idiom as
    operators/asof.py, ordered ascending instead of descending.

    Scale shape: both steps shuffle on user_id (one partitioning
    reused by join and dedup window); candidate fan-out per step is
    bounded by the attribution window, not the user's history."""
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    gap = F.expr(f"INTERVAL {ATTR_WINDOW_H} HOURS")
    j1 = v.join(
        c,
        (v.user_id == c.cu)
        & (c.click_ts > v.view_ts)
        & (c.click_ts <= v.view_ts + gap),
    )
    w1 = Window.partitionBy("user_id", "view_id").orderBy("click_ts", "click_id")
    s1 = (
        j1.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") == 1)
        .select("user_id", "view_id", "view_ts", "click_id", "click_ts")
    )
    j2 = s1.join(
        p,
        (s1.user_id == p.pu)
        & (p.purchase_ts > s1.click_ts)
        & (p.purchase_ts <= s1.click_ts + gap),
    )
    w2 = Window.partitionBy("user_id", "view_id").orderBy("purchase_ts", "purchase_id")
    return (
        j2.withColumn("rn2", F.row_number().over(w2)).filter(F.col("rn2") == 1)
        .select(
            "user_id",
            "view_id",
            "click_id",
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("latency_us"),
        )
    )


ORACLE_CHAINED_ATTRIBUTION = f"""
WITH v AS (
  SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), s1 AS (
  SELECT user_id, view_id, view_ts, click_id, click_ts FROM (
    SELECT v.user_id, view_id, view_ts, click_id, click_ts,
           ROW_NUMBER() OVER (PARTITION BY v.user_id, view_id
                              ORDER BY click_ts, click_id) AS rn
    FROM v JOIN c ON v.user_id = c.user_id
     AND click_ts > view_ts AND click_ts <= view_ts + INTERVAL {ATTR_WINDOW_H} HOURS
  ) WHERE rn = 1
)
SELECT user_id, view_id, click_id, purchase_id, latency_us FROM (
  SELECT s1.user_id, view_id, click_id, purchase_id,
         epoch_us(purchase_ts) - epoch_us(view_ts) AS latency_us,
         ROW_NUMBER() OVER (PARTITION BY s1.user_id, view_id
                            ORDER BY purchase_ts, purchase_id) AS rn2
  FROM s1 JOIN p ON s1.user_id = p.user_id
   AND purchase_ts > click_ts AND purchase_ts <= click_ts + INTERVAL {ATTR_WINDOW_H} HOURS
) WHERE rn2 = 1
"""


CEP_PATTERN = ("view", "view", "click")
CEP_MAX_GAP_MIN = 1440  # per-step gap: the synthetic stream ticks in hours, not minutes


def cep_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP shape, strict contiguity): find every occurrence of
    the consecutive per-user event sequence ``CEP_PATTERN`` —
    view→view→click, the repeat-browse-then-click funnel; frequent
    enough in the synthetic stream to exercise the match logic,
    unlike the rarer view→click→purchase — where each step follows
    the previous within ``CEP_MAX_GAP_MIN`` minutes (24 h here — the
    synthetic stream ticks hourly). Emits one row per match anchored
    at the first event, plus the end-to-end latency — the conversion
    micro-funnel a product pipeline alerts on.

    Scale shape: a fixed-length pattern with strict contiguity
    compiles to lead() comparisons — one shuffle on user_id, no
    state machine, no self-joins; an N-step pattern is N-1 leads in
    the same window. (Variable-length / skip-till-next patterns are
    what applyInPandasWithState covers — see
    streaming_zone_signals_stateful.)"""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    gap = F.expr(f"INTERVAL {CEP_MAX_GAP_MIN} MINUTES")
    hit = (
        (F.col("event_type") == CEP_PATTERN[0])
        & (F.col("t1") == CEP_PATTERN[1])
        & (F.col("t2") == CEP_PATTERN[2])
        & (F.col("ts1") <= F.col("ts") + gap)
        & (F.col("ts2") <= F.col("ts1") + gap)
    )
    return d.filter(hit).select(
        "user_id",
        F.col("ts").alias("match_start"),
        F.col("ts2").alias("match_end"),
        # integer microseconds: unix_timestamp()/epoch() truncate or
        # round sub-second parts differently across engines
        (F.unix_micros("ts2") - F.unix_micros("ts")).alias("latency_us"),
    )


ORACLE_CEP_PATTERN_MATCHES = f"""
WITH d AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(CAST(ts AS TIMESTAMP), 1) OVER w AS ts1,
         LEAD(event_type, 2) OVER w AS t2,
         LEAD(CAST(ts AS TIMESTAMP), 2) OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ts AS match_start, ts2 AS match_end,
       epoch_us(ts2) - epoch_us(ts) AS latency_us
FROM d
WHERE event_type = '{CEP_PATTERN[0]}' AND t1 = '{CEP_PATTERN[1]}' AND t2 = '{CEP_PATTERN[2]}'
  AND ts1 <= ts + INTERVAL {CEP_MAX_GAP_MIN} MINUTES
  AND ts2 <= ts1 + INTERVAL {CEP_MAX_GAP_MIN} MINUTES
"""


def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per (user, day), one count column per event_type —
    the declarative form of the reference's 30-column manual
    SUM(CASE WHEN type…) pivot (A1). Explicit value list keeps the
    output schema static (required for any write target; inferred
    pivot values would mean a full extra pass)."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


ORACLE_EVENTS_PIVOT_DAILY = """
SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events
GROUP BY 1, 2
"""


def tvd_drift_from_counts(cnt: DataFrame) -> DataFrame:
    """TVD post-stage shared by the batch and streaming drift
    monitors: given per-(hour, event_type) counts ``c``, compute the
    hour-over-hour total-variation distance. Runs on the already-
    aggregated frame (|hours|·|types| rows), so in the streaming
    twin the only input-sized work is the windowed count the stream
    maintains incrementally."""
    prev_hour = F.col("hour") - F.expr("INTERVAL 1 HOUR")
    # lag-with-guard instead of a consecutive-hour self-join: the
    # previous row per type counts only when it IS the previous hour
    # (missing (hour, type) combos stay excluded — identical
    # semantics to the oracle's b.hour = a.hour - 1h inner join, one
    # shuffle less, and immune to self-join attribute ambiguity on
    # drained streaming sinks)
    wt = Window.partitionBy("event_type").orderBy("hour")
    lagged = cnt.select(
        "hour",
        F.col("c").alias("c_a"),
        F.when(F.lag("hour").over(wt) == prev_hour, F.lag("c").over(wt)).alias("c_b"),
    ).filter(F.col("c_b").isNotNull())
    tot = cnt.groupBy("hour").agg(F.sum("c").alias("n"))
    # consecutive-hour totals via a shifted self-equi-join, NOT an
    # unpartitioned lag window (Window.orderBy with no partitioner
    # funnels the per-hour frame through one task — banned by the
    # plan lint; |hours| grows with the timeline). Both sides
    # project FRESH aliases (t_hour from different expressions), so
    # the drained-streaming-sink attribute-ambiguity issue the old
    # comment guarded against can't arise either.
    t_curr = tot.select(F.col("hour").alias("t_hour"), F.col("n").alias("n_curr"))
    t_prev = tot.select(
        (F.col("hour") + F.expr("INTERVAL 1 HOUR")).alias("t_hour"),
        F.col("n").alias("n_prev"),
    )
    tots = t_curr.join(t_prev, "t_hour")  # inner: hours with a predecessor
    pairs = lagged.join(F.broadcast(tots), F.col("hour") == F.col("t_hour")).drop("t_hour")
    return (
        pairs.groupBy("hour", "n_curr", "n_prev")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(
                F.abs(F.col("c_a") * F.col("n_prev") - F.col("c_b") * F.col("n_curr"))
            ).alias("tvd_num"),
        )
        .select(
            "hour",
            "n_types",
            "n_curr",
            "n_prev",
            F.round(
                F.col("tvd_num").cast("double")
                / (2.0 * F.col("n_curr").cast("double") * F.col("n_prev").cast("double")),
                9,
            ).alias("tvd"),
        )
        .orderBy("hour")
    )


def event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour distribution-drift monitor — the data-quality
    tripwire of a streaming ingest pipeline: for each hour, the
    total-variation distance between the event-type mix of this
    hour and the previous one. TVD is computed over the types
    PRESENT IN BOTH hours (inner join on type — appearing/vanishing
    types are a schema-level alert, not a mix-drift signal).

    Exactness: TVD = Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) keeps the
    numerator in pure integers; at bench scales every intermediate
    is < 2^53, so the one double division is exact in both engines
    (rounded to 9dp per the repo policy). At 100 TB the products
    would ride DECIMAL(38) instead — same expression, wider type.

    Scale shape: one hash aggregate on (hour, type); the
    consecutive-hour self-join keys on (type, hour) against an
    aggregate that is |hours|·|types| rows — negligible next to the
    raw scan regardless of input size."""
    ev = _events(spark, sf_dir)
    cnt = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    return tvd_drift_from_counts(cnt)


ORACLE_EVENT_MIX_DRIFT = """
WITH cnt AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT hour, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY hour
), pairs AS (
  SELECT a.hour AS hour, a.c AS c_a, b.c AS c_b, ta.n AS n_curr, tb.n AS n_prev
  FROM cnt a
  JOIN cnt b ON a.event_type = b.event_type
            AND b.hour = a.hour - INTERVAL 1 HOUR
  JOIN tot ta ON ta.hour = a.hour
  JOIN tot tb ON tb.hour = b.hour
)
SELECT hour,
       COUNT(*) AS n_types,
       n_curr, n_prev,
       ROUND(CAST(SUM(ABS(c_a * n_prev - c_b * n_curr)) AS DOUBLE)
             / (2.0 * n_curr * n_prev), 9) AS tvd
FROM pairs
GROUP BY hour, n_curr, n_prev
ORDER BY hour
"""


QUERIES = {
    "rolling_user_features": rolling_user_features,
    "lag_lead_returns": lag_lead_returns,
    "cumulative_user_stats": cumulative_user_stats,
    "sma_crossover_signals": sma_crossover_signals,
    "breakout_signals": breakout_signals,
    "centered_extrema_pivots": centered_extrema_pivots,
    "rolling_regression_slope": rolling_regression_slope,
    "rsi_sma_14": rsi_sma_14,
    "rsi_zone_signals": rsi_zone_signals,
    "daily_user_spend_rank": daily_user_spend_rank,
    "latest_events_per_user": latest_events_per_user,
    "user_session_stats": user_session_stats,
    "hourly_event_rollup": hourly_event_rollup,
    "trailing_7d_user_value": trailing_7d_user_value,
    "events_pivot_daily": events_pivot_daily,
    "calendar_gap_fill": calendar_gap_fill,
    "linear_interpolation_fill": linear_interpolation_fill,
    "scd2_build": scd2_build,
    "ols_beta_per_user": ols_beta_per_user,
    "cep_pattern_matches": cep_pattern_matches,
    "scd2_point_in_time": scd2_point_in_time,
    "chained_attribution": chained_attribution,
    "autocorr_features": autocorr_features,
    "vwap_trailing_5d": vwap_trailing_5d,
    "user_retention_cohorts": user_retention_cohorts,
    "event_funnel": event_funnel,
    "event_mix_drift": event_mix_drift,
}

ORACLES = {
    "rolling_user_features": ORACLE_ROLLING_USER_FEATURES,
    "lag_lead_returns": ORACLE_LAG_LEAD_RETURNS,
    "cumulative_user_stats": ORACLE_CUMULATIVE_USER_STATS,
    "sma_crossover_signals": ORACLE_SMA_CROSSOVER_SIGNALS,
    "breakout_signals": ORACLE_BREAKOUT_SIGNALS,
    "centered_extrema_pivots": ORACLE_CENTERED_EXTREMA_PIVOTS,
    "rolling_regression_slope": ORACLE_ROLLING_REGRESSION_SLOPE,
    "rsi_sma_14": ORACLE_RSI_SMA_14,
    "rsi_zone_signals": ORACLE_RSI_ZONE_SIGNALS,
    "daily_user_spend_rank": ORACLE_DAILY_USER_SPEND_RANK,
    "latest_events_per_user": ORACLE_LATEST_EVENTS_PER_USER,
    "user_session_stats": ORACLE_USER_SESSION_STATS,
    "hourly_event_rollup": ORACLE_HOURLY_EVENT_ROLLUP,
    "trailing_7d_user_value": ORACLE_TRAILING_7D_USER_VALUE,
    "events_pivot_daily": ORACLE_EVENTS_PIVOT_DAILY,
    "calendar_gap_fill": ORACLE_CALENDAR_GAP_FILL,
    "linear_interpolation_fill": ORACLE_LINEAR_INTERPOLATION_FILL,
    "scd2_build": ORACLE_SCD2_BUILD,
    "ols_beta_per_user": ORACLE_OLS_BETA_PER_USER,
    "cep_pattern_matches": ORACLE_CEP_PATTERN_MATCHES,
    "scd2_point_in_time": ORACLE_SCD2_POINT_IN_TIME,
    "chained_attribution": ORACLE_CHAINED_ATTRIBUTION,
    "autocorr_features": ORACLE_AUTOCORR_FEATURES,
    "vwap_trailing_5d": ORACLE_VWAP_TRAILING_5D,
    "user_retention_cohorts": ORACLE_USER_RETENTION_COHORTS,
    "event_funnel": ORACLE_EVENT_FUNNEL,
    "event_mix_drift": ORACLE_EVENT_MIX_DRIFT,
}
