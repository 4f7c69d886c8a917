"""Market-microstructure queries: alternative bar construction and
liquidity estimation over the tick stream.

These extend the reference's bar/indicator surface (reference:
data_pipeline/transform/ohlcv_transformer.py resamples ticks into
time bars; backtesting/backtest_signals.py consumes them) with the
standard microstructure toolkit a fin-ML pipeline derives from the
same ticks — as published in López de Prado, *Advances in Financial
Machine Learning* (2018) ch. 2 (dollar bars) and ch. 19 (liquidity
estimators), Roll (1984), Amihud (2002), and Kyle (1985).

Exactness discipline (the ``dsum`` rule): every cross-row sum runs
in exact DECIMAL (or integer cents) so the result is independent of
Spark's partial-aggregation order, and the final scalar estimators
are computed from those exact sums in ONE agreed IEEE expression
tree mirrored verbatim in the DuckDB oracle — bit-exact on 1 core
or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..sources.catalog import load_table

# Dollar-bar threshold: a new bar begins each time the per-user
# cumulative traded value crosses a $500 boundary (in exact cents).
DOLLAR_BAR_CENTS = 50_000

# Cross-sectional correlation is bounded by contract to the K most
# active series (deterministic tie-break on user_id) — at 100 TB the
# pair count is K², never |users|².
XSECT_TOP_K = 20


def dollar_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dollar-bar construction (López de Prado 2018 ch. 2): bars
    close when cumulative traded VALUE — not wall-clock time —
    crosses a threshold, so information arrival is roughly constant
    per bar and bar counts track activity instead of calendars.

    Bucketing variant (documented divergence from the running-reset
    formulation): tick t joins bar ``floor(pre_cum / T)`` where
    pre_cum is the user's cumulative dollar volume BEFORE t. Bar
    boundaries therefore sit at exact multiples of T of the
    accumulated flow — the cumulative total through the end of every
    non-final bar k has crossed (k+1)·T (a single overshooting tick
    can leave one bar under T, never the cumulative boundary) — and
    the assignment is a pure window expression (the reset
    formulation is a sequential recurrence with no closed form).

    Exactness: the cumulative sum runs in integer CENTS
    (``CAST(value*100 AS BIGINT)`` after an exact DECIMAL(18,2)
    hop), so bucket boundaries carry no float ambiguity; DuckDB's
    segment-tree window fold and Spark's sequential running fold
    agree exactly because integer addition is associative. The
    final floor-divide quotients stay far below 2^53.

    Scale shape: one shuffle on user_id shared by the running-sum
    window and the bar aggregation (same key prefix); the bar agg
    is a hash aggregate with map-side partial combine. No join, no
    UDF, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.col("value").cast("decimal(18,2)") * 100
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ticks = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        cents.cast("bigint").alias("cents"),
    ).select(
        "*",
        (F.sum("cents").over(w) - F.col("cents")).alias("pre_cum"),
    )
    bar = F.floor(F.col("pre_cum") / F.lit(DOLLAR_BAR_CENTS)).cast("bigint")
    order = F.struct("ts", "event_id")
    return (
        ticks.select("user_id", bar.alias("bar_id"), "ts", "event_id", "value")
        .groupBy("user_id", "bar_id")
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            dsum("value").alias("dollar_volume"),
        )
        .orderBy("user_id", "bar_id")
    )


ORACLE_DOLLAR_BARS = f"""
WITH c AS (
  SELECT user_id, ts, event_id, value,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
p AS (
  SELECT user_id, ts, event_id, value,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cents AS pre_cum
  FROM c
),
b AS (
  SELECT user_id,
         CAST(FLOOR(pre_cum / {DOLLAR_BAR_CENTS}) AS BIGINT) AS bar_id,
         ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, FLOOR(pre_cum / {DOLLAR_BAR_CENTS})
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, FLOOR(pre_cum / {DOLLAR_BAR_CENTS})
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM p
)
SELECT user_id, bar_id,
  MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
  COUNT(*) AS n_ticks,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dollar_volume
FROM b
GROUP BY user_id, bar_id
ORDER BY user_id, bar_id
"""


def microstructure_liquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series liquidity panel over the daily bars: the Roll
    (1984) implied effective spread ``2·sqrt(max(0, −cov(Δp_t,
    Δp_{t−1})))``, the Amihud (2002) illiquidity ratio (aggregate
    form ``10^6 · Σ|Δp| / Σ dollar_volume`` — the ratio-of-sums
    variant, which keeps both sums exact-decimal; the mean-of-daily-
    ratios form would sum per-row doubles in engine-dependent
    order), and Kyle's (1985) lambda — the OLS slope of Δp on
    SIGNED dollar volume (tick-rule sign = sign(Δp)).

    Exactness: Δp is an exact DECIMAL(18,2) difference of closes;
    all moment sums (Σx, Σy, Σxy, Σx²) accumulate in DECIMAL, cast
    to DOUBLE once, and the estimators are single agreed IEEE
    expression trees over those deterministic doubles.

    Scale shape: bars (one shuffle on user_id) → lag window (same
    key) → one hash aggregate per user. The whole panel is a
    per-key linear pass; output is |users| rows."""
    from .fin_domain import ohlcv_resample

    bars = ohlcv_resample(spark, sf_dir).select(
        "user_id",
        "date",
        F.col("close").cast("decimal(18,2)").alias("close_d"),
        F.col("traded_value").cast("decimal(12,2)").alias("dvol"),
    )
    w = Window.partitionBy("user_id").orderBy("date")
    # dp capped at DECIMAL(12,2): |Δclose| is price-scale, so the
    # narrower type keeps products within precision 38 in BOTH
    # engines (a (19,2)×(19,2) product would overflow Spark's cap
    # and round — silently, differently from DuckDB)
    d = bars.select(
        "user_id",
        "date",
        "dvol",
        (F.col("close_d") - F.lag("close_d").over(w)).cast("decimal(12,2)").alias("dp"),
    ).select(
        "user_id",
        "dvol",
        "dp",
        F.lag("dp").over(w).alias("dp_lag"),
    )
    signed = (
        F.when(F.col("dp") > 0, F.col("dvol"))
        .when(F.col("dp") < 0, -F.col("dvol"))
        .otherwise(F.lit(0))
        .cast("decimal(12,2)")
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.when(F.col("dp").isNotNull(), 1)).alias("n_moves"),
        # Roll: serial-covariance moments over adjacent Δp pairs
        F.count(F.when(F.col("dp_lag").isNotNull(), 1)).alias("n_pairs"),
        F.sum(F.when(F.col("dp_lag").isNotNull(), F.col("dp"))).cast("double").alias("s_x"),
        F.sum(F.when(F.col("dp_lag").isNotNull(), F.col("dp_lag"))).cast("double").alias("s_y"),
        F.sum(F.col("dp") * F.col("dp_lag")).cast("double").alias("s_xy"),
        # Amihud: exact ratio-of-sums ingredients
        F.sum(F.abs(F.col("dp"))).cast("double").alias("s_absdp"),
        F.sum(F.when(F.col("dp").isNotNull(), F.col("dvol"))).cast("double").alias("s_dvol"),
        # Kyle: Δp on signed dollar volume
        F.sum(F.when(F.col("dp").isNotNull(), signed)).cast("double").alias("k_sx"),
        F.sum(F.when(F.col("dp").isNotNull(), F.col("dp"))).cast("double").alias("k_sy"),
        F.sum(signed * F.col("dp")).cast("double").alias("k_sxy"),
        F.sum(signed * signed).cast("double").alias("k_sxx"),
    )
    n_pairs = F.col("n_pairs").cast("double")
    cov = (F.col("s_xy") - F.col("s_x") * F.col("s_y") / n_pairs) / n_pairs
    roll = F.when(
        F.col("n_pairs") >= 2,
        F.lit(2.0) * F.sqrt(F.greatest(F.lit(0.0), -cov)),
    )
    amihud = F.lit(1e6) * F.col("s_absdp") / F.expr("nullif(s_dvol, 0d)")
    n_moves = F.col("n_moves").cast("double")
    kyle = F.when(
        F.col("n_moves") >= 2,
        (n_moves * F.col("k_sxy") - F.col("k_sx") * F.col("k_sy"))
        / F.expr(
            "nullif(cast(n_moves as double) * k_sxx - k_sx * k_sx, 0d)"
        ),
    )
    return agg.select(
        "user_id",
        "n_moves",
        roll.alias("roll_spread"),
        amihud.alias("amihud_illiq"),
        kyle.alias("kyle_lambda"),
    ).orderBy("user_id")


ORACLE_MICROSTRUCTURE_LIQUIDITY = """
WITH t AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS date, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
  FROM events
),
bars AS (
  SELECT user_id, date,
         CAST(MIN(CASE WHEN rn_d = 1 THEN value END) AS DECIMAL(18,2)) AS close_d,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS DECIMAL(12,2)) AS dvol
  FROM t GROUP BY user_id, date
),
d0 AS (
  SELECT user_id, date, dvol,
         CAST(close_d - LAG(close_d) OVER (PARTITION BY user_id ORDER BY date)
              AS DECIMAL(12,2)) AS dp
  FROM bars
),
d AS (
  SELECT user_id, dvol, dp,
         LAG(dp) OVER (PARTITION BY user_id ORDER BY date) AS dp_lag
  FROM d0
),
a AS (
  SELECT user_id,
    COUNT(CASE WHEN dp IS NOT NULL THEN 1 END) AS n_moves,
    COUNT(CASE WHEN dp_lag IS NOT NULL THEN 1 END) AS n_pairs,
    CAST(SUM(CASE WHEN dp_lag IS NOT NULL THEN dp END) AS DOUBLE) AS s_x,
    CAST(SUM(CASE WHEN dp_lag IS NOT NULL THEN dp_lag END) AS DOUBLE) AS s_y,
    CAST(SUM(dp * dp_lag) AS DOUBLE) AS s_xy,
    CAST(SUM(ABS(dp)) AS DOUBLE) AS s_absdp,
    CAST(SUM(CASE WHEN dp IS NOT NULL THEN dvol END) AS DOUBLE) AS s_dvol,
    CAST(SUM(CASE WHEN dp IS NOT NULL THEN
      CASE WHEN dp > 0 THEN dvol WHEN dp < 0 THEN -dvol
           ELSE CAST(0 AS DECIMAL(12,2)) END END) AS DOUBLE) AS k_sx,
    CAST(SUM(CASE WHEN dp IS NOT NULL THEN dp END) AS DOUBLE) AS k_sy,
    CAST(SUM((CASE WHEN dp > 0 THEN dvol WHEN dp < 0 THEN -dvol
              ELSE CAST(0 AS DECIMAL(12,2)) END) * dp) AS DOUBLE) AS k_sxy,
    CAST(SUM((CASE WHEN dp > 0 THEN dvol WHEN dp < 0 THEN -dvol
              ELSE CAST(0 AS DECIMAL(12,2)) END)
           * (CASE WHEN dp > 0 THEN dvol WHEN dp < 0 THEN -dvol
              ELSE CAST(0 AS DECIMAL(12,2)) END)) AS DOUBLE) AS k_sxx
  FROM d GROUP BY user_id
)
SELECT user_id, n_moves,
  CASE WHEN n_pairs >= 2 THEN
    2e0 * SQRT(GREATEST(0e0,
      -((s_xy - s_x * s_y / CAST(n_pairs AS DOUBLE)) / CAST(n_pairs AS DOUBLE))))
  END AS roll_spread,
  1e6 * s_absdp / NULLIF(s_dvol, 0e0) AS amihud_illiq,
  CASE WHEN n_moves >= 2 THEN
    (CAST(n_moves AS DOUBLE) * k_sxy - k_sx * k_sy)
      / NULLIF(CAST(n_moves AS DOUBLE) * k_sxx - k_sx * k_sx, 0e0)
  END AS kyle_lambda
FROM a
ORDER BY user_id
"""


def cross_sectional_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily close CHANGES across
    the K most active series — the input panel for portfolio
    construction (risk models, HRP-style clustering) built from
    the same bars the signal engine uses.

    Bounded by contract: only the top ``XSECT_TOP_K`` users by bar
    count (ties broken by user_id) enter the pair join, so the
    output is ≤ K(K−1)/2 rows and the join fan-out K² — independent
    of corpus size. The top-K selection is a TakeOrderedAndProject
    (sort-limit, no unpartitioned window), broadcast back as a
    semi-join filter.

    Exactness: Δclose is exact DECIMAL; the five correlation moment
    sums accumulate in DECIMAL per pair, the final corr is one
    agreed double expression tree. Pairs align on calendar date
    (inner join ⇒ only co-traded days count)."""
    from .fin_domain import ohlcv_resample

    bars = ohlcv_resample(spark, sf_dir).select(
        "user_id", "date", F.col("close").cast("decimal(18,2)").alias("close_d")
    )
    w = Window.partitionBy("user_id").orderBy("date")
    rets = bars.select(
        "user_id",
        "date",
        (F.col("close_d") - F.lag("close_d").over(w)).alias("dp"),
    ).filter(F.col("dp").isNotNull())
    topk = (
        rets.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_bars"))
        .orderBy(F.desc("n_bars"), F.asc("user_id"))
        .limit(XSECT_TOP_K)
        .select("user_id")
    )
    sel = rets.join(F.broadcast(topk), "user_id")
    a = sel.select(
        F.col("user_id").alias("user_a"), "date", F.col("dp").alias("x")
    )
    b = sel.select(
        F.col("user_id").alias("user_b"), "date", F.col("dp").alias("y")
    )
    pairs = a.join(F.broadcast(b), "date").filter(F.col("user_a") < F.col("user_b"))
    m = pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n_days").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.expr(
        "nullif(sqrt(n_days * sxx - sx * sx) * sqrt(n_days * syy - sy * sy), 0d)"
    )
    return (
        m.filter(F.col("n_days") >= 3)
        .select("user_a", "user_b", "n_days", corr.alias("corr_dp"))
        .orderBy("user_a", "user_b")
    )


ORACLE_CROSS_SECTIONAL_CORRELATION = f"""
WITH t AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS date, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
  FROM events
),
bars AS (
  SELECT user_id, date,
         CAST(MIN(CASE WHEN rn_d = 1 THEN value END) AS DECIMAL(18,2)) AS close_d
  FROM t GROUP BY user_id, date
),
rets AS (
  SELECT user_id, date,
         close_d - LAG(close_d) OVER (PARTITION BY user_id ORDER BY date) AS dp
  FROM bars
  QUALIFY dp IS NOT NULL
),
topk AS (
  SELECT user_id FROM (
    SELECT user_id, COUNT(*) AS n_bars FROM rets GROUP BY user_id
  ) ORDER BY n_bars DESC, user_id ASC LIMIT {XSECT_TOP_K}
),
sel AS (SELECT r.* FROM rets r JOIN topk USING (user_id)),
m AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         COUNT(*) AS n_days,
         CAST(SUM(a.dp) AS DOUBLE) AS sx,
         CAST(SUM(b.dp) AS DOUBLE) AS sy,
         CAST(SUM(a.dp * b.dp) AS DOUBLE) AS sxy,
         CAST(SUM(a.dp * a.dp) AS DOUBLE) AS sxx,
         CAST(SUM(b.dp * b.dp) AS DOUBLE) AS syy
  FROM sel a JOIN sel b ON a.date = b.date AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)
SELECT user_a, user_b, n_days,
  (CAST(n_days AS DOUBLE) * sxy - sx * sy)
    / NULLIF(SQRT(CAST(n_days AS DOUBLE) * sxx - sx * sx)
           * SQRT(CAST(n_days AS DOUBLE) * syy - sy * sy), 0e0) AS corr_dp
FROM m
WHERE n_days >= 3
ORDER BY user_a, user_b
"""


QUERIES = {
    "dollar_bars": dollar_bars,
    "microstructure_liquidity": microstructure_liquidity,
    "cross_sectional_correlation": cross_sectional_correlation,
}

ORACLES = {
    "dollar_bars": ORACLE_DOLLAR_BARS,
    "microstructure_liquidity": ORACLE_MICROSTRUCTURE_LIQUIDITY,
    "cross_sectional_correlation": ORACLE_CROSS_SECTIONAL_CORRELATION,
}
