"""Financial-ML dataset-construction queries: robust outlier
screening, leakage-aware walk-forward CV splits, and triple-barrier
labeling.

These extend the reference's backtesting/labeling surface
(reference: backtesting/trade_success_predictor.py builds a binary
trade-outcome label set; backtesting/backtest_signals.py walks
signals forward bar-by-bar) with the three standard dataset-prep
steps a financial-ML pipeline runs BEFORE training — as published
in López de Prado, *Advances in Financial Machine Learning* (2018):
purged walk-forward splits with an embargo (ch. 7), triple-barrier
labeling (ch. 3), and robust (median/MAD) outlier screening
(Iglewicz & Hoaglin 1993, the modified z-score).

Everything is exact-arithmetic and rank-based (discrete median
selection, integer fold assignment) so each query carries a
bit-exact DuckDB value oracle — the same discipline as
``segment_percentile_bounds``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# Iglewicz-Hoaglin modified z-score: 0.6745 * (x - med) / MAD, flag > 3.5
MAD_Z_SCALE = 0.6745
MAD_Z_CUTOFF = 3.5

# Purged walk-forward: K time-ordered folds per series, 1-day embargo
# between a fold's train set and its test window (López de Prado ch.7)
WF_FOLDS = 5
WF_EMBARGO = "INTERVAL '1' DAY"

# Triple-barrier: ±5% horizontal barriers, 10-bar vertical barrier
TB_HORIZON = 10
TB_PT = "1.05e0"  # profit-take multiple on entry close
TB_SL = "0.95e0"  # stop-loss multiple on entry close


def robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust outlier screen on event values via the
    median/MAD modified z-score (Iglewicz & Hoaglin 1993): data-
    quality triage that, unlike mean/stddev z-scores, is not itself
    dragged by the outliers it hunts.

    Both medians are DISCRETE rank selections (value at
    ceil(0.5*n), the ``segment_percentile_bounds`` pattern) so med
    and MAD are actual data values and the DuckDB oracle is
    bit-exact — interpolated quantiles would differ in last ulps
    across engines.

    Scale shape: two rank windows partitioned by user_id (the
    natural key, ~uniform) plus one broadcast join of the per-user
    median frame (|users| rows) back onto events; no global sort,
    no UDF. At 100 TB the per-user partitions stay bounded by the
    per-key event count, and the med/MAD frames remain
    broadcast-sized (one row per user-aggregate)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wc = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = F.ceil(F.lit(0.5) * F.col("n")).cast("int")
    meds = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("rn") == mid, F.col("value"))).alias("med")
    )
    dev = ev.join(F.broadcast(meds), "user_id").select(
        "user_id",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("abs_dev"),
    )
    w2 = Window.partitionBy("user_id").orderBy("abs_dev", "event_id")
    dev_ranked = dev.select(
        "*",
        F.row_number().over(w2).alias("rn2"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mads = dev_ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("rn2") == mid, F.col("abs_dev"))).alias("mad")
    )
    z = F.abs(
        F.lit(MAD_Z_SCALE) * (F.col("value") - F.col("med")) / F.expr("nullif(mad, 0d)")
    )
    return (
        dev.join(F.broadcast(mads), "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med").alias("med_value"),
            F.min("mad").alias("mad_value"),
            F.count(F.when(z > MAD_Z_CUTOFF, 1)).alias("n_outliers"),
            F.max(z).alias("max_abs_z"),
        )
        .orderBy("user_id")
    )


ORACLE_ROBUST_OUTLIER_MAD = f"""
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
m AS (
  SELECT user_id,
         MIN(CASE WHEN rn = CAST(CEIL(0.5e0 * n) AS INT) THEN value END) AS med
  FROM r GROUP BY user_id
),
d AS (
  SELECT r.user_id, r.event_id, r.value, m.med,
         ABS(r.value - m.med) AS abs_dev,
         ROW_NUMBER() OVER (PARTITION BY r.user_id
                            ORDER BY ABS(r.value - m.med), r.event_id) AS rn2,
         r.n
  FROM r JOIN m ON r.user_id = m.user_id
),
md AS (
  SELECT user_id,
         MIN(CASE WHEN rn2 = CAST(CEIL(0.5e0 * n) AS INT) THEN abs_dev END) AS mad
  FROM d GROUP BY user_id
)
SELECT d.user_id,
       COUNT(*) AS n_events,
       MIN(d.med) AS med_value,
       MIN(md.mad) AS mad_value,
       COUNT(CASE WHEN ABS({MAD_Z_SCALE} * (d.value - d.med) / NULLIF(md.mad, 0e0))
                       > {MAD_Z_CUTOFF} THEN 1 END) AS n_outliers,
       MAX(ABS({MAD_Z_SCALE} * (d.value - d.med) / NULLIF(md.mad, 0e0))) AS max_abs_z
FROM d JOIN md ON d.user_id = md.user_id
GROUP BY d.user_id
ORDER BY d.user_id
"""


def purged_walkforward_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged walk-forward CV folds with an embargo (López de Prado
    2018 ch. 7): per user, K contiguous time-ordered folds; fold k
    tests on its window and trains on all EARLIER rows minus an
    embargo strip (rows within 1 day before the test window, whose
    labels could leak test-period information). Output is the fold
    manifest a training loop consumes: test bounds + train/embargo/
    test row counts per (user, fold).

    Fold ids come from integer rank arithmetic
    (``((rn-1)*K) div n`` — exact, engine-independent), not NTILE,
    so both engines agree on every boundary.

    Scale shape: one rank window per user (same shuffle the fold
    assignment itself needs), then the row set joins the
    BROADCAST fold-bounds frame (|users|*K rows) with fold < b.fold
    — a bounded K-way fan-out of pre-aggregated candidates, never a
    row×row product. At 100 TB the bounds side stays tiny and the
    probe is one broadcast-hash pass over events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    folded = ev.select(
        "user_id",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    ).select(
        "user_id",
        "ts",
        F.expr(f"cast(((rn - 1) * {WF_FOLDS}) div n as int)").alias("fold"),
    )
    bounds = folded.groupBy("user_id", "fold").agg(
        F.min("ts").alias("test_start"),
        F.max("ts").alias("test_end"),
        F.count(F.lit(1)).alias("test_rows"),
    )
    b = F.broadcast(bounds.select("user_id", "fold", "test_start"))
    prior = folded.alias("f").join(
        b.alias("b"),
        (F.col("f.user_id") == F.col("b.user_id")) & (F.col("f.fold") < F.col("b.fold")),
    )
    trained = prior.groupBy(F.col("b.user_id").alias("user_id"), F.col("b.fold").alias("fold")).agg(
        F.count(F.lit(1)).alias("cand_rows"),
        F.count(
            F.when(F.col("f.ts") >= F.expr(f"b.test_start - {WF_EMBARGO}"), 1)
        ).alias("embargo_rows"),
    )
    return (
        bounds.join(trained, ["user_id", "fold"], "left")
        .select(
            "user_id",
            "fold",
            "test_start",
            "test_end",
            "test_rows",
            F.coalesce(
                F.col("cand_rows") - F.col("embargo_rows"), F.lit(0).cast("long")
            ).alias("train_rows"),
            F.coalesce(F.col("embargo_rows"), F.lit(0).cast("long")).alias("embargo_rows"),
        )
        .orderBy("user_id", "fold")
    )


ORACLE_PURGED_WALKFORWARD_SPLITS = f"""
WITH r AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
f AS (
  SELECT user_id, ts, CAST(((rn - 1) * {WF_FOLDS}) // n AS INT) AS fold FROM r
),
b AS (
  SELECT user_id, fold, MIN(ts) AS test_start, MAX(ts) AS test_end,
         COUNT(*) AS test_rows
  FROM f GROUP BY user_id, fold
),
tr AS (
  SELECT b.user_id, b.fold,
         COUNT(*) AS cand_rows,
         COUNT(CASE WHEN f.ts >= b.test_start - {WF_EMBARGO} THEN 1 END) AS embargo_rows
  FROM b JOIN f ON f.user_id = b.user_id AND f.fold < b.fold
  GROUP BY b.user_id, b.fold
)
SELECT b.user_id, b.fold, b.test_start, b.test_end, b.test_rows,
       COALESCE(tr.cand_rows - tr.embargo_rows, 0) AS train_rows,
       COALESCE(tr.embargo_rows, 0) AS embargo_rows
FROM b LEFT JOIN tr ON b.user_id = tr.user_id AND b.fold = tr.fold
ORDER BY b.user_id, b.fold
"""


def triple_barrier_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-barrier labeling (López de Prado 2018 ch. 3) over the
    daily close series: for each bar, look ahead up to 10 bars and
    label +1 if the close first touches the +5% profit-take
    barrier, -1 if it first touches the -5% stop-loss, 0 if neither
    inside the horizon (the vertical barrier). ``bars_to_hit`` is
    the touch distance a sample-weighting step would use.

    The look-ahead is a FIXED-WIDTH array of lead closes (10 window
    lead expressions collapsing into one WindowExec) scanned with
    JVM array lambdas — one shuffle on the series key, no self-join
    fan-out, no Python. The oracle replays it as a bounded-range
    self-join (b.rn in (a.rn, a.rn+10]), which is semantically
    identical but would be the WRONG Spark plan (per-key equi-join
    explodes to n² candidates before the range filter prunes).

    Barrier compares (close >= entry*1.05e0) are single IEEE
    multiplies — bit-identical across engines, so the label set
    value-hashes exactly."""
    from .fin_domain import ohlcv_resample

    bars = ohlcv_resample(spark, sf_dir).select("user_id", "date", "close")
    w = Window.partitionBy("user_id").orderBy("date")
    leads = F.array(
        *[F.lead("close", i).over(w) for i in range(1, TB_HORIZON + 1)]
    ).alias("leads")
    first_up = F.expr(
        f"array_min(filter(sequence(1, {TB_HORIZON}),"
        f" i -> get(leads, i - 1) >= close * {TB_PT}))"
    )
    first_dn = F.expr(
        f"array_min(filter(sequence(1, {TB_HORIZON}),"
        f" i -> get(leads, i - 1) <= close * {TB_SL}))"
    )
    hit = bars.select("user_id", "date", "close", leads).select(
        "user_id",
        "date",
        "close",
        first_up.alias("first_up"),
        first_dn.alias("first_dn"),
    )
    up_wins = F.col("first_up").isNotNull() & (
        F.col("first_dn").isNull() | (F.col("first_up") <= F.col("first_dn"))
    )
    label = (
        F.when(up_wins, 1).when(F.col("first_dn").isNotNull(), -1).otherwise(0)
    ).cast("int")
    bars_to_hit = (
        F.when(up_wins, F.col("first_up"))
        .when(F.col("first_dn").isNotNull(), F.col("first_dn"))
    ).cast("int")
    return hit.select(
        "user_id",
        "date",
        "close",
        label.alias("label"),
        bars_to_hit.alias("bars_to_hit"),
    ).orderBy("user_id", "date")


ORACLE_TRIPLE_BARRIER_LABELS = f"""
WITH t AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS date, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_d
  FROM events
),
bars AS (
  SELECT user_id, date, MIN(CASE WHEN rn_d = 1 THEN value END) AS close
  FROM t GROUP BY user_id, date
),
rb AS (
  SELECT user_id, date, close,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY date) AS rn
  FROM bars
),
h AS (
  SELECT a.user_id, a.rn,
         MIN(CASE WHEN b.close >= a.close * {TB_PT} THEN b.rn - a.rn END) AS first_up,
         MIN(CASE WHEN b.close <= a.close * {TB_SL} THEN b.rn - a.rn END) AS first_dn
  FROM rb a JOIN rb b
    ON a.user_id = b.user_id AND b.rn > a.rn AND b.rn <= a.rn + {TB_HORIZON}
  GROUP BY a.user_id, a.rn
)
SELECT rb.user_id, rb.date, rb.close,
  CAST(CASE WHEN h.first_up IS NOT NULL
                 AND (h.first_dn IS NULL OR h.first_up <= h.first_dn) THEN 1
            WHEN h.first_dn IS NOT NULL THEN -1 ELSE 0 END AS INT) AS label,
  CAST(CASE WHEN h.first_up IS NOT NULL
                 AND (h.first_dn IS NULL OR h.first_up <= h.first_dn) THEN h.first_up
            WHEN h.first_dn IS NOT NULL THEN h.first_dn END AS INT) AS bars_to_hit
FROM rb LEFT JOIN h ON rb.user_id = h.user_id AND rb.rn = h.rn
ORDER BY rb.user_id, rb.date
"""


QUERIES = {
    "robust_outlier_mad": robust_outlier_mad,
    "purged_walkforward_splits": purged_walkforward_splits,
    "triple_barrier_labels": triple_barrier_labels,
}

ORACLES = {
    "robust_outlier_mad": ORACLE_ROBUST_OUTLIER_MAD,
    "purged_walkforward_splits": ORACLE_PURGED_WALKFORWARD_SPLITS,
    "triple_barrier_labels": ORACLE_TRIPLE_BARRIER_LABELS,
}
