"""As-of / point-in-time join queries (SURVEY §2.3 J6).

Test-table instantiation of the reference's trade⟕fundamental
enrichment: each ``purchase`` event is enriched with the latest
prior ``view`` event of the same user within a 2-hour validity
window; purchases with no qualifying view are preserved with NULLs
(backtesting/join_fundamentals_to_trades.py:170-269 semantics:
publication-lag ≤ entry ≤ valid-until, latest wins, left-preserve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.catalog import load_table

VALIDITY_US = 2 * 3600 * 1_000_000  # 2 hours


def asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    validity = F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")) <= F.lit(VALIDITY_US)
    out = asof_join(
        purchases,
        views,
        on=[],
        left_time="p_ts",
        right_time="v_ts",
        left_key="p_id",
        validity=validity & (purchases["p_user"] == views["v_user"]),
        tiebreak=[F.col("v_id").desc()],
        how="left",
        band_window_us=VALIDITY_US,
    )
    return out.select("p_id", "p_user", "p_ts", "p_value", "v_id", "v_ts", "v_value")


ORACLE_ASOF_ENRICHMENT = """
SELECT p_id, p_user, p_ts, p_value, v_id, v_ts, v_value
FROM (
  SELECT p.event_id AS p_id, p.user_id AS p_user,
         CAST(p.ts AS TIMESTAMP) AS p_ts, p.value AS p_value,
         v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts, v.value AS v_value,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY CAST(v.ts AS TIMESTAMP) DESC NULLS LAST, v.event_id DESC
         ) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id
   AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
   AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) <= 7200000000
) WHERE rn = 1
"""


def asof_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``):
    each ``purchase`` is matched to the user's EARLIEST subsequent
    ``click`` within 2 hours — the "next action after conversion"
    enrichment (a trade matched to its next quote/fill in the
    reference's domain). Left-preserving: purchases with no
    qualifying click keep NULLs. Same plan shape as the backward
    join — one equi-shuffle on user + a per-purchase row_number —
    only the inequality direction and window ordering flip."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    validity = F.unix_micros(F.col("c_ts")) - F.unix_micros(F.col("p_ts")) <= F.lit(VALIDITY_US)
    out = asof_join(
        purchases,
        clicks,
        on=[],
        left_time="p_ts",
        right_time="c_ts",
        left_key="p_id",
        validity=validity & (purchases["p_user"] == clicks["c_user"]),
        tiebreak=[F.col("c_id").asc()],
        how="left",
        direction="forward",
        band_window_us=VALIDITY_US,
    )
    return out.select("p_id", "p_user", "p_ts", "p_value", "c_id", "c_ts", "c_value")


ORACLE_ASOF_FORWARD_FILL = """
SELECT p_id, p_user, p_ts, p_value, c_id, c_ts, c_value
FROM (
  SELECT p.event_id AS p_id, p.user_id AS p_user,
         CAST(p.ts AS TIMESTAMP) AS p_ts, p.value AS p_value,
         c.event_id AS c_id, CAST(c.ts AS TIMESTAMP) AS c_ts, c.value AS c_value,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY CAST(c.ts AS TIMESTAMP) ASC NULLS LAST, c.event_id ASC
         ) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id
   AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
   AND epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP)) <= 7200000000
) WHERE rn = 1
"""


NEAREST_US = 3600 * 1_000_000  # 1 hour, two-sided


def asof_nearest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    each ``purchase`` is matched to the same user's ``view`` with the
    smallest |Δt| within a TWO-SIDED 1-hour window; equidistant
    candidates resolve backward (the earlier view wins), matching
    pandas. The two-sided validity bound is what keeps the candidate
    set per key finite at scale — an unbounded nearest join is the
    full per-key cross product (operators/asof.py docstring)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    dist = F.abs(F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")))
    out = asof_join(
        purchases,
        views,
        on=[],
        left_time="p_ts",
        right_time="v_ts",
        left_key="p_id",
        validity=(dist <= F.lit(NEAREST_US)) & (purchases["p_user"] == views["v_user"]),
        tiebreak=[F.col("v_id").asc()],
        how="left",
        direction="nearest",
        band_window_us=NEAREST_US,
    )
    return out.select("p_id", "p_user", "p_ts", "p_value", "v_id", "v_ts", "v_value")


ORACLE_ASOF_NEAREST_MATCH = """
SELECT p_id, p_user, p_ts, p_value, v_id, v_ts, v_value
FROM (
  SELECT p.event_id AS p_id, p.user_id AS p_user,
         CAST(p.ts AS TIMESTAMP) AS p_ts, p.value AS p_value,
         v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts, v.value AS v_value,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY ABS(epoch_us(CAST(p.ts AS TIMESTAMP))
                        - epoch_us(CAST(v.ts AS TIMESTAMP))) ASC NULLS LAST,
                    CAST(v.ts AS TIMESTAMP) ASC NULLS LAST, v.event_id ASC
         ) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id
   AND ABS(epoch_us(CAST(p.ts AS TIMESTAMP))
           - epoch_us(CAST(v.ts AS TIMESTAMP))) <= 3600000000
) WHERE rn = 1
"""


QUERIES = {
    "asof_enrichment": asof_enrichment,
    "asof_forward_fill": asof_forward_fill,
    "asof_nearest_match": asof_nearest_match,
}
ORACLES = {
    "asof_enrichment": ORACLE_ASOF_ENRICHMENT,
    "asof_forward_fill": ORACLE_ASOF_FORWARD_FILL,
    "asof_nearest_match": ORACLE_ASOF_NEAREST_MATCH,
}
