"""Sketch-based profiling — approximate aggregates whose merge
property is what makes 100 TB summary statistics single-pass:
HyperLogLog++ for distinct counts (`approx_count_distinct`) and the
Greenwald-Khanna quantile sketch (`percentile_approx`). Both are
mergeable partial aggregates: every partition builds a constant-
size sketch, the shuffle carries sketches (not values), and the
final merge is exact over sketches — the same shape at 32 rows or
32 trillion.

The exact variants used everywhere else in this engine
(`countDistinct`, sort-based percentiles) shuffle data proportional
to cardinality; these shuffle O(1) per group. Driver checks are
rows-only BY DESIGN: sketch outputs are algorithm-specific (Spark's
HLL++ ≠ DuckDB's approx_distinct), so cross-engine value equality
is the wrong contract — the right one is the published error bound,
asserted against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

RSD = 0.02  # HLL++ target relative standard deviation
PCT_ACC = 10_000  # percentile_approx accuracy knob (err ≤ 1/acc)


def approx_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stream profile: approximate user cardinality
    and value quantiles alongside exact row counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("user_id", rsd=RSD).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], PCT_ACC).alias("value_quantiles"),
        )
        .select(
            "event_type",
            "n_rows",
            "approx_users",
            F.col("value_quantiles")[0].alias("p50"),
            F.col("value_quantiles")[1].alias("p90"),
            F.col("value_quantiles")[2].alias("p99"),
        )
    )


def approx_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide dedup-planning profile: approximate distinct
    document lengths and sources — the kind of cheap first pass that
    sizes a dedup job before running it."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("source", rsd=RSD).alias("approx_sources"),
        F.approx_count_distinct("n_chars", rsd=RSD).alias("approx_len_classes"),
        F.percentile_approx("n_chars", 0.5, PCT_ACC).alias("median_len"),
    )


FREQ_SUPPORT = 0.02  # heavy-hitter threshold (share of token mass)


def frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters via sketch-then-verify: a single-pass
    Karp-Papadimitriou-Shenker candidate sweep (``stat.freqItems`` —
    mergeable, O(1/support) state per partition) guarantees a
    SUPERSET of every token with share ≥ support; exact counts are
    then computed ONLY for candidates, and the final filter keeps
    true heavy hitters. Same approximate-generate → exact-verify
    pattern as the LSH dedup ladder, which is why this sketch query
    can carry a full value oracle while the HLL/GK profiles above
    are rows-only (their outputs are algorithm-specific).

    Scale shape: the candidate list is ≤ 1/support items (driver-
    side, small BY CONSTRUCTION); the verify pass is a map-side-
    combinable count over an `isin` filter that prunes the shuffle
    to candidate tokens only — never a full-vocabulary shuffle."""
    from ..functions import text as T

    # materialize: three actions consume this frame (candidate sweep,
    # total count, verify aggregate) — don't re-tokenize per action
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(T.tokens(F.col("text"))).alias("term"))
        .localCheckpoint(eager=True)
    )
    # sweep at HALF the reporting threshold: freqItems guarantees a
    # superset only of items with share strictly GREATER than its
    # support, so an item at exactly FREQ_SUPPORT could be swept out
    # if we probed at FREQ_SUPPORT itself; the verify filter below
    # (>=) is the single source of truth for the cut
    cands = d.stat.freqItems(["term"], FREQ_SUPPORT / 2).collect()[0][0]
    total = d.count()
    share = F.col("n").cast("double") / F.lit(float(total))
    return (
        d.filter(F.col("term").isin(list(cands)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", share)
        .filter(F.col("n") >= F.lit(FREQ_SUPPORT) * F.lit(float(total)))
        .orderBy(F.desc("n"), "term")
    )


ORACLE_FREQUENT_TOKENS = f"""
WITH t AS (
  SELECT unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
), c AS (
  SELECT term, COUNT(*) AS n FROM t GROUP BY term
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c
)
SELECT term, n, CAST(n AS DOUBLE) / total AS share
FROM c, tot
WHERE n >= {FREQ_SUPPORT} * total
ORDER BY n DESC, term
"""


QUERIES = {
    "approx_events_profile": approx_events_profile,
    "approx_corpus_profile": approx_corpus_profile,
    "frequent_tokens": frequent_tokens,
}

# HLL/GK profiles are rows-only by design (see module docstring);
# frequent_tokens is exact after verification, hence oracle-checked
ORACLES: dict[str, str] = {"frequent_tokens": ORACLE_FREQUENT_TOKENS}
