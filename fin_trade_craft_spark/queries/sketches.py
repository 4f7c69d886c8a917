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


QUERIES = {
    "approx_events_profile": approx_events_profile,
    "approx_corpus_profile": approx_corpus_profile,
}

# rows-only by design — see module docstring
ORACLES: dict[str, str] = {}
