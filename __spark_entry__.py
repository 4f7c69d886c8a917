"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fin_trade_craft_spark.queries`` — one
module per operator family, each exporting QUERIES + ORACLES.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fin_trade_craft_spark.queries import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-way join of
    lineitem→orders→customer→nation→region with broadcast dims and
    exact-decimal revenue aggregation."""
    from fin_trade_craft_spark.queries.relational import regional_revenue

    return regional_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here (vs
    ``queries()``) are the genuinely non-SQL-expressible operators
    (pandas-recurrence islands) — rows-only check by design."""
    return all_oracles()
