"""Exact (order-independent) aggregate arithmetic.

Floating-point addition is not associative, so a double SUM depends
on partial-aggregation order — Spark's distributed fold and an
oracle's single-threaded fold may disagree in the last ulps, and at
1000 executors the same query can even disagree with itself run to
run. Every money/quantity aggregate in this engine therefore runs
through exact DECIMAL arithmetic and only converts back to DOUBLE at
the end: bit-identical on 1 core or 1000 executors.

The reference gets this for free because Postgres NUMERIC is exact
(SURVEY §7.3 risk 2); this module is the Spark-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(18,s) sums expand to DECIMAL(38,s) internally in Spark —
# no overflow until ~1e20 absolute sum, far beyond 100 TB of money
# columns; inputs above 1e16 would need a wider input precision.


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM: exact decimal accumulate, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum, one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def share_of_total(cnt: Column) -> Column:
    """100 * cnt / total as a single deterministic double chain."""
    from pyspark.sql import Window

    return F.lit(100.0) * cnt / F.sum(cnt).over(Window.partitionBy())
