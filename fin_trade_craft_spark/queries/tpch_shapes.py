"""Additional TPC-H-shaped relational queries (Q2/Q4/Q8/Q9/Q10/Q14/Q19
analogs, adapted to the testdata schema — no partsupp/shipmode columns,
so supply-cost shapes derive cost from ``p_retailprice`` and lateness
from ``o_orderdate`` offsets).

These widen the relational surface beyond the reference's own query
shapes (SURVEY §2.3/§2.4): correlated EXISTS, correlated-min subquery,
market-share CASE ratios, disjunctive predicate pushdown.

Scale notes (100 TB stance):
- Every correlated subquery is de-correlated into an aggregate +
  join — no per-row probes. The per-key aggregates are partial
  (map-side) before their single shuffle.
- Dimensions (part/supplier/nation/region/customer) are broadcast;
  the fact side never shuffles for a dim join.
- The disjunctive-predicate query keeps the OR-of-ANDs as one scan
  filter so it reaches the parquet reader (row-group pruning via
  min/max on l_quantity), instead of unioning three scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum
from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped correlated EXISTS: count orders per priority
    that have at least one lineitem shipped >60 days after the order
    date, within a one-year order window. The EXISTS de-correlates
    to a left-semi join on the order key with the lateness predicate
    as a join condition — one shuffle pair on the key, no per-order
    probe (reference analog: raw-table existence checks in
    transform_time_series_daily_adjusted.py incremental mode)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_PRIORITY_LATE_ORDERS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: per order-year, the fraction of
    ASIA-customer widget revenue supplied by NATION_1 suppliers.
    The share is a conditional exact-decimal sum over the same
    joined frame — one aggregation, no self-join. All dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").endswith("widget")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust_asia = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey, "left_semi")
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("n_name"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_1", F.col("volume"))).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


ORACLE_MARKET_SHARE = """
WITH joined AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS volume,
         n2.n_name AS n_name
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_name LIKE '%widget'
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
)
SELECT o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_1' THEN volume END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM joined
GROUP BY o_year
ORDER BY o_year
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup: per supplier nation and order
    year, revenue minus imputed cost (60% of part retail price per
    unit — the schema has no partsupp.ps_supplycost). 'bolt' parts
    only, mirroring Q9's p_name LIKE filter. Profit terms stay in
    exact decimals until the final double cast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt")).select(
        "p_partkey", "p_retailprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    ) - F.col("p_retailprice").cast("decimal(18,4)") * F.lit(0.60).cast(
        "decimal(3,2)"
    ) * F.col("l_quantity").cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation,
       EXTRACT(YEAR FROM o_orderdate) AS o_year,
       -- VARCHAR hop: correctly-rounded decimal->double past 2^53
       -- scaled units (see ORACLE_PRICING_SUMMARY)
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                - CAST(p_retailprice AS DECIMAL(18,4))
                  * CAST(0.60 AS DECIMAL(3,2))
                  * CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top 20 customers by
    revenue lost to returns ('R' lineitems) for orders placed in one
    quarter, with their nation. Fact-fact join shuffles once on the
    order key; customer+nation broadcast."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_RETURNED_ITEM_CUSTOMERS = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo share, per month: 100 * PROMO-part
    revenue / total revenue for each ship month of 1996. One
    broadcast dim join + one grouped conditional sum — the ratio is
    computed from two exact-decimal sums in the same aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.month("l_shipdate").cast("long").alias("ship_month"),
                rev.alias("rev"), F.col("p_type"))
        .groupBy("ship_month")
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))).cast("double")
                / F.sum("rev").cast("double")
            ).alias("promo_share"),
            F.sum("rev").cast("double").alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


ORACLE_PROMO_REVENUE_SHARE = """
SELECT EXTRACT(MONTH FROM l_shipdate) AS ship_month,
       -- VARCHAR hops: correctly-rounded decimal->double past 2^53
       -- scaled units (see ORACLE_PRICING_SUMMARY)
       100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    END) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS VARCHAR) AS DOUBLE)
         AS promo_share,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS VARCHAR) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY EXTRACT(MONTH FROM l_shipdate)
ORDER BY ship_month
"""


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate: revenue from three
    OR'd brand/size/quantity bands. Kept as ONE join with an
    OR-of-ANDs residual filter (not three scans unioned) so the
    common parts of the predicate push to the parquet scan and the
    part dim is read once; tested to produce a single broadcast
    join in tests/test_plans.py."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return joined.filter(band).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_DISJUNCTIVE_PART_REVENUE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS VARCHAR) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min subquery: for each small part
    (p_size < 10), the supplier whose average effective sale price
    for that part is the minimum (the schema has no partsupp, so the
    observed lineitem price stands in for ps_supplycost). The
    correlated MIN de-correlates into a per-(part,supplier)
    aggregate + a per-part min + an equi-join back — two hash
    aggregations sharing one shuffle on l_partkey prefix keys, no
    per-part probe. Ties broken by the lowest supplier key so the
    result is deterministic at any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10).select(
        "p_partkey", "p_name", "p_brand"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    eff = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    per_ps = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (F.sum(eff).cast("double") / F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
             ).alias("avg_unit_price")
        )
    )
    best = per_ps.groupBy("l_partkey").agg(
        F.min("avg_unit_price").alias("min_price")
    )
    winner = (
        per_ps.join(best, "l_partkey")
        .filter(F.col("avg_unit_price") == F.col("min_price"))
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("l_suppkey"))
    )
    return (
        winner.join(F.broadcast(part), winner.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), winner.l_suppkey == supp.s_suppkey)
        .select(
            F.col("p_partkey"), F.col("p_name"), F.col("p_brand"),
            F.col("s_name"), F.col("s_acctbal"),
            F.col("min_price").alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(100)
    )


ORACLE_CHEAPEST_SUPPLIER_PER_PART = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS avg_unit_price
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
  GROUP BY l_partkey, l_suppkey
), winner AS (
  SELECT l_partkey, avg_unit_price AS unit_price, MIN(l_suppkey) AS l_suppkey
  FROM per_ps
  WHERE avg_unit_price = (SELECT MIN(avg_unit_price) FROM per_ps p2
                          WHERE p2.l_partkey = per_ps.l_partkey)
  GROUP BY l_partkey, avg_unit_price
)
SELECT p_partkey, p_name, p_brand, s_name, s_acctbal, unit_price
FROM winner
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
"""


def _rev() -> F.Column:
    # built lazily: Column construction needs an active SparkContext,
    # and this module must import cleanly before any session exists
    # (pytest collection, driver import order)
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before a
    cutoff but not yet fully shipped at it, for one market segment.
    Customer is a broadcast dim (segment filter applied before the
    broadcast); lineitem and orders shuffle once on the order key;
    revenue is exact-decimal so the top-10 CUT is deterministic
    across engines and parallelism (a double sum could reorder ties
    at the boundary)."""
    cutoff = F.lit("1998-06-01")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filtered aggregate — the query
    whose entire cost IS the scan, so every predicate must reach the
    parquet reader (date range, discount band, quantity cap are all
    min/max-prunable; `.explain` shows them in PushedFilters).
    One partial-aggregated sum, no shuffle of rows — the 100 TB cost
    is (pruned bytes read) / (scan bandwidth), nothing else."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(3,2)"
    )
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_FORECAST_REVENUE_CHANGE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value for suppliers in a
    nation group, keeping parts whose value exceeds a fraction of the
    GLOBAL total (scalar subquery over the same aggregate). The
    global total is a one-row broadcast (crossJoin of an agg), and
    the threshold compare stays in exact decimal (``2500*value >
    total``) — a double compare could flip rows at the cut between
    engines. Supplier∘nation is a broadcast semi-join; one fact
    shuffle on l_partkey."""
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    val = F.col("l_quantity").cast("decimal(12,2)") * F.col("l_extendedprice").cast(
        "decimal(12,2)"
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("_val"))
    total = per_part.agg(F.sum("_val").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val") * F.lit(2500) > F.col("_total"))
        .select("l_partkey", F.col("_val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE_IMPORTANT_PART_VALUES = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  )
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val * 2500 > (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, l_partkey
"""


def shipping_delay_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted (the testdata has no l_shipmode): the
    shipmode axis becomes a derived delay class (>=60 days order→ship
    = SLOW), counting high- vs low-priority lines per class — the
    two-way conditional count over a joined year of shipments. Orders
    join is a shuffle pair on the order key; the CASE counts are
    map-side partial."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    mode = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 60, "SLOW"
    ).otherwise("FAST")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(mode.alias("delay_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_count"),
        )
        .orderBy("delay_mode")
    )


ORACLE_SHIPPING_DELAY_MODES = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 60
            THEN 'SLOW' ELSE 'FAST' END AS delay_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_priority_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY delay_mode
"""


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    supplier count per (brand, type, size) for a size list, excluding
    one brand/type and any supplier with a negative balance (the
    'complaints' NOT IN, de-correlated to a broadcast anti-join —
    s_suppkey is non-null so anti-join ≡ NOT IN). The distinct-count
    shuffles once on the group key after a map-side distinct."""
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_PART_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in a nation group who shipped more
    than a threshold quantity of any 'small%' part in a year — the
    nested-IN chain (supplier IN (… part IN (…))) de-correlated to
    aggregates + semi-joins. Part filter is a broadcast semi-join
    into the (supp, part) quantity aggregate; the surviving supplier
    keys (tiny) broadcast-semi-join into the supplier dim. Quantity
    threshold compares in exact decimal."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    smallp = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    pq = (
        li.join(F.broadcast(smallp), li.l_partkey == smallp.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 20)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_8", "NATION_12", "NATION_15", "NATION_20"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(pq), s.s_suppkey == pq.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_EXCESS_STOCK_SUPPLIERS = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_8', 'NATION_12', 'NATION_15', 'NATION_20')
  AND s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
    ) WHERE qty > 20
  )
ORDER BY s_name
"""


QUERIES = {
    "priority_late_orders": priority_late_orders,
    "market_share": market_share,
    "product_profit": product_profit,
    "returned_item_customers": returned_item_customers,
    "promo_revenue_share": promo_revenue_share,
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
    "shipping_priority": shipping_priority,
    "forecast_revenue_change": forecast_revenue_change,
    "important_part_values": important_part_values,
    "shipping_delay_modes": shipping_delay_modes,
    "part_supplier_counts": part_supplier_counts,
    "excess_stock_suppliers": excess_stock_suppliers,
}

ORACLES = {
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "forecast_revenue_change": ORACLE_FORECAST_REVENUE_CHANGE,
    "important_part_values": ORACLE_IMPORTANT_PART_VALUES,
    "shipping_delay_modes": ORACLE_SHIPPING_DELAY_MODES,
    "part_supplier_counts": ORACLE_PART_SUPPLIER_COUNTS,
    "excess_stock_suppliers": ORACLE_EXCESS_STOCK_SUPPLIERS,
    "priority_late_orders": ORACLE_PRIORITY_LATE_ORDERS,
    "market_share": ORACLE_MARKET_SHARE,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "returned_item_customers": ORACLE_RETURNED_ITEM_CUSTOMERS,
    "promo_revenue_share": ORACLE_PROMO_REVENUE_SHARE,
    "disjunctive_part_revenue": ORACLE_DISJUNCTIVE_PART_REVENUE,
    "cheapest_supplier_per_part": ORACLE_CHEAPEST_SUPPLIER_PER_PART,
}
