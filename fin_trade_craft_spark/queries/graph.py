"""Graph analytics over a co-purchase graph derived from the star
schema — the second graph family next to the near-dup
connected-components operator (operators/dedup.py): build an edge
list (parts co-ordered in ≥2 distinct orders), then count triangles
and report global graph statistics.

Scale notes: the pair generation is bounded per order (an order has
≤7 lineitems → ≤21 pairs), so the explode is linear in lineitems,
never quadratic in parts. Edges are stored once, oriented
``p1 < p2`` — triangle counting is the classic oriented wedge join
(e(a,b) ⋈ e(b,c) on the middle node, semi-join the closing edge
e(a,c)); orientation makes every triangle counted exactly once and
caps the wedge fan-out. At 100 TB you'd orient by DEGREE instead of
id (node-iterator++ — the standard skew fix when hub nodes exist);
id orientation is kept here because it is value-oracle-exact and the
co-order threshold already thins hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

MIN_CO_ORDERS = 2


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .select("l_orderkey", "p1", "p2")
        .distinct()
    )
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= MIN_CO_ORDERS)
        .select("p1", "p2")
    )


def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stats row: nodes, edges, triangles, average degree, and
    the global clustering coefficient (3·triangles / wedges)."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("p1").alias("p"))
        .unionByName(e.select(F.col("p2").alias("p")))
        .distinct()
    )
    # oriented wedges a<b<c: e(a,b) ⋈ e(b,c); close with e(a,c)
    e2 = e.select(F.col("p1").alias("q1"), F.col("p2").alias("q2"))
    wedges = e.join(e2, e.p2 == e2.q1).select(F.col("p1").alias("a"), F.col("q2").alias("c"))
    tri = wedges.join(
        e.select(F.col("p1").alias("a"), F.col("p2").alias("c")), ["a", "c"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionByName(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedge_total = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges")
    )
    counts = (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri)
        .crossJoin(wedge_total)
    )
    return counts.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        (F.lit(2.0) * F.col("n_edges") / F.col("n_nodes")).alias("avg_degree"),
        F.when(
            F.col("n_wedges") > 0, F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


ORACLE_GRAPH_TRIANGLE_STATS = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), edges AS (
  SELECT p1, p2 FROM pairs GROUP BY p1, p2 HAVING COUNT(*) >= {MIN_CO_ORDERS}
), nodes AS (
  SELECT DISTINCT p FROM (SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges)
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1 JOIN edges e2 ON e1.p2 = e2.p1
  WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.p1 = e1.p1 AND e3.p2 = e2.p2)
), deg AS (
  SELECT p, COUNT(*) AS d FROM (SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges)
  GROUP BY p
), wt AS (
  SELECT CAST(SUM(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) AS n_wedges FROM deg
)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       2.0 * (SELECT COUNT(*) FROM edges) / (SELECT COUNT(*) FROM nodes) AS avg_degree,
       CASE WHEN (SELECT n_wedges FROM wt) > 0
            THEN 3.0 * (SELECT n_triangles FROM tri) / (SELECT n_wedges FROM wt)
            ELSE 0.0 END AS clustering_coeff
"""

QUERIES = {"graph_triangle_stats": graph_triangle_stats}
ORACLES = {"graph_triangle_stats": ORACLE_GRAPH_TRIANGLE_STATS}
