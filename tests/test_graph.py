"""Differential tests: graph-analytics queries vs their DuckDB
oracles at sf0.001, plus a hand-checkable planted-triangle case."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import graph  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(graph.QUERIES))
def test_graph_vs_oracle(spark, duck, name):
    sdf = graph.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(graph.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_triangle_count_planted(spark, tmp_path):
    """Planted lineitem graph: parts {1,2,3} pairwise co-ordered in
    2 orders each (one triangle), part 4 attached to 1 and 2 by
    only ONE co-order (edges thinned away by the ≥2 threshold).
    Expect exactly: 3 nodes, 3 edges, 1 triangle, clustering 1.0."""
    rows = []
    # orders 100/101: contain parts 1,2,3 -> all three pairs twice
    for ok_ in (100, 101):
        for pk in (1, 2, 3):
            rows.append((ok_, pk))
    # order 102: parts 1,2,4 -> pairs (1,4),(2,4) once; (1,2) a 3rd time
    for pk in (1, 2, 4):
        rows.append((102, pk))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = graph.graph_triangle_stats(spark, str(tmp_path)).collect()[0]
    assert (got.n_nodes, got.n_edges, got.n_triangles) == (3, 3, 1)
    assert got.avg_degree == 2.0
    assert got.clustering_coeff == 1.0


def test_pagerank_mass_and_symmetry(spark, tmp_path):
    """On the planted symmetric triangle: total PageRank mass is
    conserved (no dangling nodes) and symmetric nodes score equal
    1/3 exactly at every iteration."""
    rows = []
    for ok_ in (100, 101):
        for pk in (1, 2, 3):
            rows.append((ok_, pk))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = graph.pagerank_copurchase(spark, str(tmp_path)).collect()
    prs = {r.p: r.pagerank for r in got}
    assert set(prs) == {1, 2, 3}
    assert abs(sum(prs.values()) - 1.0) < 1e-9
    assert len({round(v, 12) for v in prs.values()}) == 1
