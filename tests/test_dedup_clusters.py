"""Connected-components clustering over near-dup pair graphs."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.operators.dedup import connected_components  # noqa: E402


def test_connected_components_chain_triangle_pair(spark):
    """A 4-node chain (diameter 3 — needs multiple propagation
    rounds), a triangle, and an isolated pair must resolve to three
    clusters labeled by their min node id."""
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
            (10, 11), (11, 12), (10, 12),    # triangle
            (20, 21),                        # pair
        ],
        "d1 long, d2 long",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_order_independent(spark):
    """Edge direction/order must not matter: reversed edges give the
    same clustering."""
    fwd = spark.createDataFrame([(5, 9), (9, 7), (3, 5)], "d1 long, d2 long")
    rev = spark.createDataFrame([(9, 5), (7, 9), (5, 3)], "d1 long, d2 long")
    a = {r.doc_id: r.cluster_id for r in connected_components(fwd).collect()}
    b = {r.doc_id: r.cluster_id for r in connected_components(rev).collect()}
    assert a == b == {3: 3, 5: 3, 7: 3, 9: 3}


def _union_find_clusters(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in list(parent):
        r = find(n)
        out[n] = min(out.get(n, r), r)
    # normalize: cluster id = min node in component
    comp = {}
    for n, r in out.items():
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for r, ns in comp.items() for n in ns}


def test_connected_components_random_graphs_match_union_find(spark):
    """Randomized differential vs a driver-side union-find on a
    batch of adversarial shapes (long chains, stars, merged rings)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 30
        edges = set()
        # long chain to force multiple propagation rounds
        chain = rng.sample(range(100, 200), 12)
        edges |= {tuple(sorted(p)) for p in zip(chain, chain[1:])}
        # random extra edges
        for _ in range(n):
            a, b = rng.sample(range(100, 200), 2)
            edges.add(tuple(sorted((a, b))))
        pairs = spark.createDataFrame(sorted(edges), "d1 long, d2 long")
        got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
        want = _union_find_clusters(sorted(edges))
        assert got == want, f"trial {trial}: {got} != {want}"
