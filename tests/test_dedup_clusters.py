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


def test_star_contraction_matches_minlabel_and_union_find(spark):
    """VERDICT r05 task 2: the default star-contraction algorithm
    must label identically to the min-label twin and a driver-side
    union-find across adversarial shapes (chain + triangle + pair,
    merged rings, random graphs with planted chains)."""
    import random

    from fin_trade_craft_spark.operators.dedup import (
        connected_components_minlabel,
        connected_components_star,
    )

    rng = random.Random(7)
    fixtures = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        [(9, 5), (7, 9), (5, 3)],
        # two rings merged by one bridge edge
        [(i, i + 1) for i in range(40, 46)] + [(45, 40)]
        + [(i, i + 1) for i in range(50, 56)] + [(55, 50)] + [(43, 53)],
    ]
    for _ in range(2):
        edges = {tuple(sorted(rng.sample(range(100, 160), 2))) for _ in range(40)}
        chain = rng.sample(range(200, 260), 15)
        edges |= {tuple(sorted(p)) for p in zip(chain, chain[1:])}
        fixtures.append(sorted(edges))
    for fx in fixtures:
        pairs = spark.createDataFrame(fx, "d1 long, d2 long")
        star = {r.doc_id: r.cluster_id for r in connected_components_star(pairs).collect()}
        mini = {
            r.doc_id: r.cluster_id for r in connected_components_minlabel(pairs).collect()
        }
        want = _union_find_clusters(fx)
        assert star == mini == want


def test_star_contraction_chain_round_count_logarithmic(spark):
    """A planted 500-node chain: min-label needs 499 rounds (it
    would silently return unconverged labels at the default cap);
    star contraction must converge in <= 2*ceil(log2(n)) = 18 rounds
    AND produce the correct single-cluster labeling."""
    import math

    from fin_trade_craft_spark.operators.dedup import connected_components_star

    n = 500
    # shuffled ids so chain position is uncorrelated with node id
    import random

    ids = list(range(1000, 1000 + n))
    random.Random(3).shuffle(ids)
    pairs = spark.createDataFrame(
        [(a, b) for a, b in zip(ids, ids[1:])], "d1 long, d2 long"
    )
    stats = {}
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components_star(pairs, stats=stats).collect()
    }
    root = min(ids)
    assert got == {i: root for i in ids}
    bound = 2 * math.ceil(math.log2(n))
    assert stats["rounds"] <= bound, f"star took {stats['rounds']} rounds > {bound}"


def test_star_contraction_self_pairs_and_exhaustion(spark):
    """Review findings r06: (a) nodes whose only edges are
    self-pairs must label as singletons, matching the minlabel twin;
    (b) exhausting max_iters before the forest flattens must RAISE,
    never return the (corrupt at non-fixed-point) children+roots
    union."""
    import pytest

    from fin_trade_craft_spark.operators.dedup import (
        connected_components_minlabel,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 3), (9, 9), (3, 3)], "d1 long, d2 long"
    )
    star = {r.doc_id: r.cluster_id for r in connected_components_star(pairs).collect()}
    mini = {
        r.doc_id: r.cluster_id for r in connected_components_minlabel(pairs).collect()
    }
    assert star == mini == {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], "d1 long, d2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, max_iters=1).collect()


def test_star_multi_parent_flat_regression(spark):
    """ADVICE r06 (high): pairs (5,3),(6,5),(6,1),(3,2) flatten
    after one large+small round to {(3,1),(3,2),(5,2),(6,1)} — flat
    (no dst is a src) but NOT a star forest (node 3 keeps two
    parents). A flatness-only convergence probe declared this
    converged and emitted doc 3 under BOTH cluster 1 and cluster 2,
    splitting the single component into {1,3,6} and {2,3,5}. The
    fixed-point test must also require out-degree 1 per src, so the
    loop keeps contracting to the true single-star fixed point."""
    from fin_trade_craft_spark.operators.dedup import (
        connected_components_minlabel,
        connected_components_star,
    )

    fx = [(5, 3), (6, 5), (6, 1), (3, 2)]
    pairs = spark.createDataFrame(fx, "d1 long, d2 long")
    star_rows = connected_components_star(pairs).collect()
    # exactly one label row per node — no duplicate conflicting rows
    assert len(star_rows) == len({r.doc_id for r in star_rows}) == 5
    star = {r.doc_id: r.cluster_id for r in star_rows}
    mini = {
        r.doc_id: r.cluster_id for r in connected_components_minlabel(pairs).collect()
    }
    want = _union_find_clusters(fx)
    assert star == mini == want == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1}


def test_star_max_iters_zero_rejected(spark):
    """ADVICE r06 (low): max_iters=0 used to skip the
    non-convergence guard entirely (rounds stayed 0) and label the
    raw unconverged edge set. It must raise up front now."""
    import pytest

    from fin_trade_craft_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
    with pytest.raises(ValueError, match="max_iters >= 1"):
        connected_components_star(pairs, max_iters=0)
