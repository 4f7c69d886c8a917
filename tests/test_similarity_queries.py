"""Differential tests: embedding-similarity queries vs their DuckDB
oracles at sf0.001 (mirrors test_relational.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import similarity  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

ORACLED = sorted(set(similarity.QUERIES) & set(similarity.ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_similarity_vs_oracle(spark, duck, name):
    sdf = similarity.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(similarity.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_ann_recall_bounds(spark):
    pdf = similarity.QUERIES["ann_recall"](spark, SF_SMOKE).toPandas()
    assert (pdf["k"] == 5).all()
    assert ((pdf["recall_at_k"] >= 0) & (pdf["recall_at_k"] <= 1)).all()
    assert (pdf["n_hits"] <= pdf["k"]).all()


def test_knn_numpy_matches_exact_path(spark):
    """The throughput (numpy matmul) kNN must return the same
    neighbor sets as the exact decimal path, with scores equal to
    float tolerance (bit-equality is exactly what it trades away)."""
    import pandas as pd

    from fin_trade_craft_spark.operators.similarity import (
        knn_bruteforce,
        knn_bruteforce_numpy,
    )
    from fin_trade_craft_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(emb.vec_id < 10)
    exact = knn_bruteforce(emb, q, k=5).toPandas()
    fast = knn_bruteforce_numpy(emb, q, k=5).toPandas()
    key = ["qid", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    fast = fast.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        exact[["qid", "rank", "nid"]], fast[["qid", "rank", "nid"]]
    )
    assert (exact["cos_sim"] - fast["cos_sim"]).abs().max() < 1e-9


def test_srp_band_width_adapts():
    """Width floors at 8 through every local fixture (historical
    4x8/32-bit layout preserved bit-for-bit) and grows with the
    corpus so expected bucket populations stay ~constant."""
    from fin_trade_craft_spark.queries.similarity import srp_band_width

    assert srp_band_width(0) == 8
    assert srp_band_width(500) == 8     # sf0.001 / sf0.01
    assert srp_band_width(2000) == 8    # sf0.1
    assert srp_band_width(20_000) == 11  # sf1 replica
    assert srp_band_width(2_000_000) == 17
    # exact power-of-two boundary is deterministic (IEEE log2 exact)
    assert srp_band_width(16 * 2**10) == 10
    assert srp_band_width(16 * 2**10 + 1) == 11


def test_sq8_rerank_recall_vs_exact(spark):
    """The quantized candidate tier must not lose real neighbors:
    recall@5 of sq8_rerank_search vs the exact brute-force top-5
    must be ≥0.8 (int8 error is ~1e-2 on unit-ish vectors — far
    below typical neighbor gaps; M=20 absorbs boundary swaps)."""
    from fin_trade_craft_spark.queries.similarity import (
        knn_bruteforce,
        sq8_rerank_search,
    )

    exact = knn_bruteforce(spark, SF_SMOKE).toPandas()
    sq8 = sq8_rerank_search(spark, SF_SMOKE).toPandas()
    hits = tot = 0
    for qid, grp in exact.groupby("qid"):
        truth = set(grp["nid"])
        got = set(sq8[sq8["qid"] == qid]["nid"])
        hits += len(truth & got)
        tot += len(truth)
    assert tot > 0
    assert hits / tot >= 0.8, f"recall@5 {hits/tot:.2f}"
