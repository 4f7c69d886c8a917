"""corpus_build capstone: the dedup/quality ladder composes with the
survivor restriction threaded through — a planted corpus exercises
every keep_reason (the sf fixtures have no exact dups, so the
exact-dup path is only reachable with planted data) and pins the
stage-precedence rule (a doc is judged by its FIRST failing stage).
The composed value oracle runs in the driver gate; these tests cover
the semantics the oracle can't distinguish (precedence, id-space
pass-through)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMOKE

from fin_trade_craft_spark.queries.corpus_build import CB_QUALITY_MIN, corpus_build


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A corpus with one of everything: an exact dup pair, a near-dup
    pair (one token changed), a semantic-dup pair (identical
    embeddings), a low-quality doc (two tokens), and plain keepers.
    Embeddings share the doc id space; doc 99 has NO embedding and
    must pass through the semantic stage untouched."""
    d = tmp_path_factory.mktemp("cbdata")
    t_exact = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "curious researchers measure overlapping shingle statistics "
        "across widely varied corpus segments"
    )
    t_near = (
        "market analysts reviewed quarterly earnings reports before "
        "publishing detailed sector commentary covering energy and "
        "transport infrastructure companies worldwide"
    )
    t_sem_a = (
        "gardeners planted resilient heirloom tomatoes alongside basil "
        "and marigold rows expecting an unusually warm growing season "
        "with intermittent coastal rainfall"
    )
    t_sem_b = (
        "astronomers catalogued distant variable stars using automated "
        "telescope arrays while graduate students verified periodicity "
        "models against archival photographic plates"
    )
    t_keep = (
        "die wanderer folgten dem schmalen pfad durch alpine wiesen "
        "waehrend ferne glocken das fruehe morgenlicht begleiteten und "
        "nebelschwaden langsam aus dem talkessel stiegen"
    )
    docs = [
        # 0/1: exact dups (identical text) — 1 must drop as exact_dup
        (0, t_exact, "en", "web"),
        (1, t_exact, "en", "web"),
        # 2/3: near dups (one trailing token differs) — 3 drops near_dup
        (2, t_near + " alpha", "en", "web"),
        (3, t_near + " omega", "en", "web"),
        # 4/5: lexically unrelated, semantically identical embeddings
        # — 5 drops semantic_dup
        (4, t_sem_a, "en", "books"),
        (5, t_sem_b, "en", "books"),
        # 6: low quality (tiny, repetitive)
        (6, "spam spam", "en", "web"),
        # 99: keeper with NO embedding row
        (99, t_keep, "de", "books"),
        # 100: NULL text — quality is NULL, which must NOT make the
        # row vanish from the manifest (kept: no stage dropped it)
        (100, None, "en", "web"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    pdf.to_parquet(d / "documents.parquet", index=False)

    rng = np.random.RandomState(7)
    embs = []
    for i in (0, 1, 2, 3, 4, 5, 6):
        v = rng.randn(8)
        embs.append((i, (v / np.linalg.norm(v)).astype("float32")))
    # 4 and 5 identical → cosine 1.0 ≥ θ regardless of cell layout
    embs[5] = (5, embs[4][1])
    epdf = pd.DataFrame(
        {
            "vec_id": [e[0] for e in embs],
            "embedding": [e[1].tolist() for e in embs],
            # the driver's table carries a label column — match the
            # schema contract the loaders expect
            "label": np.zeros(len(embs), dtype="int32"),
        }
    )
    epdf.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_corpus_build_all_reasons_and_precedence(spark, planted_dir):
    rows = {r["doc_id"]: r for r in corpus_build(spark, planted_dir).collect()}
    assert len(rows) == 9  # one manifest row per input doc
    # NULL text → NULL quality: fails no drop stage, so it stays in
    # the manifest as kept (the symmetric quality>=min filter used
    # to lose the row entirely — r8 review finding)
    assert rows[100]["keep_reason"] == "kept" and rows[100]["kept"] is True
    assert rows[100]["n_tokens"] is None
    assert rows[0]["keep_reason"] == "kept"
    assert rows[1]["keep_reason"] == "exact_dup"  # min-id kept
    assert rows[2]["keep_reason"] == "kept"
    assert rows[3]["keep_reason"] == "near_dup"
    assert rows[4]["keep_reason"] == "kept"
    assert rows[5]["keep_reason"] == "semantic_dup"
    assert rows[6]["keep_reason"] == "low_quality"
    assert rows[99]["keep_reason"] == "kept"  # no embedding → passes through
    for i, r in rows.items():
        assert r["kept"] == (r["keep_reason"] == "kept")
        if r["kept"]:
            assert r["mix_weight"] is not None and r["shard_id"] is not None
        else:
            assert r["mix_weight"] is None and r["shard_id"] is None
    # mixture weights normalize to 1 over sources (one weight per source)
    src_w = {r["source"]: r["mix_weight"] for r in rows.values() if r["kept"]}
    assert abs(sum(src_w.values()) - 1.0) < 1e-12
    # packing: first doc of each language starts in shard 0
    assert rows[0]["shard_id"] == 0 and rows[99]["shard_id"] == 0


def test_corpus_build_survivor_restriction(spark, planted_dir):
    """Precedence is structural, not cosmetic: doc 1 (exact dup of 0)
    is ALSO a near dup of 0 and semantically identical to itself —
    it must be reported exact_dup only, and its removal must not
    drag doc 0 out (0 stays kept even though it collided with 1 in
    every stage's pair space)."""
    rows = {r["doc_id"]: r for r in corpus_build(spark, planted_dir).collect()}
    assert rows[1]["keep_reason"] == "exact_dup"
    assert rows[0]["kept"] is True


def test_corpus_build_covers_fixture_and_reasons_disjoint(spark):
    """On the driver fixture: full coverage (one row per doc), the
    kept set non-trivial, and the quality gate actually binding."""
    out = corpus_build(spark, SF_SMOKE).collect()
    from fin_trade_craft_spark.sources.catalog import table_row_count

    assert len(out) == table_row_count(SF_SMOKE, "documents")
    reasons = {r["keep_reason"] for r in out}
    assert "kept" in reasons
    kept = [r for r in out if r["kept"]]
    assert 0 < len(kept) < len(out)
    for r in out:
        if not r["kept"]:
            assert r["keep_reason"] in {"exact_dup", "near_dup", "semantic_dup", "low_quality"}
