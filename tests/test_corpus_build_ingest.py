"""corpus_build_ingest: the incremental capstone's hash-proof (r08
verdict task 2) — on a planted append-shaped corpus (batch ids all
greater than existing ids, no cross-batch component bridges), the
batch manifest produced incrementally must EQUAL the from-scratch
``corpus_build`` rebuild restricted to the batch, and the existing
corpus's own manifest must be untouched by the append (keep
decisions and shard ids stable; only the mixture re-balances, by
design). Also pins the first-wins-within-batch contract and the
no-embedding / NULL-text pass-throughs."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pytest

from fin_trade_craft_spark.queries.corpus_build import (
    corpus_build,
    corpus_build_ingest,
    corpus_build_ingest_stored,
)

K_A = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "curious researchers measure overlapping shingle statistics "
    "across widely varied corpus segments"
)
K_B = (
    "market analysts reviewed quarterly earnings reports before "
    "publishing detailed sector commentary covering energy and "
    "transport infrastructure companies worldwide"
)
K_C = (
    "gardeners planted resilient heirloom tomatoes alongside basil "
    "and marigold rows expecting an unusually warm growing season "
    "with intermittent coastal rainfall"
)
K_D = (
    "astronomers catalogued distant variable stars using automated "
    "telescope arrays while graduate students verified periodicity "
    "models against archival photographic plates"
)
K_E = (
    "die wanderer folgten dem schmalen pfad durch alpine wiesen "
    "waehrend ferne glocken das fruehe morgenlicht begleiteten und "
    "nebelschwaden langsam aus dem talkessel stiegen"
)
K_F = (
    "municipal engineers inspected ageing canal locks throughout the "
    "northern delta while survey teams recorded sediment depth and "
    "flow variance for the winter maintenance plan"
)
K_G = (
    "archivists digitised brittle manuscript folios under controlled "
    "humidity while volunteers transcribed marginal annotations into "
    "a searchable provenance database spanning four centuries"
)


def _write(dirpath, docs, embs):
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    pdf.to_parquet(Path(dirpath) / "documents.parquet", index=False)
    epdf = pd.DataFrame(
        {
            "vec_id": [e[0] for e in embs],
            "embedding": [e[1] for e in embs],
            "label": np.zeros(len(embs), dtype="int32"),
        }
    )
    epdf.to_parquet(Path(dirpath) / "embeddings.parquet", index=False)


@pytest.fixture(scope="module")
def ingest_dirs(tmp_path_factory):
    """`full`: existing corpus (even ids 0..12) + batch (odd ids
    101..117, all greater — the production append shape). `prior`:
    the existing corpus alone. Plants one of every batch keep_reason
    against BOTH an existing doc and an earlier batch doc."""
    # ± standard-basis vectors: pairwise cosine is 0 or −1 for
    # DISTINCT vectors (never ≥ θ), so only the PLANTED identical
    # pairs can be semantic dups regardless of cell layout — random
    # 8-dim vectors can exceed θ = 0.40 by chance
    it = iter(
        [s * np.eye(8, dtype="float32")[i] for i in range(8) for s in (1.0, -1.0)]
    )

    def vec():
        return next(it).tolist()

    v10 = vec()
    existing = [
        (0, K_A, "en", "web"),
        (2, K_B, "en", "books"),
        (4, K_C + " alpha", "en", "web"),
        (6, K_C + " omega", "en", "web"),  # near dup of 4 → dropped in prior
        (8, "spam spam", "en", "web"),  # low quality in prior
        (10, K_D, "en", "books"),  # semantic anchor (v10)
        (12, K_E, "de", "books"),
    ]
    batch = [
        (101, K_A, "en", "web"),  # exact dup of existing 0
        (103, K_B + " delta", "en", "books"),  # near dup of existing 2
        (105, K_F, "en", "web"),  # semantic dup of existing 10 (v10)
        (107, "ham ham", "en", "web"),  # low quality
        (109, K_G, "en", "books"),  # keeper (own embedding)
        (111, K_G, "en", "books"),  # exact dup of earlier batch 109
        (113, K_G + " zeta", "en", "books"),  # near dup of earlier batch 109
        (
            115,
            "der alte uhrmacher justierte winzige zahnraeder unter der "
            "lupe waehrend draussen der fruehe marktlaerm durch die "
            "engen gassen der altstadt hallte",
            "de",
            "books",
        ),  # keeper, NO embedding
        (117, None, "en", "web"),  # NULL text → kept
    ]
    emb_existing = [(i, vec()) for i in (0, 2, 4, 6, 8)] + [(10, v10), (12, vec())]
    emb_batch = [(101, vec()), (103, vec()), (105, v10), (107, vec()), (109, vec()),
                 (111, vec()), (113, vec())]
    full = tmp_path_factory.mktemp("cbi_full")
    prior = tmp_path_factory.mktemp("cbi_prior")
    _write(full, existing + batch, emb_existing + emb_batch)
    _write(prior, existing, emb_existing)
    return str(full), str(prior)


def test_ingest_batch_reasons_and_first_wins(spark, ingest_dirs):
    full, _ = ingest_dirs
    rows = {r["doc_id"]: r for r in corpus_build_ingest(spark, full).collect()}
    assert set(rows) == {101, 103, 105, 107, 109, 111, 113, 115, 117}
    assert rows[101]["keep_reason"] == "exact_dup"  # vs existing
    assert rows[103]["keep_reason"] == "near_dup"  # vs existing survivor
    assert rows[105]["keep_reason"] == "semantic_dup"  # vs existing rep
    assert rows[107]["keep_reason"] == "low_quality"
    assert rows[109]["keep_reason"] == "kept"
    assert rows[111]["keep_reason"] == "exact_dup"  # first-wins in batch
    assert rows[113]["keep_reason"] == "near_dup"  # vs earlier batch doc
    assert rows[115]["keep_reason"] == "kept"  # no embedding → passes sem
    assert rows[117]["keep_reason"] == "kept"  # NULL text
    for r in rows.values():
        assert r["kept"] == (r["keep_reason"] == "kept")
        if r["kept"]:
            assert r["mix_weight"] is not None and r["shard_id"] is not None
        else:
            assert r["mix_weight"] is None and r["shard_id"] is None


def test_ingest_equals_from_scratch_rebuild_on_batch(spark, ingest_dirs):
    """THE hash-proof: incremental batch manifest ≡ from-scratch
    ``corpus_build`` over the combined corpus, restricted to the
    batch — every column including the combined mixture weight and
    the appended shard id (valid because batch ids are all greater
    than existing ids, so the rebuild's min-id canonicals and
    per-lang doc_id packing order coincide with append semantics)."""
    full, _ = ingest_dirs
    inc = {r["doc_id"]: r for r in corpus_build_ingest(spark, full).collect()}
    reb = {
        r["doc_id"]: r
        for r in corpus_build(spark, full).collect()
        if r["doc_id"] % 2 == 1
    }
    assert set(inc) == set(reb)
    for did in inc:
        a, b = inc[did], reb[did]
        assert a["keep_reason"] == b["keep_reason"], did
        assert a["kept"] == b["kept"], did
        assert a["n_tokens"] == b["n_tokens"], did
        assert a["shard_id"] == b["shard_id"], did
        if a["mix_weight"] is None:
            assert b["mix_weight"] is None, did
        else:
            assert abs(a["mix_weight"] - b["mix_weight"]) < 1e-12, did


def test_stored_index_ingest_byte_equal_manifest(spark, ingest_dirs):
    """r09 verdict task 1: the PRODUCTION refresh shape — prior
    ladder read from the TableIO-published index tables
    (kept_manifest / hash_index / sig_index / cell_index /
    codebook) — must produce a manifest BYTE-EQUAL to the
    session-memo twin, every column including the float
    mix_weight (same exact arithmetic on both paths). Also proves
    the write side actually committed the five tables."""
    import os

    from fin_trade_craft_spark.queries.corpus_build import _index_store

    full, _ = ingest_dirs
    memo = corpus_build_ingest(spark, full).toPandas()
    stored = corpus_build_ingest_stored(spark, full).toPandas()
    pd.testing.assert_frame_equal(memo, stored, check_exact=True)

    io = _index_store(spark, full)
    for t in ("kept_manifest", "hash_index", "sig_index", "cell_index", "codebook"):
        assert io.exists(t), f"index table {t} not published"
        assert os.path.isdir(io.path(t)), t
    # the codebook consumers load is the SAME centroids the trainer
    # memoized — k·dims rows of exact 1e-6 integers
    cb = io.read("codebook").toPandas()
    assert set(cb.columns) == {"cid", "i", "cv"} and len(cb) > 0


def test_stored_index_ingest_matches_on_testdata(spark):
    """Byte-equality on the real sf0.001 fixture corpus too — the
    planted fixture exercises every reason path, this one exercises
    fixture-scale cell layouts and multi-source mixtures."""
    sf = "/root/testdata/sf0.001"
    memo = corpus_build_ingest(spark, sf).toPandas()
    stored = corpus_build_ingest_stored(spark, sf).toPandas()
    pd.testing.assert_frame_equal(memo, stored, check_exact=True)


def test_sequential_committed_refreshes_match_one_shot(spark, ingest_dirs):
    """The production refresh LOOP (r10): publish the index tables
    once, then run TWO id-ordered batches through the stored-index
    ladder, COMMITTING each (appending its partner rows to
    hash/sig/cell stores and its kept rows to the manifest) so batch
    2 probes batch 1 through the same parquet tables it probes the
    original corpus through. Keep decisions across the two committed
    steps must equal the one-shot stored ingest over the
    concatenated batch — the same cross-batch equivalence
    streaming_corpus_ingest proves for its micro-batches, here for
    the batch TableIO path."""
    import tempfile

    from pyspark.sql import functions as F

    from fin_trade_craft_spark.queries.corpus_build import (
        _stored_ingest_ladder,
        commit_ingest_batch,
        publish_corpus_index_tables,
    )
    from fin_trade_craft_spark.sources.catalog import load_table
    from fin_trade_craft_spark.sources.io import TableIO

    full, _ = ingest_dirs
    io = TableIO(spark, tempfile.mkdtemp(prefix="seq_refresh_"))
    publish_corpus_index_tables(spark, full, io)

    docs = load_table(spark, full, "documents")
    embs = load_table(spark, full, "embeddings")
    odd_doc = F.col("doc_id") % 2 == 1
    odd_vec = F.col("vec_id") % 2 == 1

    def reasons(lad):
        out = {}
        for key, reason in (
            ("exact_drop", "exact_dup"),
            ("near_drop", "near_dup"),
            ("sem_drop", "semantic_dup"),
            ("low_drop", "low_quality"),
            ("kept", "kept"),
        ):
            for r in lad[key].select("doc_id").collect():
                assert r["doc_id"] not in out, "stage reasons not disjoint"
                out[r["doc_id"]] = reason
        return out

    seq = {}
    for lo, hi in ((101, 110), (110, 200)):  # id-ordered batches
        cond_d = odd_doc & (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        cond_v = odd_vec & (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        lad = _stored_ingest_ladder(spark, io, docs.filter(cond_d), embs.filter(cond_v))
        seq.update(reasons(lad))
        commit_ingest_batch(io, lad)

    one_shot = {
        r["doc_id"]: r["keep_reason"]
        for r in corpus_build_ingest_stored(spark, full).collect()
    }
    assert seq == one_shot
    # the committed manifest now holds existing + both batches' kept
    # rows — the base masses the NEXT refresh's stages 5/6 read
    committed_kept = {
        r["doc_id"] for r in io.read("kept_manifest").select("doc_id").collect()
    }
    expect_kept = {d for d, why in one_shot.items() if why == "kept"} | {
        r["doc_id"]
        for r in corpus_build(spark, full).collect()
        if r["doc_id"] % 2 == 0 and r["kept"]
    }
    assert committed_kept == expect_kept


def test_append_leaves_existing_manifest_stable(spark, ingest_dirs):
    """The existing corpus's keep decisions and shard ids must be
    identical whether the batch exists or not (the append never
    re-clusters or repacks history); only mix_weight re-balances."""
    full, prior = ingest_dirs
    before = {r["doc_id"]: r for r in corpus_build(spark, prior).collect()}
    after = {
        r["doc_id"]: r
        for r in corpus_build(spark, full).collect()
        if r["doc_id"] % 2 == 0
    }
    assert set(before) == set(after)
    for did in before:
        assert before[did]["keep_reason"] == after[did]["keep_reason"], did
        assert before[did]["shard_id"] == after[did]["shard_id"], did
