"""Differential tests: every text-pipeline query vs its DuckDB
oracle at sf0.001 (mirrors test_relational.py; the sf0.01 run is
the driver's / tools/check_correctness.py's job)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import text  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(set(text.QUERIES) & set(text.ORACLES)))
def test_text_vs_oracle(spark, duck, name):
    sdf = text.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(text.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_quality_classifier_frozen_artifact(spark):
    """The registered filter applies a FROZEN artifact (r09: training
    moved to this harness so the filter is value-oracled). Pins:
    (a) re-training on the same fixture reproduces the frozen
    coefficients (LBFGS is deterministic given data + params — a
    drift here means the artifact rotted against its training data);
    (b) the frozen margin's keep decision agrees with the freshly
    trained model's p_good ≥ 0.5; (c) the margin ranks
    quality_score; (d) strong weak-label agreement; (e) coverage."""
    from fin_trade_craft_spark.queries.text import (
        QC_COEFS,
        QC_INTERCEPT,
        _train_quality_classifier,
        doc_quality_scores,
        quality_classifier_filter,
    )

    model, scored = _train_quality_classifier(spark, SF_SMOKE)
    assert abs(model.intercept - QC_INTERCEPT) < 1e-4
    for got, want in zip(model.coefficients, QC_COEFS):
        assert abs(got - want) < 1e-4
    pdf = quality_classifier_filter(spark, SF_SMOKE).toPandas()
    qs = doc_quality_scores(spark, SF_SMOKE).select("doc_id", "quality_score").toPandas()
    assert len(pdf) == len(qs) == pdf["doc_id"].nunique()
    tr = scored.select(
        "doc_id",
        scored["kept"].alias("kept_trained"),
        scored["p_good"].alias("p_good_trained"),
    ).toPandas()
    merged = pdf.merge(tr, on="doc_id").merge(qs, on="doc_id")
    agree_fresh = (merged["kept"] == merged["kept_trained"]).mean()
    assert agree_fresh >= 0.98, f"frozen vs fresh decisions: {agree_fresh:.2%}"
    agree = (merged["kept"] == merged["label_weak"]).mean()
    assert agree >= 0.9, f"classifier disagrees with weak label: {agree:.2%}"
    # the margin must rank quality: Spearman-ish via corr of ranks
    rho = merged["margin"].rank().corr(merged["quality_score"].rank())
    assert rho >= 0.7, f"margin does not rank quality_score (rho={rho:.2f})"
    # both classes present (non-degenerate threshold)
    assert 0.2 <= merged["label_weak"].mean() <= 0.8


def test_contamination_flags_subset():
    """The contaminated set must be exactly the docs whose frac
    crosses the threshold — the flag is derived, never free-floating."""
    import duckdb

    from fin_trade_craft_spark.queries.text import ORACLE_EVAL_CONTAMINATION

    con = duckdb.connect()
    from fin_trade_craft_spark.sources.catalog import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    df = con.execute(ORACLE_EVAL_CONTAMINATION).df()
    assert ((df["contamination_frac"] > 0.05) == df["is_contaminated"]).all()
    con.close()


def test_duplicate_spans_planted_extents(spark, tmp_path):
    """Planted corpus with known duplicated extents: a 16-token
    cross-doc copy must merge its 9 overlapping duplicated windows
    into ONE maximal span with the exact start/length in BOTH docs;
    an intra-doc 8-token repeat must yield two single-window spans;
    a fully-unique doc must not appear."""
    from fin_trade_craft_spark.queries.text import DUPSPAN_K, duplicate_spans

    assert DUPSPAN_K == 8, "planted extents below assume K=8"
    shared = [f"s{i}" for i in range(16)]          # the cross-doc copy
    d1 = [f"a{i}" for i in range(4)] + shared + [f"b{i}" for i in range(10)]
    d2 = [f"c{i}" for i in range(2)] + shared + [f"d{i}" for i in range(3)]
    rep = [f"x{i}" for i in range(8)]
    d3 = rep + [f"u{i}" for i in range(5)] + rep   # intra-doc repeat
    d4 = [f"z{i}" for i in range(30)]              # unique
    rows = [
        (1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3)), (4, " ".join(d4)),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_len, r.n_windows)
        for r in duplicate_spans(spark, str(tmp_path)).collect()
    )
    # d1: copy occupies positions 5..20 -> dup window starts 5..13
    # d2: copy occupies positions 3..18 -> dup window starts 3..11
    # d3: identical windows at 1 and 14, gap 13 > K -> two islands
    assert got == [
        (1, 5, 16, 9),
        (2, 3, 16, 9),
        (3, 1, 8, 1),
        (3, 14, 8, 1),
    ]


def _py_bpe(word_counts: dict, rounds: int):
    """Reference greedy BPE on a word-frequency dict — the textbook
    algorithm (count adjacent symbol pairs weighted by word
    frequency, merge the argmax non-overlapping left-to-right),
    used as the differential twin for ``bpe_rounds_on``."""
    merges = []
    words = {tuple(w): c for w, c in word_counts.items()}
    for r in range(1, rounds + 1):
        counts = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + c
        if not counts:
            break
        (s1, s2), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, s1, s2, s1 + s2, n))
        new_words = {}
        for syms, c in words.items():
            out = []
            for x in syms:
                if out and out[-1] == s1 and x == s2:
                    out[-1] = s1 + s2
                else:
                    out.append(x)
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def test_bpe_rounds_planted_merge_sequence(spark):
    """VERDICT r06 task 4: on a planted corpus the merge loop must
    recover the known merge sequence — pinned by hand AND
    differentially against the pure-Python reference BPE
    (including the overlap rule: 'aaaa' merges to two 'aa's,
    never three)."""
    docs = [
        (1, "low lower lowest low"),
        (2, "low lowest newer new"),
        (3, "aaaa aaaa newer"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [tuple(r) for r in text.bpe_rounds_on(df, rounds=4).collect()]
    # reference twin over the same whitespace tokenization
    wc = {}
    for _, t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _py_bpe(wc, 4)
    assert got == want
    # hand-pinned head: ('a','a') counts 3 overlapping slots per
    # 'aaaa' x 2 instances = 6, tying ('l','o') at 6 and winning
    # lexicographically; round 2 then takes ('l','o') because the
    # NON-overlapping merge left only ('aa','aa') x 2 in doc 3
    assert got[0] == (1, "a", "a", "aa", 6)
    assert got[1] == (2, "l", "o", "lo", 6)
    assert got[2] == (3, "lo", "w", "low", 6)


def test_bpe_merge_exhaustion_keeps_words(spark):
    """ADVICE r07: a round with NO mergeable pair must not wipe the
    word state. Corpus of two-char words: round 1 merges the argmax
    pair; by round 2 or 3 every surviving word is a single symbol —
    the r07 crossJoin shape emptied `words` permanently there (and
    bpe_apply_compression then returned zero rows); the left-join
    guard keeps every word with its syms unchanged."""
    docs = [(1, "ab ab ab cd"), (2, "ab cd cd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges, words, _ = text._bpe_loop(df, rounds=4)
    got = [tuple(r) for r in merges.collect()]
    # only 2 real merges exist ('ab' x4 then 'cd' x3); rounds 3-4
    # find nothing and must report nothing
    assert got == [(1, "a", "b", "ab", 4), (2, "c", "d", "cd", 3)]
    final = {r["tok"]: (tuple(r["syms"]), r["cnt"]) for r in words.collect()}
    # the word state SURVIVES the exhausted rounds, fully merged
    assert final == {"ab": (("ab",), 4), "cd": (("cd",), 3)}
    # differential: the python reference breaks-and-keeps identically
    assert got == _py_bpe({"ab": 4, "cd": 3}, 4)


def test_bpe_convergence_loop_equals_unrolled(spark):
    """VERDICT r07 task 7: the driver-iterated convergence trainer
    must produce the SAME merge table as the unrolled in-plan loop
    at the same round count (min_frequency=1 disables early stop),
    and with a min_frequency threshold it must stop exactly when
    the best pair count drops below it."""
    docs = [
        (1, "low lower lowest low"),
        (2, "low lowest newer new"),
        (3, "aaaa aaaa newer"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    unrolled = [tuple(r) for r in text.bpe_rounds_on(df, rounds=4).collect()]
    conv_table, conv_words = text.bpe_train_until_convergence(
        df, max_rounds=4, min_frequency=1
    )
    got = [tuple(r) for r in conv_table.orderBy("round").collect()]
    assert got == unrolled
    # threshold stop: min_frequency above round-3's best count (6)
    # stops after the rounds whose argmax still clears it
    wc = {}
    for _, t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref = _py_bpe(wc, 4)
    t5, w5 = text.bpe_train_until_convergence(df, max_rounds=4, min_frequency=5)
    got5 = [tuple(r) for r in t5.orderBy("round").collect()]
    assert got5 == ref[: len(got5)]
    assert all(m[4] >= 5 for m in got5)
    assert len(got5) < len(ref) or all(m[4] >= 5 for m in ref)
    # the final word state still covers every word type (break-and-keep)
    assert w5.count() == len(wc)


def test_corpus_is_bpe_delimiter_free(duck):
    """The bpe_merge_rounds oracle flattens symbol sequences with
    chr(30); guard the assumption that the test corpus never
    contains it."""
    n, = duck.execute(
        "SELECT COUNT(*) FROM documents WHERE contains(text, chr(30))"
    ).fetchone()
    assert n == 0


def test_bm25_planted_relevance_ndcg_mrr(spark):
    """VERDICT r06 task 7: retrieval-quality harness for the BM25
    scorer — planted corpus with hand-derivable ranking (equal doc
    lengths, strictly decreasing tf ⇒ BM25 order is tf-dominance
    order) and graded relevance, with nDCG@10 / MRR asserted
    against literals computed from the EXPECTED ranking. A scoring
    or rounding-policy change that reorders results moves the
    metric off the pin."""
    import math

    docs = [
        # q1 'apple banana': all length 8, tf strictly decreasing
        (1, "apple banana apple banana apple banana f1 f2"),
        (2, "apple banana apple banana f1 f2 f3 f4"),
        (3, "apple banana f1 f2 f3 f4 f5 f6"),
        (4, "apple f1 f2 f3 f4 f5 f6 f7"),
        (5, "f1 f2 f3 f4 f5 f6 f7 f8"),
        # q2 'cherry': doc 7 outranks doc 6 (tf 2 vs 1, same length)
        (6, "cherry g1 g2 g3 g4 g5 g6 g7"),
        (7, "cherry cherry g1 g2 g3 g4 g5 g6"),
    ]
    queries = {1: ["apple", "banana"], 2: ["cherry"]}
    # graded relevance: doc 5 is relevant-but-unretrievable (no
    # query terms) so ideal DCG strictly exceeds attainable DCG;
    # for q2 the grades disagree with tf order (doc 7 is spam)
    rel = {1: {1: 3, 2: 2, 3: 1, 5: 1}, 2: {6: 1, 7: 0}}
    expected_order = {1: [1, 2, 3, 4], 2: [7, 6]}

    from fin_trade_craft_spark.queries import text as TQ

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = TQ.bm25_on(df, queries).orderBy("qid", "rank").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r.doc_id)
    assert by_q == expected_order

    def dcg(gains):
        return sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(gains))

    def ndcg(qid, ranking):
        gains = [rel[qid].get(d, 0) for d in ranking[:10]]
        ideal = sorted(rel[qid].values(), reverse=True)[:10]
        return dcg(gains) / dcg(ideal)

    def mrr(qid, ranking):
        for i, d in enumerate(ranking):
            if rel[qid].get(d, 0) > 0:
                return 1.0 / (i + 1)
        return 0.0

    got_ndcg = sum(ndcg(q, by_q[q]) for q in queries) / len(queries)
    got_mrr = sum(mrr(q, by_q[q]) for q in queries) / len(queries)
    # pins computed by hand from expected_order:
    # q1 DCG = 7 + 3/log2(3) + 1/2 + 0, ideal adds 1/log2(5)
    q1 = (7 + 3 / math.log2(3) + 0.5) / (7 + 3 / math.log2(3) + 0.5 + 1 / math.log2(5))
    # q2: the only relevant doc sits at rank 2; ideal has it at 1
    q2 = (1 / math.log2(3)) / 1.0
    assert abs(got_ndcg - (q1 + q2) / 2) < 1e-12
    assert abs(got_mrr - 0.75) < 1e-12


def test_fuzzy_title_matches_pigeonhole_differential(spark, tmp_path):
    """Adversarial differential for the r12 pigeonhole band rework:
    random titles plus mutated variants (substitutions AND indels up
    to edit distance 4, at every region of the string — including
    edits that SHIFT later segments, the case the ±3 probe window
    exists for), short titles for the fallback tier, and exact clones
    for the same-title path. The query must equal a brute-force
    blocked-Levenshtein reference exactly."""
    import itertools
    import random

    from fin_trade_craft_spark.queries.text import (
        FUZZY_BLOCK_LEN,
        FUZZY_MAX_EDITS,
        FUZZY_TITLE_LEN,
        fuzzy_title_matches,
    )

    rng = random.Random(1207)
    alpha = "abcdefghij"

    def rand_title(n=FUZZY_TITLE_LEN):
        return "".join(rng.choice(alpha) for _ in range(n))

    def mutate(s, n_edits):
        s = list(s)
        for _ in range(n_edits):
            op = rng.choice(("sub", "ins", "del"))
            # never touch the block prefix: blocked semantics exclude
            # pairs differing there, so keep mutants in-block
            i = rng.randrange(FUZZY_BLOCK_LEN, max(FUZZY_BLOCK_LEN + 1, len(s)))
            if op == "sub" and i < len(s):
                s[i] = rng.choice(alpha)
            elif op == "ins":
                s.insert(i, rng.choice(alpha))
            elif op == "del" and i < len(s):
                del s[i]
        return "".join(s)[:FUZZY_TITLE_LEN]

    titles = []
    for _ in range(40):
        base = rand_title()
        titles.append(base)
        for k in (1, 2, 3, 4):  # 4 > FUZZY_MAX_EDITS: must be excluded
            titles.append(mutate(base, k))
    # clones (same-title tier) and shorts (fallback tier)
    titles += [titles[0], titles[5]]
    titles += [titles[0][: FUZZY_BLOCK_LEN + 5], rand_title(FUZZY_BLOCK_LEN + 3),
               rand_title(FUZZY_BLOCK_LEN - 2)]
    rows = [(i + 1, t) for i, t in enumerate(titles)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    norm = [(i, " ".join(t.split()).lower()[:FUZZY_TITLE_LEN]) for i, t in rows]
    expect = sorted(
        (i, j, lev(a, b), a == b)
        for (i, a), (j, b) in itertools.combinations(norm, 2)
        if a[:FUZZY_BLOCK_LEN] == b[:FUZZY_BLOCK_LEN] and lev(a, b) <= FUZZY_MAX_EDITS
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.edit_distance, r.is_exact)
        for r in fuzzy_title_matches(spark, str(tmp_path)).collect()
    )
    assert got == expect
    assert any(e[2] == FUZZY_MAX_EDITS for e in expect), "fixture must reach ed=3"
    assert any(e[3] for e in expect), "fixture must exercise exact clones"
