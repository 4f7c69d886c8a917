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


def test_quality_classifier_filter_contract(spark):
    """Rows-only query contract: the trained classifier must (a)
    score every document exactly once, (b) agree strongly with its
    own weak label (the features contain the label's ingredients,
    so LBFGS failing to recover it means a broken pipeline), and
    (c) produce probabilities that rank quality_score ordering."""
    from fin_trade_craft_spark.queries.text import (
        QUALITY_LABEL_THRESHOLD,
        doc_quality_scores,
        quality_classifier_filter,
    )

    pdf = quality_classifier_filter(spark, SF_SMOKE).toPandas()
    qs = doc_quality_scores(spark, SF_SMOKE).select("doc_id", "quality_score").toPandas()
    assert len(pdf) == len(qs) == pdf["doc_id"].nunique()
    merged = pdf.merge(qs, on="doc_id")
    agree = (merged["kept"] == merged["label_weak"]).mean()
    assert agree >= 0.9, f"classifier disagrees with weak label: {agree:.2%}"
    # probability must rank quality: Spearman-ish via corr of ranks
    rho = merged["p_good"].rank().corr(merged["quality_score"].rank())
    assert rho >= 0.7, f"p_good does not rank quality_score (rho={rho:.2f})"
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
