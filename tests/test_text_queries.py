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


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_vs_oracle(spark, duck, name):
    sdf = text.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(text.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


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
