"""Differential tests: every relational query vs its DuckDB oracle
at sf0.001 (the correctness harness at sf0.01 is the driver's job;
these keep the suite fast)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import relational  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_oracle(spark, duck, name):
    sdf = relational.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(relational.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"r_name", "revenue", "n_items"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs), "oracle without query"
    assert len(qs) > 0
