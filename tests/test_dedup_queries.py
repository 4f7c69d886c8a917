"""Differential tests: every dedup-family query vs its DuckDB
oracle at sf0.001 (the per-family parametrized gate the other query
modules already have)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import dedup  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(set(dedup.QUERIES) & set(dedup.ORACLES)))
def test_dedup_vs_oracle(spark, duck, name):
    sdf = dedup.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(dedup.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"
