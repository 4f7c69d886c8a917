"""Differential tests for the extra TPC-H-shaped queries
(Q2/Q4/Q8/Q9/Q10/Q14/Q19 analogs) vs their DuckDB oracles at
sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import tpch_shapes  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(tpch_shapes.QUERIES))
def test_tpch_shape_vs_oracle(spark, duck, name):
    sdf = tpch_shapes.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(tpch_shapes.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"
