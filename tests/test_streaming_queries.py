"""Differential tests: every registered streaming query (real
readStream → AvailableNow drain) vs its batch DuckDB oracle at
sf0.001 — the same per-family parametrized gate the batch query
modules have. The rows-only stateful query is checked for
non-emptiness and schema stability instead."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import streaming  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(set(streaming.QUERIES) & set(streaming.ORACLES)))
def test_streaming_vs_oracle(spark, duck, name):
    sdf = streaming.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(streaming.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_streaming_stateful_rows_only(spark):
    name = "streaming_zone_signals_stateful"
    df = streaming.QUERIES[name](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    assert "symbol_id" in df.columns and "buy_signal" in df.columns
