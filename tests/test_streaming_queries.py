"""Differential tests: every registered streaming query (real
readStream → AvailableNow drain) vs its batch DuckDB oracle at
sf0.001 — the same per-family parametrized gate the batch query
modules have. Since r9 this includes the stateful zone query (its
de-stating proof made the output SQL-expressible), so the whole
streaming registry is oracle-diffed here."""

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


def test_stage_dir_relative_sf_dir(tmp_path):
    """Regression (r9, found by the sf5 sweep): a RELATIVE sf_dir
    used to produce symlinks that dangle from inside the staging
    temp dir, and a file-source stream over dangling links yields an
    EMPTY stream instead of an error — a silent-zero-rows wrong
    result. _stage_dir must resolve sources to absolute paths and
    fail fast if staging yields no readable files."""
    import os

    rel = os.path.relpath(SF_SMOKE, os.getcwd())
    staged, n = streaming._stage_dir(rel, "events")
    files = sorted(Path(staged).glob("*.parquet"))
    assert n >= 1 and len(files) == n
    assert all(p.exists() and p.resolve().is_file() for p in files)

    with pytest.raises(FileNotFoundError):
        streaming._stage_dir(str(tmp_path), "events")
