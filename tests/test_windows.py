"""Differential tests for the windows query family at sf0.001."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import windows  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_windows_vs_oracle(spark, duck, name):
    sdf = windows.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(windows.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_rolling_mean_matches_pandas(spark):
    """Pin pandas rolling(n) min_periods semantics (SURVEY W1)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fin_trade_craft_spark.operators import rolling

    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 18.0, 17.0]
    df = spark.createDataFrame([(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double")
    w = rolling.rows_window("k", [F.col("i")])
    got = [r.m for r in df.select(rolling.rolling_mean(F.col("v"), w, 3).alias("m")).orderBy("i").collect()]
    want = pd.Series(vals).rolling(3).mean().tolist()
    for g, x in zip(got, want):
        assert (g is None and x != x) or abs(g - x) < 1e-12


def test_rolling_std_matches_pandas(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from fin_trade_craft_spark.operators import rolling

    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 18.0, 17.0]
    df = spark.createDataFrame([(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double")
    w = rolling.rows_window("k", [F.col("i")])
    got = [r.s for r in df.select(rolling.rolling_std(F.col("v"), w, 4).alias("s")).orderBy("i").collect()]
    want = pd.Series(vals).rolling(4).std().tolist()
    for g, x in zip(got, want):
        assert (g is None and x != x) or abs(g - x) < 1e-9
