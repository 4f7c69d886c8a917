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


def test_tvd_drift_edge_semantics(spark):
    """tvd_drift_from_counts contract pinned on a crafted frame:
    (a) a type missing from either consecutive hour is excluded
    from that hour-pair's TVD (inner-join semantics), (b) an hour
    with no previous hour emits nothing, even when the previous
    ROW per type is an earlier non-adjacent hour, (c) identical
    mixes give tvd = 0 exactly."""
    import datetime as dt

    from fin_trade_craft_spark.queries.windows import tvd_drift_from_counts

    h = lambda i: dt.datetime(2024, 1, 1, i)
    rows = [
        # hour 0: a=10, b=10 — no prev hour => no output row
        (h(0), "a", 10), (h(0), "b", 10),
        # hour 1: identical mix => tvd 0; type c is new (excluded)
        (h(1), "a", 10), (h(1), "b", 10), (h(1), "c", 5),
        # hour 2: a doubles, b stays, c vanishes (excluded)
        (h(2), "a", 20), (h(2), "b", 10),
        # hour 4 (hour 3 missing): lag rows exist per type but are
        # NOT the previous hour => no output row for hour 4
        (h(4), "a", 1), (h(4), "b", 1),
    ]
    cnt = spark.createDataFrame(rows, "hour timestamp, event_type string, c long")
    got = {r.hour.hour: r for r in tvd_drift_from_counts(cnt).collect()}
    assert sorted(got) == [1, 2]
    r1 = got[1]
    # joined types a,b only; totals include c's 5 (hour totals are
    # mix denominators, not joined-type sums)
    assert r1.n_types == 2 and r1.n_curr == 25 and r1.n_prev == 20
    # |10*20-10*25| + |10*20-10*25| = 100 over 2*25*20 = 0.1
    assert abs(r1.tvd - 0.1) < 1e-12
    r2 = got[2]
    assert r2.n_types == 2 and r2.n_curr == 30 and r2.n_prev == 25
    # |20*25-10*30| + |10*25-10*30| = 200+50 over 2*30*25 = 1/6
    assert abs(r2.tvd - round(250 / 1500, 9)) < 1e-12
