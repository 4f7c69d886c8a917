"""Property-based tests (hypothesis) for the core operator
semantics — SURVEY §5's differential-testing strategy applied to
randomly generated inputs rather than fixed fixtures.

Each property compares a Spark operator against a brute-force
python/pandas model on small generated datasets. Spark sessions are
expensive, so examples are kept small and deadlines disabled."""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from pathlib import Path

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from fin_trade_craft_spark.operators import rolling  # noqa: E402
from fin_trade_craft_spark.operators.asof import asof_join  # noqa: E402
from fin_trade_craft_spark.operators.ranks import pct_rank_avg_ties  # noqa: E402

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

series_strategy = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False).map(lambda v: round(v, 2)),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(vals=series_strategy, n=st.integers(min_value=1, max_value=10))
def test_rolling_mean_property(spark, vals, n):
    df = spark.createDataFrame([(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double")
    w = rolling.rows_window("k", [F.col("i")])
    got = [r.m for r in df.select("i", rolling.rolling_mean(F.col("v"), w, n).alias("m")).orderBy("i").collect()]
    want = pd.Series(vals).rolling(n).mean().tolist()
    for g, x in zip(got, want):
        assert (g is None and x != x) or abs(g - x) < 1e-9, (vals, n)


@SETTINGS
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(lambda v: round(v, 1)),
        min_size=1,
        max_size=30,
    )
)
def test_pct_rank_avg_ties_property(spark, vals):
    df = spark.createDataFrame([(1, i, v) for i, v in enumerate(vals)], "g int, i int, v double")
    got = {
        r.i: r.p
        for r in df.select("i", pct_rank_avg_ties([F.col("g")], F.col("v")).alias("p")).collect()
    }
    want = pd.Series(vals).rank(pct=True)
    for i in range(len(vals)):
        assert abs(got[i] - want[i]) < 1e-12, (vals, i)


@SETTINGS
@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    right_ts=st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=15),
    validity=st.integers(min_value=1, max_value=50),
)
def test_asof_join_property(spark, left_ts, right_ts, validity):
    """asof_join == brute-force 'latest right ≤ left within window,
    ties broken by larger rid, unmatched preserved'."""
    d0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, d0 + timedelta(hours=t)) for i, t in enumerate(left_ts)], "lid int, lt timestamp"
    )
    right = spark.createDataFrame(
        [(i, d0 + timedelta(hours=t)) for i, t in enumerate(right_ts)], "rid int, rt timestamp"
    ) if right_ts else spark.createDataFrame([], "rid int, rt timestamp")
    win = F.unix_micros(F.col("lt")) - F.unix_micros(F.col("rt")) <= validity * 3_600_000_000
    out = asof_join(
        left, right, on=[], left_time="lt", right_time="rt", left_key="lid",
        validity=win, tiebreak=[F.col("rid").desc()],
    )
    got = {r.lid: r.rid for r in out.collect()}
    for i, lt in enumerate(left_ts):
        cands = [(t, rid) for rid, t in enumerate(right_ts) if t <= lt and lt - t <= validity]
        want = max(cands, key=lambda c: (c[0], c[1]))[1] if cands else None
        assert got.get(i) == want, (left_ts, right_ts, validity, i)


def test_asof_join_on_keys_and_shared_time_name(spark):
    """The advertised `on=[...]` path with BOTH time columns named
    `ts` (the natural as-of call): side-qualified resolution must
    join correctly, drop the right-side key copy, and leave the key
    selectable without AMBIGUOUS_REFERENCE."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from fin_trade_craft_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    trades = spark.createDataFrame(
        [(1, 10, t("2024-01-01T10:00:05")), (2, 10, t("2024-01-01T10:00:00")),
         (3, 20, t("2024-01-01T09:00:00"))],
        "trade_id int, symbol_id int, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [(10, t("2024-01-01T10:00:00"), 100.0), (10, t("2024-01-01T10:00:04"), 101.0),
         (10, t("2024-01-01T10:00:06"), 999.0), (20, t("2024-01-01T09:30:00"), 50.0)],
        "symbol_id int, ts timestamp, quote double",
    )
    out = asof_join(
        trades, quotes, on=["symbol_id"], left_time="ts", right_time="ts",
        left_key="trade_id",
    )
    # right-side symbol_id copy dropped -> unambiguous select
    got = {r.trade_id: r.quote for r in out.select("trade_id", "symbol_id", "quote").collect()}
    assert got == {1: 101.0, 2: 100.0, 3: None}  # latest quote at-or-before; no future quote
