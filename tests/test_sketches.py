"""Sketch aggregates: the correctness contract is the error bound
vs the exact answer (cross-engine value equality is meaningless for
algorithm-specific sketches — see queries/sketches.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from fin_trade_craft_spark.sources.catalog import load_table


def test_approx_users_within_hll_bound(spark):
    from fin_trade_craft_spark.queries.sketches import approx_events_profile

    got = {r.event_type: r for r in approx_events_profile(spark, SF_SMOKE).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        err = abs(got[et].approx_users - n) / n
        # rsd=0.02; allow 5 sigma
        assert err < 0.10, f"{et}: approx {got[et].approx_users} vs exact {n}"


def test_approx_quantiles_within_rank_error(spark):
    from fin_trade_craft_spark.queries.sketches import approx_events_profile

    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_type: r for r in approx_events_profile(spark, SF_SMOKE).collect()}
    for et, row in got.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        for q, v in [(0.5, row.p50), (0.9, row.p90), (0.99, row.p99)]:
            # GK guarantee: returned value's rank within q*n ± n/accuracy;
            # with accuracy 10k and n ≈ 1-2k the answer is rank-exact —
            # allow ±2 ranks for interpolation edges
            lo = max(0, int(q * n) - 2)
            hi = min(n - 1, int(q * n) + 2)
            assert vals[lo] <= v <= vals[hi], (et, q, v, vals[lo], vals[hi])


def test_sketches_registered_as_driver_queries(spark):
    from fin_trade_craft_spark.queries import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert "approx_events_profile" in qs and "approx_corpus_profile" in qs
    # rows-only by design: no oracle entries
    assert "approx_events_profile" not in os_ and "approx_corpus_profile" not in os_
    assert approx_rows_ok(qs["approx_corpus_profile"](spark, SF_SMOKE))


def approx_rows_ok(df) -> bool:
    rows = df.collect()
    return len(rows) > 0 and all(r.n_docs > 0 for r in rows)


def test_frequent_tokens_superset_guarantee_and_exactness(spark):
    """freqItems must return a SUPERSET of true heavy hitters (the
    KPS contract this query's correctness rests on), and the
    verified output must equal the exactly-computed heavy-hitter
    set."""
    from conftest import SF_SMOKE

    from fin_trade_craft_spark.functions import text as T
    from fin_trade_craft_spark.queries.sketches import FREQ_SUPPORT, frequent_tokens
    from fin_trade_craft_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        F.explode(T.tokens(F.col("text"))).alias("term")
    )
    total = d.count()
    exact = {
        r.term: r.n
        for r in d.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
        if r.n >= FREQ_SUPPORT * total
    }
    got = {r.term: r.n for r in frequent_tokens(spark, SF_SMOKE).collect()}
    assert got == exact
    cands = set(d.stat.freqItems(["term"], FREQ_SUPPORT).collect()[0][0])
    assert set(exact) <= cands  # superset guarantee
