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
    """sketch-then-verify (r07 verdict task 6): the profile emits
    exact cardinalities plus HLL bound booleans; the booleans must
    all hold and the exact twin must match an independent
    countDistinct."""
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
        assert got[et].exact_users == n
        assert got[et].exact_users_sketch_in_bound is True, (
            f"{et}: HLL estimate strayed outside 5*rsd of {n}"
        )


def test_approx_quantiles_within_rank_error(spark):
    """The GK estimates' rank-window booleans must hold, and the
    exact discrete quantiles must equal an independent sorted
    value-at-rank selection (value at ceil(q*n), 1-indexed)."""
    import math

    from fin_trade_craft_spark.queries.sketches import approx_events_profile

    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_type: r for r in approx_events_profile(spark, SF_SMOKE).collect()}
    for et, row in got.items():
        assert row.quantiles_sketch_in_bound is True, et
        vals = sorted(
            r.value
            for r in ev.filter(
                (F.col("event_type") == et) & F.col("value").isNotNull()
            ).select("value").collect()
        )
        n = len(vals)
        for q, v in [(0.5, row.p50_exact), (0.9, row.p90_exact), (0.99, row.p99_exact)]:
            assert v == vals[math.ceil(q * n) - 1], (et, q, v)


def test_sketches_registered_as_driver_queries(spark):
    from fin_trade_craft_spark.queries import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert "approx_events_profile" in qs and "approx_corpus_profile" in qs
    # value-oracled via sketch-then-verify since r08 (was rows-only)
    assert "approx_events_profile" in os_ and "approx_corpus_profile" in os_
    assert approx_rows_ok(qs["approx_corpus_profile"](spark, SF_SMOKE))


def approx_rows_ok(df) -> bool:
    rows = df.collect()
    return (
        len(rows) > 0
        and all(r.n_docs > 0 for r in rows)
        and all(r.exact_sources_sketch_in_bound for r in rows)
        and all(r.exact_len_classes_sketch_in_bound for r in rows)
        and all(r.median_sketch_in_bound for r in rows)
    )


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
