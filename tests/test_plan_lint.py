"""Plan lint over the ENTIRE registered query surface:

1. No batch query may plan a CartesianProduct (the unbounded
   all-pairs join — every intentional cross join in the repo is
   against a 1-row or dimension-sized frame and must come out as a
   broadcast nested-loop instead).
2. No batch query may plan an UNPARTITIONED WindowExec (empty
   partition spec = the whole input funneled through ONE task — the
   single-partition sort that kills a cluster-scale run) unless the
   query is on the documented allowlist below, where the window
   input is provably bounded (post-LIMIT, or an aggregate over a
   constant-cardinality key).

Catches future regressions where a join condition is dropped, a
broadcast threshold change degrades a plan, or someone writes
``Window.orderBy`` without a partitioner — without executing
anything: we inspect the pre-AQE physical plan.

Streaming queries are excluded — building them executes a drain."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.queries import all_queries  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

# Queries allowed to keep an unpartitioned window, each with the
# reason its window input is BOUNDED (so one task is fine):
UNPARTITIONED_WINDOW_ALLOWED = {
    # rank-stamps the 20 survivors of a distributed TakeOrdered limit
    "embedding_near_dupes": "window runs over the top-20 LIMIT output",
}


def _iter_nodes(jnode):
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))


def unpartitioned_windows(df) -> list[str]:
    """Window-family physical nodes with an EMPTY partition spec in
    df's pre-AQE physical plan (each forces a single-task stage)."""
    out = []
    plan = df._jdf.queryExecution().sparkPlan()
    for nd in _iter_nodes(plan):
        cls = nd.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            if nd.partitionSpec().isEmpty():
                out.append(f"{cls}: {nd.simpleString(200)}")
    return out


def test_no_cartesian_product_in_any_plan(spark):
    offenders = {}
    for name, fn in sorted(all_queries().items()):
        if name.startswith("streaming_"):
            continue
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = [
                ln.strip() for ln in plan.splitlines() if "CartesianProduct" in ln
            ][:2]
    assert not offenders, f"CartesianProduct planned in: {offenders}"


def test_no_unpartitioned_window_in_any_plan(spark):
    offenders = {}
    for name, fn in sorted(all_queries().items()):
        if name.startswith("streaming_") or name in UNPARTITIONED_WINDOW_ALLOWED:
            continue
        df = fn(spark, SF_SMOKE)
        hits = unpartitioned_windows(df)
        if hits:
            offenders[name] = hits[:2]
    assert not offenders, f"unpartitioned WindowExec planned in: {offenders}"


def test_hierarchical_tier_plans_are_clean(spark):
    """r06: the registry lint sees the DEFAULT (flat) tier at smoke
    scale; this lints the hierarchical-quantizer plans of the wired
    consumers too — no CartesianProduct, no unpartitioned windows.
    (Building these runs the quantizer training actions — same
    eager-build caveat as daily_screener.)"""
    from fin_trade_craft_spark.queries import similarity as SQ

    spark.conf.set(SQ.QUANTIZER_CONF, "hierarchical")
    try:
        for name in ("semdedup", "ivf_search", "incremental_semdedup_ingest"):
            df = all_queries()[name](spark, SF_SMOKE)
            plan = df._jdf.queryExecution().sparkPlan().toString()
            assert "CartesianProduct" not in plan, name
            hits = unpartitioned_windows(df)
            assert not hits, f"{name}: {hits}"
    finally:
        spark.conf.unset(SQ.QUANTIZER_CONF)
