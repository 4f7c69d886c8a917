"""Physical-plan regressions: the optimizer properties SCALING.md
claims must stay true — filter pushdown and column pruning reaching
the parquet scans, broadcast dimension joins, bounded shuffle
counts, and whole-stage codegen in the relational core. A change
that silently adds a shuffle or un-pushes a filter fails here, not
in a 100 TB incident."""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import SF_SMOKE


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def _broadcast_joins(plan: str) -> int:
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))


def test_filter_and_projection_reach_the_scan(spark):
    from fin_trade_craft_spark.queries.relational import pricing_summary

    plan = _formatted(pricing_summary(spark, SF_SMOKE))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate pushed into parquet
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m, plan
    # 7 needed columns, not the 16-column lineitem schema
    assert m.group(1).count(":") == 7
    assert "l_comment" not in m.group(1)


def test_isin_pushdown(spark):
    from fin_trade_craft_spark.queries.relational import key_list_pushdown

    plan = _formatted(key_list_pushdown(spark, SF_SMOKE))
    assert re.search(r"In\(o_custkey, \[", plan)  # key list pushed to the scan
    assert _exchanges(plan) <= 1


def test_star_join_broadcasts_all_dims(spark):
    from fin_trade_craft_spark.queries.relational import regional_revenue

    plan = _formatted(regional_revenue(spark, SF_SMOKE))
    # orders/customer/nation/region all broadcast: no fact-fact shuffle join
    assert _broadcast_joins(plan) >= 4
    assert "SortMergeJoin" not in plan
    # shuffles: one for the aggregate, one for the final orderBy
    assert _exchanges(plan) <= 2


def test_rolling_features_shuffle_once(spark):
    from fin_trade_craft_spark.queries.windows import rolling_user_features

    plan = _formatted(rolling_user_features(spark, SF_SMOKE))
    # every window reuses the single hash exchange on the entity key
    assert _exchanges(plan) == 1


def test_aggregates_are_partial_then_final(spark):
    from fin_trade_craft_spark.queries.relational import pricing_summary

    plan = _formatted(pricing_summary(spark, SF_SMOKE))
    # map-side combine before the exchange: two HashAggregate nodes
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2
    assert _exchanges(plan) <= 2  # agg + presentation orderBy


def test_nation_trade_volume_filters_dims_before_fact_join(spark):
    """Q7 shape: the nation filter must reach the supplier/customer
    dims (broadcast), leaving ONE fact-fact shuffle join — not a
    post-join filter over the full lineitem×orders product."""
    from fin_trade_craft_spark.queries.relational import nation_trade_volume

    plan = _formatted(nation_trade_volume(spark, SF_SMOKE))
    assert _broadcast_joins(plan) >= 3
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # lineitem scan keeps the shipdate pushdown
    assert "l_shipdate" in plan and "PushedFilters" in plan


def test_asof_join_compiles_to_equi_join(spark):
    """The as-of join's key equality rides inside the composite
    join condition (operators/asof.py); Catalyst must extract it
    into a hash/sort-merge equi join. If a refactor degrades this
    to a nested-loop/cartesian plan, the operator silently becomes
    O(n·m) at scale — pin it here."""
    from fin_trade_craft_spark.queries.asof import asof_enrichment

    plan = _formatted(asof_enrichment(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_scoring_fundamentals_join_is_equi(spark):
    """join_fundamentals_to_trades passes its key equality via the
    ``validity`` argument with on=[] (domain/scoring.py) — the
    extraction is load-bearing; pin the physical join strategy."""
    from datetime import date

    from fin_trade_craft_spark.domain.scoring import join_fundamentals_to_trades

    trades = spark.createDataFrame(
        [(1, 10, date(2024, 6, 1)), (2, 11, date(2024, 6, 2))],
        "trade_id long, symbol_id long, entry_date date",
    )
    scores = spark.createDataFrame(
        [(10, date(2024, 3, 31), 55.0), (11, date(2024, 3, 31), 60.0)],
        "symbol_id long, fiscal_date_ending date, overall_quality_score double",
    )
    plan = _formatted(join_fundamentals_to_trades(trades, scores))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_in_relational_core(spark):
    from fin_trade_craft_spark.queries.relational import pricing_summary

    df = pricing_summary(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="codegen")
    plan = buf.getvalue()
    assert "WholeStageCodegen" in plan and "Found" in plan


def test_eval_contamination_broadcasts_eval_set(spark):
    """The eval shingle set is benchmark-sized and must broadcast:
    the 100 TB train side is then a map-side semi-join probe. A
    regression to a shuffled join would shuffle the whole corpus's
    shingles."""
    from fin_trade_craft_spark.queries.text import eval_contamination

    plan = _formatted(eval_contamination(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_sole_late_suppliers_no_correlated_execution(spark):
    """Q21 shape: both EXISTS probes must de-correlate into
    aggregates — no nested-loop or cartesian anywhere, supplier dim
    broadcast."""
    from fin_trade_craft_spark.queries.relational import sole_late_suppliers

    plan = _formatted(sole_late_suppliers(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert _broadcast_joins(plan) >= 1


def test_idle_rich_customers_anti_join(spark):
    """Q22 shape: NOT EXISTS must compile to a single anti join;
    the scalar average is a broadcast, never a per-row subquery."""
    from fin_trade_craft_spark.queries.relational import idle_rich_customers

    plan = _formatted(idle_rich_customers(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_warehouse_partition_pruning(spark, tmp_path):
    """A date-partitioned warehouse table read with a partition
    predicate must prune at the SCAN (PartitionFilters), not filter
    post-read — at 100 TB this is the difference between reading
    one day and reading the table."""
    from pyspark.sql import functions as F

    from fin_trade_craft_spark.sources.io import TableIO

    io_ = TableIO(spark, str(tmp_path))
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("day"),
    )
    io_.overwrite(df, "t", partition_by=["day"])
    read = io_.read("t").filter(F.col("day") == "2")
    plan = _formatted(read)
    assert re.search(r"PartitionFilters: \[[^\]]*day", plan), plan
    assert read.count() == 25


def test_q6_all_predicates_reach_the_scan(spark):
    """forecast_revenue_change is pure scan: date range, discount
    band, and quantity cap must all be in PushedFilters, and the scan
    must read only the 4 touched columns."""
    from fin_trade_craft_spark.queries.tpch_shapes import forecast_revenue_change

    plan = _formatted(forecast_revenue_change(spark, SF_SMOKE))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24" in plan
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m and m.group(1).count(":") == 4, plan
    # single-scan agg: the only exchange is the 1-row final-agg gather
    assert _exchanges(plan) <= 1


def test_q3_semi_broadcast_and_single_fact_shuffle_pair(spark):
    from fin_trade_craft_spark.queries.tpch_shapes import shipping_priority

    plan = _formatted(shipping_priority(spark, SF_SMOKE))
    # customer-segment filter is a broadcast semi-join, not a shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q11_global_total_is_one_row_broadcast(spark):
    from fin_trade_craft_spark.queries.tpch_shapes import important_part_values

    plan = _formatted(important_part_values(spark, SF_SMOKE))
    # the scalar-subquery total joins back as a broadcast, never a
    # cartesian re-shuffle of the per-part aggregate
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or _broadcast_joins(plan) >= 1
    # supplier-nation restriction is semi-join shaped
    assert "LeftSemi" in plan


def test_q16_not_in_becomes_broadcast_anti_join(spark):
    from fin_trade_craft_spark.queries.tpch_shapes import part_supplier_counts

    plan = _formatted(part_supplier_counts(spark, SF_SMOKE))
    assert re.search(r"BroadcastHashJoin.*LeftAnti|LeftAnti.*BuildRight", plan, re.S)
    assert "CartesianProduct" not in plan


def test_q20_nested_in_is_semi_join_chain(spark):
    from fin_trade_craft_spark.queries.tpch_shapes import excess_stock_suppliers

    plan = _formatted(excess_stock_suppliers(spark, SF_SMOKE))
    assert plan.count("LeftSemi") >= 2  # part->lineitem and pq->supplier
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
