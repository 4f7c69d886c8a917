"""Differential tests: every relational query vs its DuckDB oracle
at sf0.001 (the correctness harness at sf0.01 is the driver's job;
these keep the suite fast)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import relational  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_oracle(spark, duck, name):
    sdf = relational.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(relational.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"r_name", "revenue", "n_items"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs), "oracle without query"
    assert len(qs) > 0


def test_incremental_rollup_multi_batch_associativity(spark):
    """The state merge must be associative: folding the fact table
    in as THREE successive batches (two different cutover splits)
    must produce the bit-identical view the registered two-batch
    query produces — averages recomputed from merged sums, never
    merged directly."""
    from pyspark.sql import functions as F

    from fin_trade_craft_spark.queries.relational import (
        _t,
        incremental_rollup_maintenance,
    )

    o = _t(spark, SF_SMOKE, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderdate",
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")

    def partial(df):
        return df.groupBy("order_month", "o_orderpriority").agg(
            F.sum(dec).alias("rev_state"), F.count(F.lit(1)).alias("n_state")
        )

    b1 = partial(o.filter(F.col("o_orderdate") < "1997-06-01"))
    b2 = partial(
        o.filter((F.col("o_orderdate") >= "1997-06-01") & (F.col("o_orderdate") < "2000-06-01"))
    )
    b3 = partial(o.filter(F.col("o_orderdate") >= "2000-06-01"))
    # fold left: ((b1 + b2) + b3), re-aggregating between folds
    acc = b1
    for nxt in (b2, b3):
        acc = (
            acc.unionByName(nxt)
            .groupBy("order_month", "o_orderpriority")
            .agg(F.sum("rev_state").alias("rev_state"), F.sum("n_state").alias("n_state"))
        )
    three = acc.select(
        "order_month",
        "o_orderpriority",
        F.col("rev_state").cast("double").alias("revenue"),
        F.col("n_state").alias("n_orders"),
        (F.col("rev_state").cast("double") / F.col("n_state")).alias("avg_order_value"),
    ).toPandas()
    two = incremental_rollup_maintenance(spark, SF_SMOKE).toPandas()
    ok, msg = compare(three, two)
    assert ok, msg


def test_pareto_front_dominance_properties(spark, duck):
    """Skyline soundness + completeness at sf0.001: no kept point is
    dominated by ANY point in the table, and every non-kept
    (price, size) combo is dominated by some kept point."""
    from fin_trade_craft_spark.queries.relational import pareto_front_parts

    kept = pareto_front_parts(spark, SF_SMOKE).toPandas()
    allp = duck.execute(
        "SELECT p_retailprice AS price, p_size AS size FROM part"
    ).df()

    def dominated(price, size, others):
        m = (
            (others["price"] <= price)
            & (others["size"] >= size)
            & ((others["price"] < price) | (others["size"] > size))
        )
        return bool(m.any())

    kp = kept.rename(columns={"p_retailprice": "price", "p_size": "size"})
    for _, r in kp.iterrows():
        assert not dominated(r["price"], r["size"], allp), r
    uniq = allp.drop_duplicates()
    for _, r in uniq.iterrows():
        in_front = ((kp["price"] == r["price"]) & (kp["size"] == r["size"])).any()
        if not in_front:
            assert dominated(r["price"], r["size"], kp), r
