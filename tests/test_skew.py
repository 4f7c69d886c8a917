"""Salted skew-join (operators/skew.py): result identity with the
plain join, salt spreading, and guard rails."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from fin_trade_craft_spark.operators.skew import salted_join


def _skewed(spark):
    # 3 hot keys, 10k rows each — the pathological shape
    fact = spark.range(0, 30000).selectExpr(
        "id AS row_id", "CAST(id % 3 AS STRING) AS k", "CAST(id AS DOUBLE) / 7 AS v"
    )
    dim = spark.createDataFrame(
        [("0", "zero"), ("1", "one"), ("2", "two"), ("9", "unmatched")],
        "k string, label string",
    )
    return fact, dim


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], n_salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_left(spark):
    fact, dim = _skewed(spark)
    # add a fact key with no dim match so the left side preserves it
    fact = fact.union(
        spark.createDataFrame([(99999, "7", 1.0)], "row_id long, k string, v double")
    )
    plain = fact.join(dim, ["k"], "left")
    salted = salted_join(fact, dim, ["k"], n_salt=8, how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_spreads_the_hot_keys(spark):
    fact, dim = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
    n_groups = fact.withColumn("s", salt).select("k", "s").distinct().count()
    assert n_groups == 24  # 3 keys × 8 salts all populated


def test_rejects_dim_preserving_joins(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="right")
