"""Rank / dedup / top-k operators (SURVEY §2.2 P7, §2.5 W14/W21,
§2.6 O4-O6)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pct_rank_avg_ties(part: list[Column | str], value: Column | str) -> Column:
    """pandas ``rank(pct=True)`` — average-tie rank / group size.

    NOT Spark's ``percent_rank`` ((rank−1)/(n−1)); the reference's
    cross-sectional features use pandas semantics
    (`transform_balance_sheet.py:261-264`, SURVEY W14 note):
    avg_rank = rank + (ties−1)/2, pct = avg_rank / n.

    Null-aware like pandas: null values get a null rank and are
    excluded from the group size. (Spark's rank() would otherwise
    seat nulls first and count them — we subtract the null block.)
    """
    v0 = F.col(value) if isinstance(value, str) else value
    # pandas rank(pct=True) EXCLUDES NaN (result NaN, not counted in
    # the denominator); Spark treats NaN as an orderable non-null
    # value, so normalize NaN → NULL first and rank the nulls-first
    # frame — true pandas parity for parquet-round-tripped doubles
    v = F.nanvl(v0, F.lit(None).cast("double"))
    rk = F.rank().over(Window.partitionBy(*part).orderBy(v.asc_nulls_first()))
    ties = F.count(F.lit(1)).over(Window.partitionBy(*part, v))
    n_all = F.count(F.lit(1)).over(Window.partitionBy(*part))
    n_val = F.count(v).over(Window.partitionBy(*part))
    n_null = n_all - n_val
    return F.when(v.isNotNull(), (rk - n_null + (ties - F.lit(1)) / F.lit(2.0)) / n_val)


def latest_per_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """DISTINCT ON — keep the first row per key under ``order``
    (P7; trading_bot/daily_signal_scorer.py:73-89)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def top_k_per_group(df: DataFrame, part: list[str], order: list[Column], k: int, rank_col: str = "rk") -> DataFrame:
    """Per-group top-k via row_number (O5)."""
    w = Window.partitionBy(*part).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def latest_n_per_key(df: DataFrame, keys: list[str], order_desc: list[Column], n: int) -> DataFrame:
    """The reference's bounded-recompute window — last N rows per
    key, then downstream re-sorts ascending (W21,
    transform_time_series_daily_adjusted.py:429-445)."""
    w = Window.partitionBy(*keys).orderBy(*order_desc)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n).drop("__rn")
