"""Macro-series features — Spark re-expression of
``transforms/transform_economic_indicators.py:190-297`` (econ_*) and
``transform_commodities.py:190-260`` (comm_*). One parametrized
implementation: the two transforms are formula-identical up to the
prefix and the zscore name (econ_value_zscore vs comm_price_zscore).

Reference pandas semantics preserved: per-window min_periods
(max(2, w//2) for zscore/slope, w//2±... for volatility/MAs),
epsilon-divides (zscore +1e-8, ratios/RSI +1e-6), RSI over RETURNS
with min_periods=7, per-date pandas percent ranks, and the >2σ /
top-quartile flags with NaN→0.

Also provides ``dedup_latest_load`` — the DISTINCT-ON ingest dedup
(newest load_date per (series, date), P7,
transform_economic_indicators.py:55-66).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.ranks import latest_per_key, pct_rank_avg_ties


def dedup_latest_load(raw: DataFrame, series_col: str) -> DataFrame:
    """Keep the newest load_date row per (series, date) (P7)."""
    return latest_per_key(raw, [series_col, "date"], [F.desc("load_date")])


def _eps_div(num: Column, den: Column, eps: float) -> Column:
    return num / (den + F.lit(eps))


def macro_features(df: DataFrame, series_col: str, prefix: str, zscore_name: str) -> DataFrame:
    """df: (series_col, date, value) → + ~20 feature columns."""
    w = Window.partitionBy(series_col).orderBy("date")

    def frame(n):
        return w.rowsBetween(-(n - 1), 0)

    def roll_mean(col, n, mp):
        return F.when(F.count(col).over(frame(n)) >= mp, F.avg(col).over(frame(n)))

    def roll_std(col, n, mp):
        return F.when(F.count(col).over(frame(n)) >= mp, F.stddev_samp(col).over(frame(n)))

    v = F.col("value")
    p = prefix

    # returns first (volatility and RSI consume them)
    rets = {}
    for k in (1, 5, 21, 63):
        prev = F.lag(v, k).over(w)
        rets[k] = F.when(prev != 0, v / prev - 1)
    df = df.select(
        "*", *[rets[k].alias(f"{p}return_{k}d") for k in (1, 5, 21, 63)]
    )
    r1 = F.col(f"{p}return_1d")

    feats = {}
    for n in (21, 63, 252):
        mp = max(2, n // 2)
        feats[f"{p}{zscore_name}_{n}d"] = _eps_div(
            v - roll_mean(v, n, mp), roll_std(v, n, mp), 1e-8
        )
    feats[f"{p}volatility_21d"] = roll_std(r1, 21, 10)
    feats[f"{p}volatility_63d"] = roll_std(r1, 63, 30)
    ma5, ma21, ma63 = roll_mean(v, 5, 3), roll_mean(v, 21, 10), roll_mean(v, 63, 30)
    feats[f"{p}ma5_ma21_ratio"] = _eps_div(ma5, ma21, 1e-6)
    feats[f"{p}ma21_ma63_ratio"] = _eps_div(ma21, ma63, 1e-6)
    # RSI over returns, simple-MA variant with eps divide (`:278-297`).
    # pandas `returns.where(returns > 0, 0)` maps the head NaN
    # return to 0 (NaN>0 is False) — it counts toward min_periods.
    gains = F.when(r1 > 0, r1).otherwise(F.lit(0.0))
    losses = F.when(r1 < 0, -r1).otherwise(F.lit(0.0))
    ag = F.when(F.count(gains).over(frame(14)) >= 7, F.avg(gains).over(frame(14)))
    al = F.when(F.count(losses).over(frame(14)) >= 7, F.avg(losses).over(frame(14)))
    rs = _eps_div(ag, al, 1e-6)
    feats[f"{p}rsi_14d"] = F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + rs)
    df = df.select("*", *[e.alias(n) for n, e in feats.items()])

    # slope needs a materialized x position (no nested windows).
    # x = cumulative NON-NULL rank, not row_number: pandas drops NaN
    # then fits over arange(len), so gappy series need the compacted
    # positions (identical to row_number when the series has no
    # nulls). precision=18: FRED-scale magnitudes (≥ 1e6) overflow
    # a decimal(12,6) cast to NULL silently.
    df = df.withColumn(
        "__x", F.count(v).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    from ..operators.rolling import rolling_slope

    w2 = Window.partitionBy(series_col).orderBy("date")
    slopes = {
        f"{p}trend_slope_{n}d": rolling_slope(
            v, F.col("__x"), w2, n, scale=6, min_periods=max(2, n // 2), precision=18
        )
        for n in (21, 63)
    }
    df = df.select("*", *[e.alias(n) for n, e in slopes.items()]).drop("__x")

    ranks = {
        f"{p}return_5d_rank": pct_rank_avg_ties([F.col("date")], F.col(f"{p}return_5d")),
        f"{p}return_21d_rank": pct_rank_avg_ties([F.col("date")], F.col(f"{p}return_21d")),
        f"{p}volatility_21d_rank": pct_rank_avg_ties([F.col("date")], F.col(f"{p}volatility_21d")),
    }
    df = df.select("*", *[e.alias(n) for n, e in ranks.items()])
    return df.select(
        "*",
        F.coalesce((F.abs(F.col(f"{p}{zscore_name}_21d")) > 2).cast("int"), F.lit(0)).alias(
            f"{p}sharp_move_flag"
        ),
        F.coalesce((F.col(f"{p}volatility_21d_rank") > 0.75).cast("int"), F.lit(0)).alias(
            f"{p}high_volatility_flag"
        ),
    )


def economic_indicator_features(df: DataFrame) -> DataFrame:
    """transforms.economic_indicators (econ_*)."""
    return macro_features(df, "indicator", "econ_", "value_zscore")


def commodity_features(df: DataFrame) -> DataFrame:
    """transforms.commodities (comm_*)."""
    return macro_features(df, "commodity", "comm_", "price_zscore")
