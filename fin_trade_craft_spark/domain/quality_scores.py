"""Fundamental quality scores — Spark re-expression of
``transforms/transform_fundamental_quality_scores.py:250-525``:
clip-to-bounds normalization → 0-100 component scores → weighted
composites → multiplicative penalty flags → overall score + grade
flags.

Batch-dependence preserved deliberately (SURVEY §7.5 decision): the
FCF generation bounds are the 20th/80th percentile of the rows
being processed (`:352`), and each component's all-null fallback
(neutral 50) is evaluated over the batch — so scores depend on the
processed row universe exactly as in the reference. The scalar
bounds are one tiny aggregate row cross-joined (broadcast) onto the
batch; everything else is per-row expressions.

pandas semantics notes: component means skip NaN per row
(``pd.concat().mean(axis=1)``); composites propagate NaN; the
overall composite fills NaN components with 50; ``clip`` keeps NaN;
flag comparisons treat NaN as False.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCORE_COLS = [
    "balance_sheet_quality_score",
    "cash_flow_quality_score",
    "income_statement_quality_score",
    "overall_quality_score",
    "bs_liquidity_score",
    "bs_leverage_score",
    "bs_asset_quality_score",
    "cf_generation_score",
    "cf_efficiency_score",
    "cf_sustainability_score",
    "is_profitability_score",
    "is_margin_score",
    "is_growth_score",
]

# component -> (lower, upper, reverse); None bounds = batch percentile
_FIXED = {
    "fbs_current_ratio": (0.5, 2.5, False),
    "fbs_quick_ratio": (0.3, 1.5, False),
    "fbs_debt_to_equity": (0.0, 3.0, True),
    "fbs_debt_to_assets": (0.0, 0.8, True),
    "fbs_tangible_asset_ratio": (0.3, 0.95, False),
    "fcf_operating_cf_margin": (0.05, 0.25, False),
    "fcf_ocf_to_capex_ratio": (0.5, 3.0, False),
    "fcf_cash_conversion_ratio": (0.5, 1.5, False),
    "fcf_free_cash_flow_yoy_pct": (-0.20, 0.30, False),
    "fis_net_margin": (0.05, 0.25, False),
    "fis_operating_margin": (0.05, 0.30, False),
    "fis_gross_margin": (0.20, 0.60, False),
    "fis_revenue_yoy_pct": (-0.05, 0.20, False),
    "fis_net_income_yoy_pct": (-0.20, 0.30, False),
}


def _batch_stats(df: DataFrame) -> DataFrame:
    """One scalar row: per-component non-null counts + the FCF
    percentile bounds (exact interpolated percentile, matching
    pandas' linear quantile)."""
    aggs = [F.count(F.col(c)).alias(f"__n_{c}") for c in [*_FIXED, "fcf_free_cash_flow"]]
    aggs += [
        F.expr("percentile(fcf_free_cash_flow, 0.20)").alias("__fcf_lb"),
        F.expr("percentile(fcf_free_cash_flow, 0.80)").alias("__fcf_ub"),
    ]
    return df.agg(*aggs)


def _norm(col: Column, n_col: Column, lb: Column, ub: Column, reverse: bool) -> Column:
    """_normalize_to_score (`:250-284`): all-null batch → 50; clip
    to bounds; zero range → 50; scale 0-100 (reverse optional).
    Null input → null score (pandas clip propagates NaN; Spark's
    least/greatest would silently substitute the bound)."""
    clipped = F.least(F.greatest(col, lb), ub)
    scaled = (clipped - lb) / (ub - lb)
    if reverse:
        scaled = F.lit(1.0) - scaled
    return (
        F.when(n_col == 0, F.lit(50.0))
        .when(ub - lb == 0, F.lit(50.0))
        .when(col.isNotNull(), scaled * 100.0)
    )


def _mean_skipna(cols: list[Column]) -> Column:
    n = sum(c.isNotNull().cast("int") for c in cols)
    s = sum(F.coalesce(c, F.lit(0.0)) for c in cols)
    return F.when(n > 0, s / n)


def _clip_0_100(c: Column) -> Column:
    # null-propagating clip (Spark least/greatest skip nulls)
    return F.when(c.isNotNull(), F.least(F.greatest(c, F.lit(0.0)), F.lit(100.0)))


def compute_quality_scores(features: DataFrame) -> DataFrame:
    """features: joined fbs_*/fcf_*/fis_* frame keyed (symbol_id,
    fiscal_date_ending) → + 13 score cols + 3 grade flags."""
    # Missing values may arrive as NULL (engine-native) or NaN
    # (pandas/parquet round-trips). Spark's least/greatest would
    # treat NaN as +∞ — "clipping" NaN to the upper bound — so
    # normalize every numeric input to NULL first.
    for c in [*_FIXED, "fcf_free_cash_flow"]:
        features = features.withColumn(
            c, F.nanvl(F.col(c).cast("double"), F.lit(None).cast("double"))
        )
    stats = _batch_stats(features)
    df = features.crossJoin(F.broadcast(stats))

    def norm(name: str) -> Column:
        lb, ub, rev = _FIXED[name]
        return _norm(F.col(name), F.col(f"__n_{name}"), F.lit(lb), F.lit(ub), rev)

    fcf_norm = _norm(
        F.col("fcf_free_cash_flow"),
        F.col("__n_fcf_free_cash_flow"),
        F.col("__fcf_lb"),
        F.col("__fcf_ub"),
        False,
    )

    comp = {
        "bs_liquidity_score": _mean_skipna([norm("fbs_current_ratio"), norm("fbs_quick_ratio")]),
        "bs_leverage_score": _mean_skipna([norm("fbs_debt_to_equity"), norm("fbs_debt_to_assets")]),
        "bs_asset_quality_score": _mean_skipna([norm("fbs_tangible_asset_ratio")]),
        "cf_generation_score": _mean_skipna([fcf_norm, norm("fcf_operating_cf_margin")]),
        "cf_efficiency_score": _mean_skipna(
            [norm("fcf_ocf_to_capex_ratio"), norm("fcf_cash_conversion_ratio")]
        ),
        "cf_sustainability_score": _mean_skipna([norm("fcf_free_cash_flow_yoy_pct")]),
        "is_profitability_score": _mean_skipna([norm("fis_net_margin")]),
        "is_margin_score": _mean_skipna([norm("fis_operating_margin"), norm("fis_gross_margin")]),
        "is_growth_score": _mean_skipna(
            [norm("fis_revenue_yoy_pct"), norm("fis_net_income_yoy_pct")]
        ),
    }
    # NOTE on _mean_skipna + all-null batches: norm() yields the
    # neutral 50 when the batch count is 0 (matching the reference,
    # which appends a constant-50 Series), so means never see a
    # "missing component column".
    df = df.select("*", *[e.alias(n) for n, e in comp.items()])

    bs = (
        F.col("bs_liquidity_score") * 0.30
        + F.col("bs_leverage_score") * 0.40
        + F.col("bs_asset_quality_score") * 0.30
    )
    bs = F.when(F.col("fbs_liquidity_shock_flag") == 1, bs * 0.8).otherwise(bs)
    cf = (
        F.col("cf_generation_score") * 0.40
        + F.col("cf_efficiency_score") * 0.30
        + F.col("cf_sustainability_score") * 0.30
    )
    cf = F.when(F.col("fcf_negative_free_cash_flow_flag") == 1, cf * 0.7).otherwise(cf)
    cf = F.when(F.col("fcf_cash_burn_flag") == 1, cf * 0.5).otherwise(cf)
    inc = (
        F.col("is_profitability_score") * 0.40
        + F.col("is_margin_score") * 0.30
        + F.col("is_growth_score") * 0.30
    )
    inc = F.when(F.col("fis_negative_net_income_flag") == 1, inc * 0.6).otherwise(inc)
    inc = F.when(F.col("fis_revenue_decline_flag") == 1, inc * 0.85).otherwise(inc)

    df = df.select(
        "*",
        bs.alias("balance_sheet_quality_score"),
        cf.alias("cash_flow_quality_score"),
        inc.alias("income_statement_quality_score"),
    )
    overall = (
        F.coalesce(F.col("balance_sheet_quality_score"), F.lit(50.0)) * 0.33
        + F.coalesce(F.col("cash_flow_quality_score"), F.lit(50.0)) * 0.33
        + F.coalesce(F.col("income_statement_quality_score"), F.lit(50.0)) * 0.34
    )
    df = df.withColumn("overall_quality_score", overall)
    for c in SCORE_COLS:
        df = df.withColumn(c, _clip_0_100(F.col(c)))
    df = df.select(
        "*",
        F.coalesce(F.col("overall_quality_score") >= 70, F.lit(False)).alias("is_high_quality"),
        F.coalesce(
            (F.col("balance_sheet_quality_score") >= 50)
            & (F.col("cash_flow_quality_score") >= 50)
            & (F.col("income_statement_quality_score") >= 50),
            F.lit(False),
        ).alias("is_investment_grade"),
        (
            F.coalesce(F.col("fbs_liquidity_shock_flag") == 1, F.lit(False))
            | F.coalesce(F.col("fcf_cash_burn_flag") == 1, F.lit(False))
            | F.coalesce(F.col("fis_negative_net_income_flag") == 1, F.lit(False))
        ).alias("has_red_flags"),
    )
    return df.drop(*[c for c in df.columns if c.startswith("__")])
