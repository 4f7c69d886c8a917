"""Fundamental-statement transforms — Spark re-expression of
``transforms/transform_balance_sheet.py`` (fbs_*, `:200-269`),
``transform_income_statement.py`` (fis_*, `:222-307`) and
``transform_cash_flow.py`` (fcf_*, `:222-302`).

Shared shape per statement: epsilon safe-divide ratios
(``num/(denom+1e-6)``, exactly the reference's ``_safe_div`` — zero
denominators give huge finite ratios that downstream quality scoring
clips), QoQ/YoY pct_change with ``fill_method=None``
(value/lag − 1, nulls propagate; a zero base is NULL here vs ±inf
in pandas — documented divergence, both unusable downstream),
rolling(4, min_periods=2) sample std, pandas-style cross-sectional
percent ranks per (fiscal_date_ending, sector|industry), and
boolean flags with pandas NaN-comparison semantics (NaN < x →
False → flag 0).

One shuffle on symbol_id serves the time features; rank features
shuffle on (date, sector)/(date, industry) — at scale these are the
same two exchanges regardless of feature count.

Inputs carry (symbol_id, symbol, fiscal_date_ending, sector,
industry, <statement measures>) — the sector/industry join (J4,
broadcast ``company_overview``) happens in pipeline code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.ranks import pct_rank_avg_ties


def _w():
    return Window.partitionBy("symbol_id").orderBy("fiscal_date_ending")


def safe_div(num: Column, den: Column) -> Column:
    """Reference ``_safe_div`` (`transform_balance_sheet.py:41-43`,
    same in income_statement/cash_flow): ``num / (denom + 1e-6)`` —
    a zero denominator yields a large finite ratio (later clipped to
    an extreme score by quality scoring), never inf/NaN. NULL inputs
    propagate to NULL, matching pandas NaN propagation."""
    return num / (den + F.lit(1e-6))


def z(col: str) -> Column:
    return F.coalesce(F.col(col), F.lit(0))


def pct_change(col: Column, k: int) -> Column:
    prev = F.lag(col, k).over(_w())
    return F.when(prev != 0, col / prev - 1)


def rolling_std4(col: Column) -> Column:
    """rolling(4, min_periods=2).std() — sample std over trailing 4
    quarters. pandas skips NaN inside the window (std of the
    non-null values); stddev_samp does the same."""
    frame = _w().rowsBetween(-3, 0)
    return F.when(F.count(col).over(frame) >= 2, F.stddev_samp(col).over(frame))


def sector_rank(col: Column) -> Column:
    # NULL sector -> NULL rank: the reference's pandas groupby drops
    # NaN keys, so symbols missing from company_overview get NaN
    # ranks, not a rank within a phantom null-sector cross-section
    return F.when(
        F.col("sector").isNotNull(),
        pct_rank_avg_ties([F.col("fiscal_date_ending"), F.col("sector")], col),
    )


def industry_rank(col: Column) -> Column:
    return F.when(
        F.col("industry").isNotNull(),
        pct_rank_avg_ties([F.col("fiscal_date_ending"), F.col("industry")], col),
    )


def flag(cond: Column) -> Column:
    """(cond).astype(int) with pandas NaN→False semantics."""
    return F.coalesce(cond.cast("int"), F.lit(0))


def balance_sheet_features(df: DataFrame) -> DataFrame:
    """fbs_* features (`transform_balance_sheet.py:200-269`)."""
    c = F.col
    base = {
        "fbs_current_ratio": safe_div(c("total_current_assets"), c("total_current_liabilities")),
        "fbs_quick_ratio": safe_div(
            c("cash_and_short_term_investments") + c("current_net_receivables"),
            c("total_current_liabilities"),
        ),
        "fbs_cash_ratio": safe_div(c("cash_and_cash_equivalents"), c("total_current_liabilities")),
        "fbs_working_capital": c("total_current_assets") - c("total_current_liabilities"),
        "fbs_debt_to_equity": safe_div(c("total_liabilities"), c("total_shareholder_equity")),
        "fbs_current_debt_ratio": safe_div(c("current_debt"), c("total_assets")),
        "fbs_long_term_debt_ratio": safe_div(c("long_term_debt"), c("total_assets")),
        "fbs_debt_to_assets": safe_div(c("total_liabilities"), c("total_assets")),
        "fbs_tangible_asset_ratio": safe_div(
            c("total_assets") - z("goodwill") - z("intangible_assets"), c("total_assets")
        ),
        "fbs_intangibles_share": safe_div(z("goodwill") + z("intangible_assets"), c("total_assets")),
        "fbs_ppe_intensity": safe_div(c("property_plant_equipment"), c("total_assets")),
        "fbs_cash_to_assets": safe_div(c("cash_and_short_term_investments"), c("total_assets")),
        "fbs_book_value_per_share": safe_div(
            c("total_shareholder_equity"), c("common_stock_shares_outstanding")
        ),
        "fbs_retained_earnings_ratio": safe_div(c("retained_earnings"), c("total_shareholder_equity")),
        "fbs_treasury_stock_effect": safe_div(z("treasury_stock"), c("total_shareholder_equity")),
        "fbs_balance_sheet_leverage": safe_div(c("total_liabilities"), c("total_assets")),
        "fbs_financial_leverage": safe_div(c("total_assets"), c("total_shareholder_equity")),
        "fbs_interest_coverage_proxy": safe_div(z("ebit"), z("current_debt") + z("long_term_debt")),
        "fbs_asset_turnover": safe_div(z("total_revenue"), c("total_assets")),
    }
    df = df.select("*", *[e.alias(n) for n, e in base.items()])
    derived = {
        "fbs_current_ratio_qoq_pct": pct_change(c("fbs_current_ratio"), 1),
        "fbs_quick_ratio_qoq_pct": pct_change(c("fbs_quick_ratio"), 1),
        "fbs_working_capital_qoq_pct": pct_change(c("fbs_working_capital"), 1),
        "fbs_debt_to_equity_qoq_pct": pct_change(c("fbs_debt_to_equity"), 1),
        "fbs_current_ratio_yoy_pct": pct_change(c("fbs_current_ratio"), 4),
        "fbs_quick_ratio_yoy_pct": pct_change(c("fbs_quick_ratio"), 4),
        "fbs_current_ratio_volatility": rolling_std4(c("fbs_current_ratio")),
        "fbs_quick_ratio_volatility": rolling_std4(c("fbs_quick_ratio")),
        "fbs_current_ratio_sector_rank": sector_rank(c("fbs_current_ratio")),
        "fbs_quick_ratio_sector_rank": sector_rank(c("fbs_quick_ratio")),
        "fbs_current_ratio_industry_rank": industry_rank(c("fbs_current_ratio")),
        "fbs_quick_ratio_industry_rank": industry_rank(c("fbs_quick_ratio")),
    }
    df = df.select("*", *[e.alias(n) for n, e in derived.items()])
    return df.withColumn("fbs_liquidity_shock_flag", flag(c("fbs_current_ratio_qoq_pct") < -0.2))


def income_statement_features(df: DataFrame) -> DataFrame:
    """fis_* features (`transform_income_statement.py:222-307`)."""
    c = F.col
    base = {
        "fis_gross_margin": safe_div(c("gross_profit"), c("total_revenue")),
        "fis_operating_margin": safe_div(c("operating_income"), c("total_revenue")),
        "fis_net_margin": safe_div(c("net_income"), c("total_revenue")),
        "fis_ebit_margin": safe_div(c("ebit"), c("total_revenue")),
        "fis_ebitda_margin": safe_div(c("ebitda"), c("total_revenue")),
        "fis_sga_ratio": safe_div(z("selling_general_and_administrative"), c("total_revenue")),
        "fis_rd_ratio": safe_div(z("research_and_development"), c("total_revenue")),
        "fis_opex_ratio": safe_div(z("operating_expenses"), c("total_revenue")),
        "fis_interest_coverage": safe_div(c("ebit"), F.abs(z("interest_expense"))),
        "fis_interest_burden": safe_div(c("income_before_tax"), c("ebit")),
        "fis_financial_leverage_effect": safe_div(c("net_income"), c("income_before_tax")),
        "fis_effective_tax_rate": safe_div(z("income_tax_expense"), c("income_before_tax")),
        "fis_tax_burden": safe_div(c("net_income"), c("income_before_tax")),
        "fis_continuing_ops_ratio": safe_div(
            F.coalesce(c("net_income_from_continuing_operations"), c("net_income")), c("net_income")
        ),
        "fis_comprehensive_income_ratio": safe_div(
            F.coalesce(c("comprehensive_income_net_of_tax"), c("net_income")), c("net_income")
        ),
        "fis_ebitda_to_revenue": safe_div(c("ebitda"), c("total_revenue")),
        "fis_depreciation_ratio": safe_div(z("depreciation_and_amortization"), c("total_revenue")),
    }
    df = df.select("*", *[e.alias(n) for n, e in base.items()])
    derived = {
        "fis_revenue_qoq_pct": pct_change(c("total_revenue"), 1),
        "fis_net_income_qoq_pct": pct_change(c("net_income"), 1),
        "fis_ebitda_qoq_pct": pct_change(c("ebitda"), 1),
        "fis_revenue_yoy_pct": pct_change(c("total_revenue"), 4),
        "fis_net_income_yoy_pct": pct_change(c("net_income"), 4),
        "fis_ebitda_yoy_pct": pct_change(c("ebitda"), 4),
        "fis_revenue_volatility": rolling_std4(c("total_revenue")),
        "fis_net_income_volatility": rolling_std4(c("net_income")),
        "fis_margin_volatility": rolling_std4(c("fis_net_margin")),
        "fis_net_margin_sector_rank": sector_rank(c("fis_net_margin")),
        "fis_operating_margin_sector_rank": sector_rank(c("fis_operating_margin")),
        "fis_net_margin_industry_rank": industry_rank(c("fis_net_margin")),
        "fis_operating_margin_industry_rank": industry_rank(c("fis_operating_margin")),
    }
    df = df.select("*", *[e.alias(n) for n, e in derived.items()])
    return df.select(
        "*",
        flag(c("net_income") < 0).alias("fis_negative_net_income_flag"),
        flag(c("fis_revenue_qoq_pct") < 0).alias("fis_revenue_decline_flag"),
    )


def cash_flow_features(df: DataFrame) -> DataFrame:
    """fcf_* features (`transform_cash_flow.py:222-302`)."""
    c = F.col
    fcf = z("operating_cashflow") - F.abs(z("capital_expenditures"))
    total_fin = z("proceeds_from_issuance_of_long_term_debt") + z(
        "proceeds_from_issuance_of_common_stock"
    )
    base = {
        "fcf_free_cash_flow": fcf,
        "fcf_ocf_to_capex_ratio": safe_div(c("operating_cashflow"), F.abs(c("capital_expenditures"))),
        "fcf_cash_conversion_ratio": safe_div(c("operating_cashflow"), z("net_income")),
        "fcf_capex_intensity": safe_div(F.abs(c("capital_expenditures")), c("operating_cashflow")),
        "fcf_operating_cf_margin": safe_div(c("operating_cashflow"), z("total_revenue")),
        "fcf_investment_intensity": safe_div(F.abs(c("cashflow_from_investment")), c("operating_cashflow")),
        "fcf_capex_to_investment_ratio": safe_div(
            F.abs(c("capital_expenditures")), F.abs(c("cashflow_from_investment"))
        ),
        "fcf_debt_financing_ratio": safe_div(z("proceeds_from_issuance_of_long_term_debt"), total_fin),
        "fcf_equity_financing_ratio": safe_div(z("proceeds_from_issuance_of_common_stock"), total_fin),
        "fcf_dividend_payout_ratio": safe_div(F.abs(z("dividend_payout")), c("operating_cashflow")),
        "fcf_share_buyback_ratio": safe_div(
            F.abs(z("payments_for_repurchase_of_common_stock")), c("operating_cashflow")
        ),
        "fcf_net_financing_activity": z("cashflow_from_financing"),
    }
    df = df.select("*", *[e.alias(n) for n, e in base.items()])
    derived = {
        "fcf_operating_cf_qoq_pct": pct_change(c("operating_cashflow"), 1),
        "fcf_free_cash_flow_qoq_pct": pct_change(c("fcf_free_cash_flow"), 1),
        "fcf_operating_cf_yoy_pct": pct_change(c("operating_cashflow"), 4),
        "fcf_free_cash_flow_yoy_pct": pct_change(c("fcf_free_cash_flow"), 4),
        "fcf_capex_qoq_pct": pct_change(c("capital_expenditures"), 1),
        "fcf_cash_change_volatility": rolling_std4(c("change_in_cash_and_cash_equivalents")),
        "fcf_operating_cf_volatility": rolling_std4(c("operating_cashflow")),
        "fcf_operating_cf_sector_rank": sector_rank(c("operating_cashflow")),
        "fcf_free_cash_flow_sector_rank": sector_rank(c("fcf_free_cash_flow")),
        "fcf_operating_cf_industry_rank": industry_rank(c("operating_cashflow")),
        "fcf_free_cash_flow_industry_rank": industry_rank(c("fcf_free_cash_flow")),
    }
    df = df.select("*", *[e.alias(n) for n, e in derived.items()])
    return df.select(
        "*",
        flag(c("fcf_free_cash_flow") < 0).alias("fcf_negative_free_cash_flow_flag"),
        flag(
            (c("fcf_free_cash_flow") < 0) & (c("change_in_cash_and_cash_equivalents") < 0)
        ).alias("fcf_cash_burn_flag"),
    )
