"""Symbol-universe construction — Spark re-expression of
``transforms/transform_load_symbol_universe.py:305-331`` (J8
semi-join universe filter, P2 eligibility predicates, F15 universe
ids).

The reference's universe id is a random 6-digit number with a
uniqueness-retry loop (`:51-105`); randomness is incidental, not
semantic (SURVEY §7.5), so here the id is a deterministic hash of
the universe name + predicate fingerprint — stable across runs and
executors, no retry loop."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def universe_id(name: str, fingerprint: str = "") -> int:
    """Deterministic 6-digit universe id (F15 divergence doc'd)."""
    import hashlib

    h = hashlib.md5(f"{name}:{fingerprint}".encode()).hexdigest()
    return 100000 + int(h[:8], 16) % 900000


def build_universe(
    company_master: DataFrame,
    qualifying_cash_flow: DataFrame,
    name: str,
    ipo_before: str = "2020-01-01",
    min_net_income: float = 1_000_000_000.0,
    min_price_rows: int = 500,
    min_statements: int = 5,
) -> DataFrame:
    """The reference's flagship universe query: eligibility
    predicates + coverage counts + a semi-join on symbols with a
    ≥$1B-net-income annual filing in the lookback year."""
    c = F.col
    eligible = company_master.filter(
        (c("ipo_date") < F.lit(ipo_before))
        & (c("status") == "Active")
        & (c("asset_type") == "Stock")
        & c("description").isNotNull()
        & c("industry").isNotNull()
        & c("sector").isNotNull()
        & (
            (c("balance_sheet_count") > min_statements)
            | (c("income_statement_count") > min_statements)
            | (
                (c("cash_flow_count") > min_statements)
                & (c("earnings_call_transcript_count") > min_statements)
            )
        )
        & (c("time_series_daily_adjusted_count") > min_price_rows)
    )
    qualifying = qualifying_cash_flow.filter(
        (c("report_type") == "annual")
        & (c("fiscal_date_ending") >= F.add_months(F.lit(ipo_before).cast("date"), -12))
        & (c("fiscal_date_ending") < F.lit(ipo_before))
        & (c("net_income") >= min_net_income)
    ).select("symbol")
    out = eligible.join(qualifying, "symbol", "left_semi").select(
        "symbol", "exchange", "asset_type"
    )
    # every selection parameter belongs in the fingerprint — two
    # universes differing only in min_statements must not collide
    uid = universe_id(
        name, f"{ipo_before}:{min_net_income}:{min_price_rows}:{min_statements}"
    )
    return out.withColumn("universe_id", F.lit(uid)).withColumn("universe_name", F.lit(name))
