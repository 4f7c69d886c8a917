"""Earnings-call sentiment aggregation — Spark re-expression of
``transforms/transform_earnings_sentiment_agg.py:53-170`` (A2/F2):
speaker-title ILIKE cascade → role buckets → per (symbol_id,
quarter) role-averaged sentiment, weighted management composite
(CFO 0.40 / C-Suite 0.40 / Senior-Exec 0.20), HAVING ≥1 management
statement; external/other roles excluded."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# FIRST-match cascade in the reference's own order
# (transform_earnings_sentiment_agg.py:59-101). Reference-faithful
# quirk, deliberately preserved: the bare "President" substring in the
# csuite bucket fires BEFORE the senior_exec/vp_director buckets, so a
# spelled-out "…Vice President…" title classifies as csuite (weight
# 0.40) exactly as the reference's ILIKE '%President%' does — the
# EVP/SVP/VP entries below only catch abbreviation-only titles.
ROLE_BUCKETS: list[tuple[str, tuple[str, ...]]] = [
    ("csuite", ("CEO", "Chief Executive", "President and CEO", "Chairman", "Chair",
                "Chairperson", "President")),
    ("cfo", ("CFO", "Chief Financial")),
    ("senior_exec", ("COO", "Chief Operating", "CTO", "Chief Technology", "CIO",
                     "Chief Information", "CMO", "Chief Marketing", "Chief", "EVP",
                     "Executive Vice President", "SVP", "Senior Vice President")),
    ("vp_director", ("Vice President", "VP ", "Director", "General Counsel",
                     "Secretary", "Treasurer", "Controller")),
    ("analyst_ir", ("Analyst", "Investor Relations", "IR ", "Manager")),
    ("external", ("Moderator", "Operator", "Conference")),
]


def role_category(title: Column) -> Column:
    u = F.upper(F.coalesce(title, F.lit("")))
    expr = None
    for bucket, subs in ROLE_BUCKETS:
        cond = F.lit(False)
        for s in subs:
            cond = cond | u.contains(s.upper())
        expr = F.when(cond, bucket) if expr is None else expr.when(cond, bucket)
    return expr.otherwise("other")


def sentiment_agg(transcripts: DataFrame) -> DataFrame:
    """transcripts: (symbol_id, symbol, quarter, title, sentiment,
    …) → transforms.earnings_sentiment_agg grain (symbol_id,
    quarter)."""
    base = (
        transcripts.filter(
            F.col("sentiment").isNotNull()
            & F.col("symbol_id").isNotNull()
            & F.col("quarter").isNotNull()
        )
        .select(
            "symbol_id",
            "symbol",
            "quarter",
            F.col("sentiment").cast("double").alias("sentiment"),
            role_category(F.col("title")).alias("role_category"),
        )
        .filter(~F.col("role_category").isin("external", "other"))
    )
    rc, s = F.col("role_category"), F.col("sentiment")

    def avg_r(b):
        return F.avg(F.when(rc == b, s))

    def cnt_r(b):
        return F.count(F.when(rc == b, 1)).cast("int")

    mgmt = rc.isin("csuite", "cfo", "senior_exec")
    out = base.groupBy("symbol_id", "symbol", "quarter").agg(
        avg_r("csuite").alias("sentiment_csuite"),
        avg_r("cfo").alias("sentiment_cfo"),
        avg_r("senior_exec").alias("sentiment_senior_exec"),
        avg_r("vp_director").alias("sentiment_vp_director"),
        avg_r("analyst_ir").alias("sentiment_analyst_ir"),
        F.avg(F.when(mgmt, s)).alias("sentiment_management_all"),
        (
            F.coalesce(avg_r("cfo"), F.lit(0.0)) * 0.40
            + F.coalesce(avg_r("csuite"), F.lit(0.0)) * 0.40
            + F.coalesce(avg_r("senior_exec"), F.lit(0.0)) * 0.20
        ).alias("sentiment_management_weighted"),
        cnt_r("csuite").alias("count_csuite"),
        cnt_r("cfo").alias("count_cfo"),
        cnt_r("senior_exec").alias("count_senior_exec"),
        cnt_r("vp_director").alias("count_vp_director"),
        cnt_r("analyst_ir").alias("count_analyst_ir"),
        F.count(F.when(mgmt, 1)).cast("int").alias("count_management_total"),
        F.count(F.lit(1)).cast("int").alias("count_total_statements"),
    )
    return out.filter(F.col("count_management_total") > 0)
