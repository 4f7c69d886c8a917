"""Insider-transaction transforms — Spark re-expression of
``transforms/transform_insider_transactions.py`` (title
normalization U1/F1, detail table `:179-300`) and
``transform_insider_transactions_agg.py` (the 30-column
conditional-sum aggregation A1, `:52-124`).

Title parsing is pure JVM regex expressions (the reference applies
a Python function row-wise — `:281-289`); the roles array keeps the
reference's ROLE_LABELS order, and the tier logic exists in BOTH
reference variants, which disagree on purpose:

- regex tiers (detail table): word-boundary patterns,
  `transform_insider_transactions.py:33-66`
- ILIKE tiers (agg table): substring matching,
  `transform_insider_transactions_agg.py:62-68`

Both are implemented (``tier_regex`` / ``tier_ilike``) and each
table uses its own, preserving the reference's (documented)
inconsistency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_ALLOWED = 10**16 - 1  # DECIMAL(20,4) guard (`:273-278`)

TIER3_RX = r"(?i)(\bCEO\b|Chief\s+Executive\b|\bPresident\b|\bChair\b|Executive\s+Chair)"
TIER2_RX = (
    r"(?i)(\bCFO\b|\bCOO\b|\bCTO\b|\bCIO\b|\bCMO\b|\bEVP\b|\bSVP\b|"
    r"Chief\s+\w+\s+Officer|Executive\s+Vice\s+President|Senior\s+Vice\s+President)"
)
TIER1_RX = (
    r"(?i)(\bDirector\b|Vice\s+President\b|\bSecretary\b|\bTreasurer\b|"
    r"Assistant\s+Secretary|Associate\s+VP|\bController\b)"
)
OWNER_RX = r"(?i)(10%\s*Owner|Ten\s*Percent\s*Owner)"

ROLE_LABELS = [
    ("CEO", r"(?i)(\bCEO\b|Chief\s+Executive\b)"),
    ("President", r"(?i)\bPresident\b"),
    ("Chair", r"(?i)(\bChair\b|Executive\s+Chair)"),
    ("CFO", r"(?i)(\bCFO\b|Chief\s+Financial\b)"),
    ("COO", r"(?i)(\bCOO\b|Chief\s+Operating\b)"),
    ("CTO", r"(?i)(\bCTO\b|Chief\s+Technology\b)"),
    ("CIO", r"(?i)(\bCIO\b|Chief\s+Information\b)"),
    ("EVP", r"(?i)(\bEVP\b|Executive\s+Vice\s+President)"),
    ("SVP", r"(?i)(\bSVP\b|Senior\s+Vice\s+President)"),
    ("Director", r"(?i)\bDirector\b"),
    ("VP", r"(?i)Vice\s+President\b"),
    ("Secretary", r"(?i)\bSecretary\b"),
    ("Treasurer", r"(?i)\bTreasurer\b"),
    ("Controller", r"(?i)\bController\b"),
]


def clean_title(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.coalesce(col, F.lit(""))), r"\s+", " ")


def tier_regex(clean: Column) -> Column:
    """Word-boundary tier (detail-table variant): max of matched
    tiers, 0 if none."""
    return (
        F.when(clean.rlike(TIER3_RX), 3)
        .when(clean.rlike(TIER2_RX), 2)
        .when(clean.rlike(TIER1_RX), 1)
        .otherwise(0)
    )


def tier_ilike(title: Column) -> Column:
    """Substring tier (agg-table variant,
    transform_insider_transactions_agg.py:62-68)."""
    u = F.upper(F.coalesce(title, F.lit("")))

    def has(*subs: str) -> Column:
        c = F.lit(False)
        for s in subs:
            c = c | u.contains(s.upper())
        return c

    return (
        F.when(has("CEO", "President", "Chair"), 3)
        .when(has("CFO", "COO", "CTO", "CIO", "CMO", "EVP", "SVP", "Chief", "Executive Vice"), 2)
        .when(has("Director", "Vice President", "Secretary", "Treasurer", "Controller", "VP"), 1)
        .otherwise(0)
    )


def is_owner_10pct(clean: Column) -> Column:
    return clean.rlike(OWNER_RX)


def standardized_roles(clean: Column) -> Column:
    """Ordered, deduped role-label array (`find_roles`)."""
    parts = [F.when(clean.rlike(rx), F.lit(label)) for label, rx in ROLE_LABELS]
    return F.array_compact(F.array(*parts))


def _nan_to_null(col: Column) -> Column:
    """Missing may arrive as NULL (engine-native) or NaN (pandas /
    parquet round-trips) — normalize to NULL."""
    return F.nanvl(col.cast("double"), F.lit(None).cast("double"))


def _overflow_null(col: Column) -> Column:
    return F.when(F.abs(col) <= MAX_ALLOWED, col)


def normalize_titles(df: DataFrame, title_col: str = "insider_title") -> DataFrame:
    """U1: struct-expansion of normalize_title (`:133-158`)."""
    clean = clean_title(F.col(title_col))
    return df.select(
        "*",
        F.coalesce(F.col(title_col), F.lit("")).alias("executive_title_raw"),
        clean.alias("executive_title_clean"),
        standardized_roles(clean).alias("standardized_roles"),
        tier_regex(clean).alias("seniority_tier"),
        is_owner_10pct(clean).alias("is_owner_10pct"),
    )


def detail_table(raw: DataFrame) -> DataFrame:
    """transforms.insider_transactions: normalized titles +
    overflow-guarded transaction_value (`:255-300`)."""
    df = normalize_titles(raw)
    shares = _overflow_null(_nan_to_null(F.col("shares")))
    price = _overflow_null(_nan_to_null(F.col("price_per_share")))
    value = _overflow_null(shares * price)
    return df.select(
        "*",
        shares.alias("shares_clean"),
        price.alias("price_clean"),
        value.alias("transaction_value"),
    )


def daily_agg(raw: DataFrame) -> DataFrame:
    """transforms.insider_transactions_agg: per (symbol_id, symbol,
    transaction_date), 30 conditional aggregates
    (transform_insider_transactions_agg.py:52-124)."""
    raw = raw.withColumn("shares", _nan_to_null(F.col("shares"))).withColumn(
        "price_per_share", _nan_to_null(F.col("price_per_share"))
    )
    base = raw.filter(
        F.col("symbol").isNotNull()
        & F.col("transaction_date").isNotNull()
        & F.col("shares").isNotNull()
    ).select(
        "symbol_id",
        "symbol",
        "transaction_date",
        "transaction_type",
        "shares",
        "price_per_share",
        tier_ilike(F.col("insider_title")).alias("tier"),
        # looser than the detail table's OWNER_RX on purpose: the
        # reference's AGG re-derives ownership with ILIKE
        # '%10%%Owner%' (transform_insider_transactions_agg.py:68) —
        # '10' ANYWHERE before 'Owner' — while its detail table uses
        # the tight '10%\\s*Owner' pattern, so the two reference
        # tables can disagree on the same title and this engine
        # reproduces that disagreement faithfully
        (
            F.upper(F.coalesce(F.col("insider_title"), F.lit(""))).rlike("10.*OWNER")
            | F.upper(F.coalesce(F.col("insider_title"), F.lit(""))).rlike("TEN PERCENT.*OWNER")
        ).alias("is_owner_10pct"),
        (F.col("shares") * F.col("price_per_share")).cast("double").alias("transaction_value"),
    )

    def ssum(cond: Column) -> Column:
        # exact decimal accumulation — shares are NUMERIC(20,4) in
        # the reference and Postgres sums them exactly
        s = F.sum(F.when(cond, F.col("shares").cast("decimal(24,4)")).otherwise(F.lit(0)))
        return F.coalesce(s, F.lit(0)).cast("bigint")

    def vsum(cond: Column) -> Column:
        return F.coalesce(
            F.sum(F.when(cond, F.col("transaction_value")).otherwise(F.lit(0.0))), F.lit(0.0)
        ).cast("double")

    t, tier, owner = F.col("transaction_type"), F.col("tier"), F.col("is_owner_10pct")
    aggs = []
    for ty in ("d", "a"):
        is_t = t == ty.upper()
        aggs += [ssum(is_t).alias(f"total_shares_{ty}")]
        aggs += [ssum(is_t & (tier == k)).alias(f"total_shares_{ty}_tier_{k}") for k in range(4)]
        aggs += [ssum(is_t & owner).alias(f"total_shares_{ty}_10pct_owner")]
        aggs += [vsum(is_t).alias(f"total_value_{ty}")]
        aggs += [vsum(is_t & (tier == k)).alias(f"total_value_{ty}_tier_{k}") for k in range(4)]
        aggs += [vsum(is_t & owner).alias(f"total_value_{ty}_10pct_owner")]
    aggs += [
        F.avg(F.when(t == "D", F.col("price_per_share"))).alias("avg_price_d"),
        F.avg(F.when(t == "A", F.col("price_per_share"))).alias("avg_price_a"),
        F.count(F.when(t == "D", 1)).alias("transaction_count_d"),
        F.count(F.when(t == "A", 1)).alias("transaction_count_a"),
        F.count(F.when((t == "D") & owner, 1)).alias("transaction_count_d_10pct"),
        F.count(F.when((t == "A") & owner, 1)).alias("transaction_count_a_10pct"),
    ]
    return base.groupBy("symbol_id", "symbol", "transaction_date").agg(*aggs)
