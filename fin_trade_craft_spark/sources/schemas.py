"""Warehouse schema registry (SURVEY §2.1 S11).

Typed StructTypes for reference tables that have no transform
consuming them yet — declared here so the warehouse can create,
validate, and upsert them with the correct natural keys. Mirrors
`db/schema/postgres_stock_db_schema.sql:272-352`
(``historical_options`` / ``realtime_options``; schema-only in the
reference too — no transform reads them). Postgres DECIMAL(12,4)/
DECIMAL(8,6) maps to DecimalType with the same precision/scale;
SERIAL surrogate ids are dropped (the natural key identifies rows —
deterministic-id stance documented in domain/universe.py).

Layout guidance: options facts partition by ``expiration`` month or
``symbol_bucket`` (TableIO.with_symbol_bucket) — both make the
partition-scoped upsert prune to the touched slice.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRICE = DecimalType(12, 4)
_GREEK = DecimalType(8, 6)

_OPTION_COMMON = [
    StructField("symbol_id", IntegerType(), False),
    StructField("symbol", StringType(), False),
    StructField("contract_name", StringType(), False),
    StructField("option_type", StringType(), False),  # 'call' | 'put'
    StructField("strike", _PRICE, False),
    StructField("expiration", DateType(), False),
    StructField("last_price", _PRICE),
    StructField("mark", _PRICE),
    StructField("bid", _PRICE),
    StructField("bid_size", IntegerType()),
    StructField("ask", _PRICE),
    StructField("ask_size", IntegerType()),
    StructField("volume", LongType()),
    StructField("open_interest", LongType()),
    StructField("implied_volatility", _GREEK),
    StructField("delta", _GREEK),
    StructField("gamma", _GREEK),
    StructField("theta", _GREEK),
    StructField("vega", _GREEK),
    StructField("rho", _GREEK),
    StructField("intrinsic_value", _PRICE),
    StructField("extrinsic_value", _PRICE),
    StructField("updated_unix", LongType()),
    StructField("time_value", _PRICE),
    StructField("created_at", TimestampType()),
    StructField("updated_at", TimestampType()),
]

HISTORICAL_OPTIONS_SCHEMA = StructType(
    [*_OPTION_COMMON[:6], StructField("last_trade_date", DateType(), False), *_OPTION_COMMON[6:]]
)

REALTIME_OPTIONS_SCHEMA = StructType(
    [*_OPTION_COMMON, StructField("quote_timestamp", TimestampType())]
)

# natural keys (the reference's UNIQUE constraints) — what
# TableIO.upsert merges on
NATURAL_KEYS: dict[str, list[str]] = {
    "raw/historical_options": ["symbol_id", "contract_name", "last_trade_date"],
    "raw/realtime_options": ["symbol_id", "contract_name"],
}

SCHEMAS: dict[str, StructType] = {
    "raw/historical_options": HISTORICAL_OPTIONS_SCHEMA,
    "raw/realtime_options": REALTIME_OPTIONS_SCHEMA,
}


def validate(df, table: str) -> None:
    """Reject frames whose columns/types don't match the registered
    schema (nullable flags are layout hints, not enforced — parquet
    round-trips relax them)."""
    want = {f.name: f.dataType for f in SCHEMAS[table].fields}
    got = {f.name: f.dataType for f in df.schema.fields}
    if got != want:
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        wrong = {n: (str(got[n]), str(want[n])) for n in set(got) & set(want) if got[n] != want[n]}
        raise ValueError(
            f"schema mismatch for {table}: missing={sorted(missing)}"
            f" extra={sorted(extra)} wrong_types={wrong}"
        )
