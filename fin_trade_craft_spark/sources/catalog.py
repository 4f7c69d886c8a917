"""Table catalog over the driver-generated parquet test tables.

Reference parity: the reference's catalog is a Postgres schema
(`db/postgres_database_manager.py:121-129` does `pd.read_sql` table
scans — SURVEY §2.1 S1). Here a "table scan" is a parquet read that
Catalyst can push filters into and prune columns from; at cluster
scale the same loader points at a partitioned warehouse instead of a
flat directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Filters/projections applied by callers
    are pushed into the parquet scan by Catalyst (verify with
    ``.explain`` → PushedFilters / ReadSchema).

    ``events.ts`` has been written by the driver as either parquet
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    as long via nanosAsLong and truncate to microseconds, matching
    DuckDB's ``CAST(ts AS TIMESTAMP)``) or TIMESTAMP(MICROS) (read
    natively). Detect which from the loaded type so both driver data
    generations work.
    """
    # The driver hands us ITS session — pin the runtime confs our
    # semantics depend on (UTC keeps collected timestamps identical
    # to the oracle's naive parquet values; non-ANSI division gives
    # the engine's documented NULL-on-zero-divisor semantics instead
    # of Spark 4's default ANSI exception).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ TimestampType regardless
    of which physical parquet type the driver wrote. Schema-driven —
    the decision keys on the type the column actually loaded as, never
    on a session conf (a conf set mid-session after a schema was
    captured silently changes what "ts" means; see round-2 verdict).

    - LongType  → INT64 nanos read under ``nanosAsLong``; integer DIV,
      not `/`: ns-since-epoch (~1.7e18) exceeds double's 53-bit
      mantissa, so float division is off by ±1µs.
    - TIMESTAMP_NTZ → parquet TIMESTAMP(MICROS) (naive); present as
      session-TZ TimestampType (UTC) so downstream epoch math and the
      DuckDB oracle agree.
    - TimestampType → already what we want.
    - anything else → fail fast with the loaded type named, instead of
      letting a bad ts type surface later as confusing epoch math.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(ts_type, TimestampType):
        return df
    raise TypeError(
        f"events.ts loaded as {ts_type.simpleString()}; expected INT64 nanos "
        "(long under nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP — the parquet "
        "was written with an unsupported ts encoding"
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
