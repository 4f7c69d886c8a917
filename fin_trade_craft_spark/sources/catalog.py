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
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "bigint"):
            # integer DIV, not `/`: ns-since-epoch (~1.7e18) exceeds
            # double's 53-bit mantissa, so float division is off by ±1µs
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type == "timestamp_ntz":
            # driver now writes TIMESTAMP(MICROS) (naive); present as
            # session-TZ TimestampType (UTC) so downstream epoch math
            # and the DuckDB oracle agree
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
