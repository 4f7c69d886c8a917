"""TableIO — parquet-warehouse storage idioms (SURVEY §2.1 S4-S12).

The reference's write surface is Postgres: batch INSERT (S6),
INSERT…ON CONFLICT upsert (S7), delete-then-insert partition
replace (S8), CTAS (S9), ALTER ADD COLUMN (S10), UPDATE-by-key
(S12). On a parquet warehouse those become:

- append          → ``mode("append")``
- overwrite       → ``mode("overwrite")`` (CTAS)
- replace_where   → dynamic partition overwrite of the matching
                    partition keys (the delete+insert idiom)
- upsert          → anti-join old rows on the natural key + union +
                    rewrite (Delta MERGE semantics on plain parquet)
- update_by_key   → upsert restricted to existing rows

Plain parquet was chosen because Delta isn't in this environment;
the interface is Delta-shaped so a MERGE-backed implementation can
swap in. At cluster scale, ``replace_where`` with a partitioned
layout touches only affected partitions; upsert rewrites the table
(documented cost — Delta/Iceberg is the real answer there).

Layout guidance (SURVEY §4.2.5): facts partitioned by a bucket of
the entity key (``symbol_bucket = hash(symbol_id) % N``), sorted
within partitions by date; dims unpartitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")

    def path(self, table: str) -> str:
        return f"{self.warehouse}/{table.replace('.', '/')}"

    def exists(self, table: str) -> bool:
        from py4j.protocol import Py4JJavaError

        try:
            self.spark.read.parquet(self.path(table)).schema
            return True
        except Exception:
            return False

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def replace_where(self, df: DataFrame, table: str, partition_by: list[str]) -> None:
        """Partition replace (S8): overwrite ONLY the partitions
        present in ``df`` — the delete-symbol-then-insert idiom.
        Requires the table to be partitioned by ``partition_by``."""
        conf = "spark.sql.sources.partitionOverwriteMode"
        old = self.spark.conf.get(conf, "static")
        self.spark.conf.set(conf, "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(self.path(table))
        finally:
            self.spark.conf.set(conf, old)

    def upsert(self, df: DataFrame, table: str, keys: list[str], partition_by: list[str] | None = None) -> None:
        """S7: new rows win on the natural key (ON CONFLICT DO
        UPDATE). Anti-join keeps non-colliding old rows; plain
        parquet requires a full rewrite (Delta MERGE would be
        in-place)."""
        if not self.exists(table):
            self.overwrite(df, table, partition_by)
            return
        old = self.read(table)
        kept = old.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(df, allowMissingColumns=True)
        # write to a temp location first: the merged plan reads the
        # table being overwritten
        tmp = self.path(table) + "__tmp"
        w = merged.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        final = self.spark.read.parquet(tmp)
        w2 = final.write.mode("overwrite")
        if partition_by:
            w2 = w2.partitionBy(*partition_by)
        w2.parquet(self.path(table))

    def with_symbol_bucket(self, df: DataFrame, key: str = "symbol_id", n_buckets: int = 64) -> DataFrame:
        """Deterministic bucket column for partition layout."""
        return df.withColumn("symbol_bucket", F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))

    def add_columns(self, table: str, exprs: dict[str, F.Column]) -> None:
        """S10 (ALTER TABLE ADD COLUMN + incremental fill) as a
        full-column recompute — SURVEY §7's preferred stance: the
        reference widens the table with NULLs then back-fills rows
        piecemeal (`transform_balance_sheet.py:74-97`), which leaves
        mixed NULL/filled states; recomputing the whole column from
        an expression is idempotent and one pass. New columns may
        reference existing ones."""
        df = self.read(table)
        for name, expr in exprs.items():
            df = df.withColumn(name, expr)
        tmp = self.path(table) + "__tmp"
        df.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path(table))

    def compact(self, table: str, target_partitions: int, partition_by: list[str] | None = None) -> int:
        """Small-file compaction: rewrite the table at a target file
        count. Incremental appends (S6) and streaming sinks
        accumulate files far smaller than a scan-efficient split
        (~128 MB); metadata and open-cost then dominate reads. At
        cluster scale this is OPTIMIZE / rewriteDataFiles; on plain
        parquet it's a coalesce-and-rewrite. Returns the file count
        before compaction."""
        import pathlib

        before = len(list(pathlib.Path(self.path(table)).rglob("*.parquet")))
        df = self.read(table).coalesce(target_partitions)
        tmp = self.path(table) + "__tmp"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        final = self.spark.read.parquet(tmp)
        w2 = final.write.mode("overwrite")
        if partition_by:
            w2 = w2.partitionBy(*partition_by)
        w2.parquet(self.path(table))
        return before
