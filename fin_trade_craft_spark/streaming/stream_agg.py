"""Structured Streaming variants of the batch aggregations
(SURVEY §2.9 stretch goal).

The reference is batch-only; its "incremental mode" is anti-join
discovery + a ledger (plans/watermarks.py). These streaming jobs
are the same *logical* aggregations as queries/windows.py
(hourly_event_rollup, signal emission) expressed over
``readStream``, with a real event-time watermark for late data —
the 7-day ``days_back`` late-arrival window of
``transform_trading_signals.py:913-946`` maps to
``withWatermark("ts", "7 days")`` at daily grain; tests use minutes
for speed.

``Trigger.AvailableNow`` turns any of these into an incremental
batch job with exactly-once file-source progress tracking — the
Spark-native replacement for the reference's staleness polling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over events-shaped parquet. ts normalization
    is schema-driven (sources.catalog.normalize_event_ts): the caller's
    ``schema`` (from a batch probe of the same files) decides whether
    ts arrives as INT64 nanos, TIMESTAMP_NTZ micros, or TimestampType —
    never a session conf, which could have been set after the schema
    was captured and disagree with it.

    ``max_files_per_trigger`` bounds a micro-batch; oracle-verified
    queries pass the TOTAL staged file count so the whole directory
    lands in ONE micro-batch — parquet parts carry no event-time
    order, so letting AvailableNow split them across micro-batches
    would let the watermark advance past (and drop) late rows that
    the batch oracle keeps."""
    from ..sources.catalog import normalize_event_ts

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return normalize_event_ts(df)


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of queries.windows.hourly_event_rollup:
    tumbling 1h window per event_type with late-data watermark.
    (approx_count_distinct replaces the exact distinct — exact
    per-user dedup in a stream needs state keyed on user.)"""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n", "n_users_approx", "total_value")
    )


def sliding_rollup_stream(
    events: DataFrame, size: str = "1 hour", slide: str = "15 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding-window rollup: each event contributes to size/slide
    overlapping windows (hour-of-activity smoothing). Same watermark
    semantics as the tumbling variant; the window assignment is
    Spark's `window(ts, size, slide)` in both batch and streaming,
    so the batch twin is the literal same expression over a static
    read (differentially tested)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_stats_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-sessionization: ``session_window(ts, gap)``
    merges events per user into dynamic sessions that close after
    ``gap`` of inactivity — the streaming twin of the batch
    lag-based sessionizer (queries/windows.user_session_stats),
    which it must agree with on session boundaries and stats
    (differential test): session start = first event, session end =
    last event + gap, so batch duration = (end − gap) − start."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def click_attribution_stream(
    views: DataFrame,
    clicks: DataFrame,
    attribution: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: each click joins the views by
    the same user in the preceding ``attribution`` window — the
    attribution shape (impression→conversion) that needs BOTH sides
    buffered in state. Watermarks on both event times bound that
    state: a view can be evicted once no on-time click can still
    match it (watermark + attribution window), which is what keeps
    a forever-running join from accumulating forever. The time-range
    predicate is what lets Spark derive that eviction bound — an
    unconstrained stream-stream join would be unbounded state."""
    v = views.select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        "value",
    ).withWatermark("click_ts", watermark)
    cond = (
        (v["user_id"] == c["c_user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {attribution}"))
    )
    return v.join(c, cond, "inner").select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts", "value"
    )


def dedup_stream(docs: DataFrame, watermark: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``queries.dedup.dedup_exact``: first-seen document per content
    hash survives; later copies are dropped even when they arrive in
    a LATER micro-batch (keyed state holds seen hashes).
    ``dropDuplicatesWithinWatermark`` bounds that state: a hash can
    be evicted once every on-time duplicate of it must have arrived,
    so state size tracks the watermark window, not corpus history —
    the property that keeps this runnable forever at ingest scale.
    Emission is append-mode immediate (no watermark-closure wait)."""
    from ..functions.text import content_hash

    hashed = docs.withColumn("content_md5", content_hash(F.col("text")))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )


def run_available_now_append(stream_df: DataFrame, checkpoint: str, out_table: str) -> list:
    """Drain in APPEND mode (for row-emitting operators like
    streaming dedup, where complete mode is unsupported)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.sql(f"SELECT * FROM {out_table}").collect()


def upsert_stream(
    stream_df: DataFrame,
    io,
    table: str,
    keys: list[str],
    checkpoint: str,
) -> None:
    """Streaming upsert sink: drain the stream with
    ``Trigger.AvailableNow`` and MERGE each micro-batch into a
    warehouse table via ``foreachBatch`` + ``TableIO.upsert`` —
    the streaming form of the reference's INSERT…ON CONFLICT (S7).
    Restart-safe: the checkpoint tracks consumed source files, and
    the key-based upsert makes a replayed batch idempotent (the
    exactly-once story for file sources). Update mode so stateful
    aggregations emit refreshed rows per batch rather than waiting
    for watermark closure."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        io.upsert(batch_df, table, keys)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def run_available_now(stream_df: DataFrame, checkpoint: str, out_table: str = "rollup") -> list:
    """Drain everything currently available (incremental batch) into
    a memory sink; returns collected rows. Complete mode so bounded
    test data emits every window (append mode only releases windows
    the advancing watermark has sealed — correct for a live stream,
    empty for a one-shot drain)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.sql(f"SELECT * FROM {out_table}").collect()
