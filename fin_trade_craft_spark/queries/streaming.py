"""Driver queries for the Structured Streaming operators (§2.9) —
each runs the REAL streaming job (``readStream`` file source,
event-time watermark, ``Trigger.AvailableNow`` drain into a memory
sink) and returns the sink as a DataFrame, so the driver's DuckDB
oracle verifies STREAMING output against batch SQL semantics. This
upgrades §2.9 from pytest-only evidence to full value-oracle rows:
an AvailableNow drain over a static parquet directory is
deterministic (same files, same watermark trajectory), which is what
makes a bit-exact oracle legitimate here.

Per-call hygiene: fresh checkpoint dir + unique memory-sink name, so
repeated driver invocations in one session never collide; the events
file is staged into a temp dir because a file-source stream reads a
DIRECTORY (symlinks only — no data copied).

Scale notes: these are the same jobs a cluster would run against an
object-store landing zone; AvailableNow gives incremental
exactly-once file progress (the Spark-native form of the reference's
staleness polling), watermarks bound aggregation/join/dedup state,
and the memory sink is test-only — production sinks are the
parquet/foreachBatch upsert sinks in streaming/stream_agg.py.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType as T_IntegerType
from pyspark.sql.types import LongType as T_LongType

from ..streaming.stream_agg import read_events_stream


def _stage_dir(sf_dir: str, name: str) -> tuple[str, int]:
    """Symlink <sf_dir>/<name>.parquet (file or directory of parts)
    into a fresh temp dir usable as a file-source stream path.
    Returns (dir, n_files) so callers can size maxFilesPerTrigger to
    swallow the whole directory in one micro-batch — parts carry no
    event-time order, so a multi-micro-batch split could advance the
    watermark past late rows the batch oracle keeps."""
    # resolve() — a RELATIVE sf_dir would otherwise produce symlinks
    # that dangle from inside the temp dir, and a file-source stream
    # over dangling links SILENTLY yields zero rows (caught by the
    # sf5 replica sweep, which passes ".testdata/sf5")
    src = (Path(sf_dir.rstrip("/")) / f"{name}.parquet").resolve()
    d = Path(tempfile.mkdtemp(prefix=f"stream_{name}_"))
    if src.is_dir():
        parts = sorted(src.glob("*.parquet"))
        for i, part in enumerate(parts):
            (d / f"part_{i}.parquet").symlink_to(part.resolve())
        n = len(parts)
    else:
        (d / f"{name}.parquet").symlink_to(src)
        n = 1
    staged = sorted(d.glob("*.parquet"))
    if n == 0 or not all(p.exists() for p in staged):
        raise FileNotFoundError(f"staging {src} -> {d} produced no readable files")
    return str(d), n


def _events_stream_time_ordered(
    spark: SparkSession, sf_dir: str, n_batches: int = 2
) -> DataFrame:
    """Stage the events table as ``n_batches`` TIME-ORDERED parquet
    files — a global split at ts quantiles, mtimes pinned so the
    file source delivers them oldest-first — and stream them ONE
    file per trigger. Each micro-batch then holds a contiguous time
    slice (every bar in batch k precedes every bar in batch k+1, per
    key and globally), so a stateful query exercises cross-batch
    state carriage INSIDE the value-oracled path (r09 verdict task
    4: the zone machine's oracle previously held only for a
    single-batch drain) while the ordered-replay oracle stays
    bit-exact: per-key fold order is identical to the one-batch
    sort. Same staging discipline as streaming_corpus_ingest's
    id-ordered arrivals, with time as the arrival axis."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    df = spark.read.parquet(src)
    schema = df.schema
    # one scalar-row job computes every split point; ts may be
    # INT64-nanos (already numeric) or a timestamp flavor
    # (TIMESTAMP/TIMESTAMP_NTZ reject a direct double cast — go
    # through unix_micros, monotone either way)
    if isinstance(schema["ts"].dataType, (T_LongType, T_IntegerType)):
        key_sql = "CAST(ts AS DOUBLE)"
    else:
        key_sql = "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE)"
    key = F.expr(key_sql)
    qs = [i / n_batches for i in range(1, n_batches)]
    cuts = df.agg(
        *[F.expr(f"percentile({key_sql}, {q})").alias(f"c{i}") for i, q in enumerate(qs)]
    ).collect()[0]
    bounds = [None, *[cuts[f"c{i}"] for i in range(len(qs))], None]
    out = Path(tempfile.mkdtemp(prefix="stream_events_scratch_"))
    stage = Path(tempfile.mkdtemp(prefix="stream_events_ordered_"))
    for i in range(n_batches):
        part = df
        if bounds[i] is not None:
            part = part.filter(key >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(key < F.lit(bounds[i + 1]))
        part.coalesce(1).write.parquet(str(out / f"b{i}"))
        src_part = next((out / f"b{i}").glob("*.parquet"))
        dst = stage / f"batch_{i}.parquet"
        # MOVE (not symlink): Java lastModified follows symlinks, so
        # only a moved file's own pinned mtime controls batch order
        os.rename(src_part, dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    staged = sorted(stage.glob("*.parquet"))
    if len(staged) != n_batches or not all(p.exists() for p in staged):
        raise FileNotFoundError(f"time-ordered staging produced {staged}")
    return read_events_stream(spark, str(stage), schema, max_files_per_trigger=1)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema probe via batch read; nanosAsLong first so a nanos-typed
    # file probes as long (normalize_event_ts handles either)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    schema = spark.read.parquet(src).schema
    staged, n_files = _stage_dir(sf_dir, "events")
    return read_events_stream(spark, staged, schema, max_files_per_trigger=n_files)


def _drain(stream_df: DataFrame, mode: str) -> DataFrame:
    """AvailableNow drain into a uniquely-named memory sink; returns
    the sink table (NOT collected — the driver does that)."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # awaitTermination returns False on timeout without raising —
        # reading the sink now would silently return PARTIAL results
        q.stop()
        raise TimeoutError(f"streaming drain into {name} exceeded 300s")
    return stream_df.sparkSession.table(name)


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window rollup (W-windowed agg over
    ``readStream`` with a 2h watermark), drained AvailableNow —
    oracle is plain batch GROUP BY date_trunc('hour'). Streaming twin
    of queries/windows.hourly_event_rollup (reference analog:
    transform_trading_signals.py incremental daily rollups)."""
    ev = _events_stream(spark, sf_dir)
    rolled = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n", "total_value")
    )
    return _drain(rolled, "complete").orderBy("hour", "event_type")


ORACLE_STREAMING_HOURLY_ROLLUP = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-sessionization via ``session_window(ts, 30 min)``
    — dynamic merging session state per user — verified against the
    INDEPENDENT batch formulation (lag-based island sessionizer) as
    SQL: session_start = first event, session_end = last event + gap.
    The two agree whenever no inter-event gap is exactly the 30-min
    boundary (session_window's end is exclusive; the lag sessionizer
    keeps `diff == gap` together) — true for this data's microsecond
    timestamps, and the kind of boundary contract the docstring of
    streaming/stream_agg.session_stats_stream spells out."""
    ev = _events_stream(spark, sf_dir)
    sess = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
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
    return _drain(sess, "complete").orderBy("user_id", "session_start")


ORACLE_STREAMING_SESSION_STATS = """
WITH t AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
    CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
           OR epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM t
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def streaming_dedup_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on
    the normalized content hash over a documents stream — keyed state
    crosses micro-batches, watermark bounds it. WHICH doc survives
    per hash is a first-arrival race, so the driver-compared output
    is the surviving HASH SET (deterministic ≡ batch DISTINCT md5),
    not the arbitrary winner rows."""
    from ..functions.text import content_hash

    docs_schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet").schema
    staged, n_files = _stage_dir(sf_dir, "documents")
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", n_files)
        .parquet(staged)
        .withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .withColumn("content_md5", content_hash(F.col("text")))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["content_md5"]
    )
    out = _drain(deduped.select("content_md5"), "append")
    return out.orderBy("content_md5")


ORACLE_STREAMING_DEDUP_HASHES = r"""
SELECT DISTINCT md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_md5
FROM documents
ORDER BY content_md5
"""


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: clicks join views by the same
    user within a preceding 1h attribution window, both sides
    watermarked (the time-range predicate is what lets Spark bound
    the buffered state). Drained AvailableNow; oracle is the
    identical interval join in batch SQL — the inner join's result
    set is order-free and exactly reproducible."""
    ev = _events_stream(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    ).withWatermark("view_ts", "2 hours")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", "2 hours")
    joined = v.join(
        c,
        (v["user_id"] == c["c_user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr("INTERVAL 1 hour")),
        "inner",
    ).select("user_id", "view_id", "view_ts", "click_id", "click_ts")
    return _drain(joined, "append").orderBy("user_id", "view_id", "click_id")


ORACLE_STREAMING_CLICK_ATTRIBUTION = """
WITH v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
)
SELECT v.user_id, view_id, view_ts, click_id, click_ts
FROM v JOIN c ON v.user_id = c.user_id
 AND click_ts >= view_ts
 AND click_ts <= view_ts + INTERVAL 1 HOUR
ORDER BY v.user_id, view_id, click_id
"""


def streaming_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING-window rollup (1h window / 15min slide —
    every event lands in exactly 4 overlapping windows). The oracle
    reconstructs Spark's epoch-aligned window assignment
    independently in SQL: the k-th containing window starts at
    time_bucket(15min, ts) − k·15min, k ∈ 0..3 (both engines align
    the 15-minute grid to the epoch midnight)."""
    ev = _events_stream(spark, sf_dir)
    rolled = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
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
    return _drain(rolled, "complete").orderBy("win_start", "event_type")


ORACLE_STREAMING_SLIDING_ROLLUP = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
           - k * INTERVAL 15 MINUTE AS win_start,
         event_type, value
  FROM events, LATERAL (SELECT unnest(range(0, 4)) AS k)
)
SELECT win_start,
       win_start + INTERVAL 1 HOUR AS win_end,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


def streaming_zone_signals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The W18 RSI-zone state machine as a TRUE streaming operator:
    ``applyInPandasWithState`` holds per-user zone state across
    micro-batches. Events stand in for the price series: the 30/70
    zone machine runs on ``value`` directly, with ``bar =
    unix_micros(ts)`` as the (unique per user — verified) event-time
    sort key, so per-batch folding is deterministic.

    Value-oracled since r9; since r10 the oracle covers CROSS-BATCH
    state carriage too. The state machine itself is not SQL, but its
    OUTPUT is — the de-stating proof for the batch twin
    (operators/signals.zone_confirmation_signals: a fire requires
    ``prev_rsi <= 30``, which itself forces the zone flag at the
    previous row, so the flags carry no information the lag doesn't)
    applies verbatim to the streamed fold. The events arrive via
    ``_events_stream_time_ordered`` as TWO time-sliced micro-batches
    (every bar in batch 0 precedes every bar in batch 1), so a zone
    entered in batch 0 must SURVIVE the state store to fire in
    batch 1 — and because per-key fold order across the two batches
    equals the one-batch sort, the LAG-based SQL below remains a
    bit-exact oracle of the multi-batch run (r09 verdict task 4).
    tests/test_streaming_stateful.py additionally drives the fold
    file-by-file with golden series."""
    from ..streaming.stateful_signals import zone_signals_stateful

    ev = _events_stream_time_ordered(spark, sf_dir, n_batches=2)
    bars = ev.select(
        F.col("user_id").alias("symbol_id"),
        F.unix_micros("ts").alias("bar"),
        F.col("value").alias("rsi"),
    )
    return _drain(zone_signals_stateful(bars), "append").orderBy("symbol_id", "bar")


ORACLE_STREAMING_ZONE_SIGNALS_STATEFUL = """
WITH b AS (
  SELECT user_id AS symbol_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS bar,
         CAST(value AS DOUBLE) AS rsi
  FROM events
  -- mirror the stateful fold's skip set exactly: _fold drops NULL
  -- AND NaN rows without touching prev_rsi, while DuckDB orders NaN
  -- above all values (and, unlike IEEE, evaluates NaN = NaN as TRUE)
  -- — an unguarded NaN would make LAG(rsi) >= 70 true and fire a
  -- spurious sell here (ADVICE r09).
  WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
), x AS (
  SELECT symbol_id, bar, rsi,
    (LAG(rsi) OVER w <= 30 AND rsi > 30 AND rsi < 70) AS buy_signal,
    (LAG(rsi) OVER w >= 70 AND rsi < 70 AND rsi > 30) AS sell_signal
  FROM b
  WINDOW w AS (PARTITION BY symbol_id ORDER BY bar)
)
SELECT symbol_id, bar, rsi, buy_signal, sell_signal,
       CASE WHEN buy_signal THEN rsi ELSE 100.0 - rsi END AS signal_strength
FROM x WHERE buy_signal OR sell_signal
ORDER BY symbol_id, bar
"""


def streaming_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of queries/windows.event_mix_drift — the
    drift tripwire wired the way production runs it: the STREAM
    maintains the windowed per-(hour, type) counts incrementally
    (the only input-sized work); the hour-over-hour total-variation
    post-stage runs on the drained aggregate, which is
    |hours|·|types| rows no matter how much raw traffic flowed.
    Same integer-numerator TVD, same oracle as the batch twin."""
    from .windows import tvd_drift_from_counts

    ev = _events_stream(spark, sf_dir)
    rolled = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("win.start").alias("hour"), "event_type", "c")
    )
    return tvd_drift_from_counts(_drain(rolled, "complete"))


# identical contract to the batch twin — one source of truth
from .windows import ORACLE_EVENT_MIX_DRIFT as ORACLE_STREAMING_MIX_DRIFT  # noqa: E402


def streaming_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard — complete-mode per-user running totals
    (the unbounded aggregation only complete/update modes can hold),
    drained AvailableNow and ranked to a top-10 AFTER the drain: the
    rank is a view over the maintained state, recomputed per emit,
    which is exactly how a live leaderboard serves (the stream
    maintains |users| rows of state; ranking state is never itself
    streamed). Deterministic tie-break on user_id; oracle is the
    batch GROUP BY + rank."""
    from pyspark.sql import Window

    ev = _events_stream(spark, sf_dir)
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        F.count(F.lit(1)).alias("n_events"),
    )
    drained = _drain(totals, "complete")
    w = Window.orderBy(F.desc("total_spend"), F.asc("user_id"))
    return (
        drained.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("rank", "user_id", "total_spend", "n_events")
    )


ORACLE_STREAMING_TOP_SPENDERS = """
SELECT rank, user_id, total_spend, n_events FROM (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         COUNT(*) AS n_events,
         ROW_NUMBER() OVER (ORDER BY CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) DESC,
                            user_id) AS rank
  FROM events GROUP BY user_id
) WHERE rank <= 10
"""


def streaming_segment_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC dimension enrichment — the most common
    production streaming shape: the event stream broadcast-joins
    the (batch) customer dimension per micro-batch, then maintains
    per-(market segment, event type) running totals. The static
    side is planned as a broadcast into each micro-batch, so the
    stream is never shuffled for the join — only for its own
    aggregation state. Oracle: the identical batch join+rollup."""
    from ..sources.catalog import load_table

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id")
    rolled = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    return _drain(rolled, "complete").orderBy("c_mktsegment", "event_type")


ORACLE_STREAMING_SEGMENT_ACTIVITY = """
SELECT c_mktsegment, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
ORDER BY c_mktsegment, event_type
"""


def streaming_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous semantic-dedup ingest as a REAL streaming job —
    the production form of ``incremental_semdedup_ingest``: the new
    (odd-id) vectors ARRIVE as a file-source stream in TWO id-ordered
    micro-batches (maxFilesPerTrigger=1; file mtimes pin the order),
    and each ``foreachBatch`` probes a GROWING probe store — the
    even-id corpus pre-assigned to its k-means cells plus every
    previously-arrived odd vector — then appends its own batch to
    the store. State genuinely crosses micro-batches: a batch-2
    vector's duplicates include batch-1 arrivals.

    Because the files are split at the median odd id,
    "arrived in an earlier batch" coincides with "smaller id", so
    the result is VALUE-IDENTICAL to the batch incremental query and
    verifies against the SAME DuckDB oracle — bit-exact streaming
    evidence, not just a rows-only drain. Exact fixed-point cosines
    make the equality independent of partitioning inside each batch.

    Scale shape: the store is a TableIO parquet table (at 100 TB:
    partitioned by cell → each micro-batch's probe is partition
    pruning + per-cell joins); probe cost per batch ∝ batch × cell
    population, the same contract the batch query pins in tests."""
    import numpy as np

    from ..operators import similarity as S
    from ..sources.catalog import load_table
    from ..sources.io import TableIO
    from .similarity import SEMDEDUP_THETA, _cell_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    # cell contract from the active quantizer tier, trained on the
    # existing (even-id) half only — same as the batch twin
    cells = _cell_assignments(spark, sf_dir, where=F.col("vec_id") % 2 == 0)
    with_cells = emb.select("vec_id", "embedding").join(cells, "vec_id")

    wh = tempfile.mkdtemp(prefix="stream_semdedup_")
    io = TableIO(spark, wh)
    # seed the probe store with the existing (even-id) corpus
    io.overwrite(with_cells.filter(F.col("vec_id") % 2 == 0), "probe_store")

    # stage the arriving batch as two id-ordered parquet files. The
    # split point is ONE scalar aggregate — any deterministic id
    # boundary preserves the "arrived earlier ⟺ smaller id"
    # invariant the oracle equality rests on, so the driver never
    # collects the batch's ids (the r05 verdict's staging nit: at
    # real batch sizes the old id-list collect was corpus-sized).
    odd = with_cells.filter(F.col("vec_id") % 2 == 1).localCheckpoint(eager=True)
    median = odd.agg(F.expr("percentile(vec_id, 0.5)").alias("m")).collect()[0]["m"]
    arrivals = Path(tempfile.mkdtemp(prefix="stream_semdedup_arrivals_"))
    odd.filter(F.col("vec_id") < median).coalesce(1).write.parquet(str(arrivals / "b0"))
    odd.filter(F.col("vec_id") >= median).coalesce(1).write.parquet(str(arrivals / "b1"))
    stage = Path(tempfile.mkdtemp(prefix="stream_semdedup_src_"))
    for i, sub in enumerate(("b0", "b1")):
        part = next((arrivals / sub).glob("*.parquet"))
        dst = stage / f"batch_{i}.parquet"
        # MOVE (not symlink) so the utime below lands on the file the
        # stream source actually stats — Java lastModified FOLLOWS
        # symlinks, so pinning a link's own mtime would leave batch
        # order to the incidental (possibly tied) write timestamps
        os.rename(part, dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    cos = S.cosine(S.dot_exact("e1", "e2"), S.norm2_exact("e1"), S.norm2_exact("e2"))

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.localCheckpoint(eager=True)
        store = io.read("probe_store")
        new_side = b.select(
            F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"), "cell"
        )
        prior = store.select(
            F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), "cell"
        )
        # store members (even ids + earlier batches) + same-batch
        # earlier ids — together exactly "even OR smaller odd id"
        cand = prior.join(new_side, "cell").filter(
            (F.col("d1") % 2 == 0) | (F.col("d1") < F.col("d2"))
        )
        same = (
            b.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), "cell")
            .join(new_side, "cell")
            .filter(F.col("d1") < F.col("d2"))
        )
        pairs = cand.unionByName(same)
        matches = (
            pairs.filter(cos >= F.lit(SEMDEDUP_THETA))
            .groupBy("d2")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = (
            b.join(matches, b.vec_id == matches.d2, "left")
            .select(
                "vec_id",
                "cell",
                F.coalesce("n", F.lit(0)).alias("n_dup_matches"),
                (F.coalesce("n", F.lit(0)) == 0).alias("ingested"),
            )
        )
        io.append(out, "results")
        io.append(b, "probe_store")  # later batches probe this one

    schema = odd.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_semdedup_")
    q = (
        stream.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_semdedup_ingest drain timed out")
    return io.read("results").orderBy("vec_id")


def streaming_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus CURATION as a real streaming job — the
    streaming form of the ``corpus_build_ingest`` capstone: new
    documents (odd ids) ARRIVE as a file-source stream in TWO
    id-ordered micro-batches; each ``foreachBatch`` runs the full
    probe ladder against GROWING stores —

    - hash_store: content hashes of every doc seen (exact tier);
    - sig_store: shingle sets + MinHash signatures of the stage-2
      partner set (existing near-dup canonicals + arrived batch
      stage-1 survivors);
    - sem_store: (vector, even-trained cell) of the stage-3 partner
      set (existing semantic representatives + arrived batch
      stage-2 survivors);

    — appends its own survivors to each store, and records the
    keep decision. After the drain, the manifest FINALIZE step
    computes the combined-mass mixture weights and append-mode
    shards over all recorded decisions — exactly the batch
    capstone's stages 5/6.

    Because micro-batches are id-ordered, "arrived earlier ⟺
    smaller id", so every probe reproduces the batch query's
    deterministic first-wins contracts and the result is
    VALUE-IDENTICAL to ``corpus_build_ingest`` — it registers the
    SAME DuckDB oracle verbatim: bit-exact streaming evidence for
    the whole curation ladder, not a rows-only drain. (Exact
    fixed-point cosines and integer Jaccard make the equality
    independent of partitioning within each batch.)

    Scale shape: the stores are TableIO parquet tables (at 100 TB:
    hash/signature stores partitioned by key prefix, the vector
    store by cell → each batch's probes are partition pruning +
    per-key joins); per-batch probe cost ∝ batch, the historical
    corpus is never re-hashed, re-signed, or re-scored."""
    import numpy as np  # noqa: F401  (parity with the semdedup twin's env probe)

    from ..functions import text as T
    from ..operators import dedup as D
    from ..operators import similarity as S
    from ..sources.catalog import load_table
    from ..sources.io import TableIO
    from .corpus_build import CB_QUALITY_MIN, _even_prior_state
    from .corpus_mix import _with_mix_weight_quota
    from .dedup import _lsh_state
    from .similarity import SEMDEDUP_THETA, _emb, _even_trained_cells
    from .text import SHARD_TOKEN_BUDGET, quality_score_expr

    prior = _even_prior_state(spark, sf_dir)
    lsh = _lsh_state(spark, sf_dir)
    cells = _even_trained_cells(spark, sf_dir)
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    docs = load_table(spark, sf_dir, "documents")

    wh = tempfile.mkdtemp(prefix="stream_corpus_")
    io = TableIO(spark, wh)
    even_h = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", T.content_hash(F.col("text")).alias("h")
    )
    io.overwrite(even_h, "hash_store")
    # stage-2 partner seed: the existing corpus's retained near-dup
    # canonicals, with shingles + signatures (the production
    # signature table); sets come from the session-memoized chain
    e_s2_sets = lsh["sets"].join(prior["e_s2"], "doc_id", "left_semi")
    e_s2_sigs = D.minhash_signatures(e_s2_sets, num_perm=8)
    io.overwrite(e_s2_sets.join(e_s2_sigs, "doc_id"), "sig_store")
    # stage-3 partner seed: existing semantic representatives
    sem_seed = (
        emb.join(cells, "vec_id")
        .join(
            prior["e_s3"].select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
    )
    io.overwrite(sem_seed, "sem_store")

    # stage the arriving batch as two id-ordered parquet files (the
    # split point is one scalar aggregate — same staging discipline
    # as streaming_semdedup_ingest)
    odd_docs = docs.filter(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
    median = odd_docs.agg(F.expr("percentile(doc_id, 0.5)").alias("m")).collect()[0]["m"]
    arrivals = Path(tempfile.mkdtemp(prefix="stream_corpus_arrivals_"))
    odd_docs.filter(F.col("doc_id") < median).coalesce(1).write.parquet(
        str(arrivals / "b0")
    )
    odd_docs.filter(F.col("doc_id") >= median).coalesce(1).write.parquet(
        str(arrivals / "b1")
    )
    stage = Path(tempfile.mkdtemp(prefix="stream_corpus_src_"))
    for i, sub in enumerate(("b0", "b1")):
        part = next((arrivals / sub).glob("*.parquet"))
        dst = stage / f"batch_{i}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    cos = S.cosine(S.dot_exact("e1", "e2"), S.norm2_exact("e1"), S.norm2_exact("e2"))

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.localCheckpoint(eager=True)
        be = (
            b.select(
                "doc_id", "source", "lang", "text", T.tokens(F.col("text")).alias("toks")
            )
            .select(
                "doc_id",
                "source",
                "lang",
                "text",
                F.expr("CASE WHEN toks IS NULL THEN NULL ELSE size(toks) END")
                .cast("bigint")
                .alias("n_tokens"),
                T.content_hash(F.col("text")).alias("h"),
                quality_score_expr().alias("quality"),
            )
            .localCheckpoint(eager=True)
        )
        # ---- stage 1: exact probe (store = evens + earlier odds;
        # same-batch = smaller id) ----
        hs = io.read("hash_store").select(
            F.col("doc_id").alias("o_id"), F.col("h").alias("o_h")
        )
        m_store = be.select("doc_id", "h").join(
            hs, (F.col("h") == F.col("o_h")), "left_semi"
        )
        bh = be.select(F.col("doc_id").alias("o_id"), F.col("h").alias("o_h"))
        m_same = be.select("doc_id", "h").join(
            bh,
            (F.col("h") == F.col("o_h")) & (F.col("o_id") < F.col("doc_id")),
            "left_semi",
        )
        b_exact_drop = (
            m_store.select("doc_id")
            .unionByName(m_same.select("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        io.append(be.select("doc_id", "h"), "hash_store")
        s1b = be.join(b_exact_drop, "doc_id", "left_anti").localCheckpoint(eager=True)
        # ---- stage 2: MinHash-LSH probe ----
        bsets = D.with_shingle_sets(
            s1b.select("doc_id", "text")
        ).localCheckpoint(eager=True)
        bsigs = D.minhash_signatures(bsets, num_perm=8)
        store_sigs = io.read("sig_store")
        union_sigs = store_sigs.select(bsigs.columns).unionByName(bsigs)
        cands = D.lsh_candidate_pairs(union_sigs, num_perm=8, rows_per_band=2)
        bids1 = bsets.select("doc_id")
        cands = (
            cands.join(bids1.withColumnRenamed("doc_id", "d1"), "d1", "left_semi")
            .unionByName(
                cands.join(bids1.withColumnRenamed("doc_id", "d2"), "d2", "left_semi")
            )
            .distinct()
        )
        comb_sets = store_sigs.select("doc_id", "shingles").unionByName(
            bsets.select("doc_id", "shingles")
        )
        verified = D.exact_jaccard_pairs(comb_sets, min_jaccard=0.5, candidates=cands)
        in_batch = lambda c: F.col(c) % 2 == 1  # noqa: E731
        # partner rule per verified pair (a < b): b (odd, this batch)
        # drops on ANY partner a; a (odd, this batch) drops only on
        # an EVEN b (a larger odd is not a valid partner for a)
        drop_hi = verified.join(
            bids1.withColumnRenamed("doc_id", "d2"), "d2", "left_semi"
        ).select(F.col("d2").alias("doc_id"))
        drop_lo = (
            verified.filter(F.col("d2") % 2 == 0)
            .join(bids1.withColumnRenamed("doc_id", "d1"), "d1", "left_semi")
            .select(F.col("d1").alias("doc_id"))
        )
        b_near_drop = (
            drop_hi.unionByName(drop_lo).distinct().localCheckpoint(eager=True)
        )
        s2b = s1b.join(b_near_drop, "doc_id", "left_anti").localCheckpoint(eager=True)
        io.append(bsets.join(bsigs, "doc_id"), "sig_store")
        # ---- stage 3: semantic probe in even-trained cells ----
        bv = (
            emb.join(cells, "vec_id")
            .join(
                s2b.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        store_v = io.read("sem_store")
        new_side = bv.select(
            F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"), "cell"
        )
        prior_side = store_v.select(
            F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), "cell"
        )
        cand_sem = prior_side.join(new_side, "cell")
        same_sem = (
            bv.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), "cell")
            .join(new_side, "cell")
            .filter(F.col("d1") < F.col("d2"))
        )
        sem_matches = (
            cand_sem.unionByName(same_sem)
            .filter(cos >= F.lit(SEMDEDUP_THETA))
            .select(F.col("d2").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        s3b = s2b.join(sem_matches, "doc_id", "left_anti")
        io.append(bv, "sem_store")
        # ---- stage 4 + decision record ----
        quality_ok = F.col("quality").isNull() | (
            F.col("quality") >= F.lit(CB_QUALITY_MIN)
        )
        b_low_drop = s3b.filter(~quality_ok).select("doc_id")
        dec = (
            be.select("doc_id", "source", "lang", "n_tokens")
            .join(b_exact_drop.withColumn("r1", F.lit(1)), "doc_id", "left")
            .join(b_near_drop.withColumn("r2", F.lit(1)), "doc_id", "left")
            .join(sem_matches.withColumn("r3", F.lit(1)), "doc_id", "left")
            .join(b_low_drop.withColumn("r4", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                "source",
                "lang",
                "n_tokens",
                F.when(F.col("r1").isNotNull(), F.lit("exact_dup"))
                .when(F.col("r2").isNotNull(), F.lit("near_dup"))
                .when(F.col("r3").isNotNull(), F.lit("semantic_dup"))
                .when(F.col("r4").isNotNull(), F.lit("low_quality"))
                .otherwise(F.lit("kept"))
                .alias("keep_reason"),
            )
        )
        io.append(dec, "decisions")

    schema = odd_docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_corpus_ingest_")
    q = (
        stream.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_corpus_ingest drain timed out")

    # ---- manifest finalize: combined-mass mixture + append shards
    # over ALL recorded decisions (the batch capstone's stages 5/6)
    d = io.read("decisions")
    kept_b = d.filter(F.col("keep_reason") == "kept").select(
        "doc_id", "source", "lang", "n_tokens"
    )
    e_kept = prior["e_kept"]
    comb = e_kept.select("source", "n_tokens").unionByName(
        kept_b.select("source", "n_tokens")
    )
    per_src = comb.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
    mixw = _with_mix_weight_quota(per_src).select("source", "mix_weight")
    base_lang = e_kept.groupBy("lang").agg(F.sum("n_tokens").alias("__base"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    before_batch = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    kept_m = (
        kept_b.join(F.broadcast(base_lang), "lang", "left")
        .withColumn(
            "__before",
            F.coalesce(F.col("__base"), F.lit(0)).cast("bigint") + before_batch,
        )
        .join(F.broadcast(mixw), "source")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            F.lit("kept").alias("keep_reason"),
            F.lit(True).alias("kept"),
            "mix_weight",
            F.floor(F.col("__before") / F.lit(SHARD_TOKEN_BUDGET))
            .cast("bigint")
            .alias("shard_id"),
        )
    )
    drop_m = d.filter(F.col("keep_reason") != "kept").select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        "keep_reason",
        F.lit(False).alias("kept"),
        F.lit(None).cast("double").alias("mix_weight"),
        F.lit(None).cast("bigint").alias("shard_id"),
    )
    return kept_m.unionByName(drop_m).orderBy("doc_id")


def streaming_vpin_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-time VPIN (the ``vpin_dollar_buckets`` batch query as a
    live toxicity monitor): per-series tick-rule sign carry, open
    dollar-bucket flow accumulators, and the trailing toxicity
    window all live in the state store
    (streaming/stateful_vpin.py) and survive across micro-batches —
    a bucket OPENED in batch 0 completes and emits in batch 1.

    Events arrive via ``_events_stream_time_ordered`` as two
    time-sliced micro-batches, so cross-batch state carriage is
    INSIDE the value-oracled path. The stream emits completed
    buckets only (each series' final open bucket cannot know it is
    final), so the oracle below is the batch VPIN SQL restricted to
    ``bucket < max(bucket) per user`` — completed buckets' trailing
    windows never contain the open bucket, making the restriction
    exact, not approximate. Flow arithmetic is integer cents and the
    trailing mean folds ascending-sorted doubles — bit-exact."""
    from ..streaming.stateful_vpin import vpin_stateful
    from .microstructure import DOLLAR_BAR_CENTS, VPIN_WINDOW

    ev = _events_stream_time_ordered(spark, sf_dir, n_batches=2)
    ticks = ev.select(
        "user_id",
        F.unix_micros("ts").alias("seq"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cc"),
    )
    return _drain(
        vpin_stateful(ticks, DOLLAR_BAR_CENTS, VPIN_WINDOW), "append"
    ).orderBy("user_id", "bucket")


def _streaming_vpin_oracle() -> str:
    from .microstructure import DOLLAR_BAR_CENTS, VPIN_WINDOW

    return f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cc
  FROM events
),
p AS (
  SELECT *,
         SUM(cc) OVER w2 - cc AS pre_cum,
         cc - LAG(cc) OVER w1 AS dc
  FROM c
  WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
         w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT *,
         LAST_VALUE(CASE WHEN dc > 0 THEN 1 WHEN dc < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sign,
         CAST(FLOOR(pre_cum / {DOLLAR_BAR_CENTS}) AS BIGINT) AS bucket
  FROM p
),
pb AS (
  SELECT user_id, bucket,
         ABS(SUM(CASE WHEN sign = 1 THEN cc ELSE 0 END)
           - SUM(CASE WHEN sign = -1 THEN cc ELSE 0 END)) AS num,
         SUM(CASE WHEN sign = 1 THEN cc ELSE 0 END)
           + SUM(CASE WHEN sign = -1 THEN cc ELSE 0 END) AS den
  FROM s WHERE sign IS NOT NULL
  GROUP BY user_id, bucket
),
-- completed buckets only: the stream can never emit each series'
-- final open bucket; null-toxicity buckets (den = 0) are skipped by
-- the fold and excluded here BEFORE the trailing window
comp AS (
  SELECT user_id, bucket,
         CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS toxicity
  FROM (SELECT *, MAX(bucket) OVER (PARTITION BY user_id) AS max_b FROM pb)
  WHERE bucket < max_b AND den > 0
),
tr AS (
  SELECT user_id, bucket, toxicity,
         list_sort(list(toxicity) OVER (PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN {VPIN_WINDOW - 1} PRECEDING AND CURRENT ROW)) AS trail
  FROM comp
)
SELECT user_id, bucket, toxicity,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), trail), (acc, x) -> acc + x)
         / {float(VPIN_WINDOW)!r} AS vpin
FROM tr
WHERE len(trail) = {VPIN_WINDOW}
ORDER BY user_id, bucket
"""


def streaming_tick_bars_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-imbalance bars as a LIVE stream: the sign carry, the
    open bar's (θ, n), the adaptive expectation E, and the bar
    counter live in the state store
    (streaming/stateful_tick_bars.py) and survive across
    micro-batches — a bar accumulating in batch 0 closes and emits
    in batch 1 with the threshold E carried through the store.

    Because an imbalance bar closes ON the tick that reaches the
    threshold (|θ| moves ±1 per signed tick), the streamed output
    is IDENTICAL to the batch walk — the recursive-CTE oracle of
    ``tick_imbalance_bars`` applies VERBATIM, with no
    completed-only restriction (only each series' final partial
    bar is absent from both). Events arrive as two time-sliced
    micro-batches (the zone-machine staging)."""
    from ..streaming.stateful_tick_bars import tick_bars_stateful
    from .microstructure import TIB_E_INIT, TIB_E_MIN

    ev = _events_stream_time_ordered(spark, sf_dir, n_batches=2)
    ticks = ev.select(
        "user_id",
        F.unix_micros("ts").alias("seq"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cc"),
    )
    return _drain(
        tick_bars_stateful(ticks, TIB_E_INIT, TIB_E_MIN), "append"
    ).orderBy("user_id", "bar_seq")


def _tick_bars_oracle() -> str:
    from .microstructure import ORACLE_TICK_IMBALANCE_BARS

    return ORACLE_TICK_IMBALANCE_BARS


QUERIES = {
    "streaming_tick_bars_stateful": streaming_tick_bars_stateful,
    "streaming_vpin_stateful": streaming_vpin_stateful,
    "streaming_corpus_ingest": streaming_corpus_ingest,
    "streaming_semdedup_ingest": streaming_semdedup_ingest,
    "streaming_segment_activity": streaming_segment_activity,
    "streaming_top_spenders": streaming_top_spenders,
    "streaming_hourly_rollup": streaming_hourly_rollup,
    "streaming_mix_drift": streaming_mix_drift,
    "streaming_session_stats": streaming_session_stats,
    "streaming_dedup_hashes": streaming_dedup_hashes,
    "streaming_click_attribution": streaming_click_attribution,
    "streaming_sliding_rollup": streaming_sliding_rollup,
    "streaming_zone_signals_stateful": streaming_zone_signals_stateful,
}

from .corpus_build import ORACLE_CORPUS_BUILD_INGEST as _OCBI
from .similarity import ORACLE_INCREMENTAL_SEMDEDUP_INGEST as _OSI

ORACLES = {
    # value-identical to the batch incremental queries BY
    # CONSTRUCTION (id-ordered micro-batches), so they share those
    # oracles verbatim
    "streaming_semdedup_ingest": _OSI,
    "streaming_corpus_ingest": _OCBI,
    "streaming_segment_activity": ORACLE_STREAMING_SEGMENT_ACTIVITY,
    "streaming_top_spenders": ORACLE_STREAMING_TOP_SPENDERS,
    "streaming_hourly_rollup": ORACLE_STREAMING_HOURLY_ROLLUP,
    "streaming_mix_drift": ORACLE_STREAMING_MIX_DRIFT,
    "streaming_session_stats": ORACLE_STREAMING_SESSION_STATS,
    "streaming_dedup_hashes": ORACLE_STREAMING_DEDUP_HASHES,
    "streaming_click_attribution": ORACLE_STREAMING_CLICK_ATTRIBUTION,
    "streaming_sliding_rollup": ORACLE_STREAMING_SLIDING_ROLLUP,
    # r9: flipped from rows-only — the de-stating proof makes the
    # stateful fold's OUTPUT SQL-expressible (see its docstring)
    "streaming_zone_signals_stateful": ORACLE_STREAMING_ZONE_SIGNALS_STATEFUL,
    # r10: completed-bucket VPIN — the batch SQL restricted to
    # bucket < max(bucket) per series (see the query docstring)
    "streaming_vpin_stateful": _streaming_vpin_oracle(),
    # r10: imbalance bars close ON their threshold tick, so the
    # batch walk's recursive oracle applies verbatim
    "streaming_tick_bars_stateful": _tick_bars_oracle(),
}
