"""Distributed total-order ranking — global row_number /
percent_rank / NTILE / prefix-scan WITHOUT a single-partition
window.

An unpartitioned ``Window.orderBy(...)`` plans a WindowExec with an
empty partition spec: Spark funnels the ENTIRE input through one
task — the classic cluster-scale failure mode (the plan lint in
tests/test_plan_lint.py bans it). These helpers compute the same
values with the textbook two-phase scheme, expressed ENTIRELY as a
lazy plan (r06 verdict tasks 2+3 — no collect, no checkpoint, no
job at construction):

1. ``repartitionByRange`` on the order key — partitions hold
   disjoint, ordered key ranges (equal keys land in ONE partition,
   so tie semantics survive), each ~|input|/P rows;
2. one count/max row per (partition, group) — a P-row aggregate;
3. each partition's incoming offset = the sum/max of the rows with a
   SMALLER partition id, via a broadcast theta-join over that P-row
   frame (P² pairs of a ~32-row frame — no window, so no empty
   partition spec for the lint to ban, and no driver round-trip);
4. group totals for percent_rank/NTILE ride the SAME broadcast
   frame as the offsets (one merged pass over the P-row counts —
   ``_prefix_and_total``) — never a second aggregate of the
   caller's frame (r06 verdict task 3), and never a SECOND
   broadcast build (r07 verdict: two concurrent build threads raced
   to compute the cached exchange's lineage before the cache
   filled, re-running the upstream plan per racer);
5. a per-partition window keyed on ``spark_partition_id()`` — a
   balanced exchange, never a funnel — adds the offset.

Consistency AND single-computation without an eager pin: the
range-partitioned frame is ``persist()``-ed (lazy cache), and every
consumer tree funnels through exactly ONE broadcast build whose
innermost stage is the first computation of that cache; the probe
side cannot launch until the build completes, so the cache fills
once and everything downstream — offsets, totals, output rows —
reads the same stored partitions. (Plain exchange reuse is NOT
relied on: each range exchange samples its own boundaries — the
cached frame is the guarantee the r0x eager localCheckpoint
provided, minus the construction-time job.) The cache carries the
same footprint the localCheckpoint did; MEMORY_AND_DISK spills
rather than evicts under pressure.

Use these for GLOBAL (or few-huge-group) cross-sectional ranks —
e.g. the daily screener's market-wide percentiles, per-language
curriculum NTILE. Per-entity windows (symbol, user) should stay
plain ``Window.partitionBy(entity)``; that already scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"


def _range_partitioned(df: DataFrame, order_cols: list) -> DataFrame:
    """Range-partition on the order columns and pin each row's
    partition id. Lazily persisted — and race-free WITHOUT an eager
    pin, because every consumer tree built here funnels through ONE
    broadcast build whose innermost stage is the first (and only)
    computation of this cache; the probe side can't launch until
    that build completes (see _prefix_and_total)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(n, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )


def _per_partition_agg(rp: DataFrame, group_cols: list[str], agg: Column) -> DataFrame:
    """One ``agg`` row per (partition, group) — bounded: group_cols
    are low-cardinality by this module's contract (global ranks or
    per-language style groups), so this frame is ~P·|groups| rows."""
    return rp.groupBy(_PID, *group_cols).agg(agg.alias("__v"))


def _exclusive_prefix(cnt: DataFrame, group_cols: list[str], combine: Column, empty: Column) -> DataFrame:
    """Exclusive prefix-combine across partitions within each group,
    as a plan: left theta-join each (pid, group) row to every SAME-
    group row with a smaller pid and aggregate their ``__v``. The
    frame is P·|groups| rows, broadcast — P² pairs of a tiny frame,
    no window (an ORDER BY pid window would need an empty partition
    spec in the global case — exactly what the plan lint bans).
    ``combine`` aggregates ``__v2``; ``empty`` is the value for the
    first partition (no predecessors)."""
    b = cnt.select(
        F.col(_PID).alias("__pid2"),
        *[F.col(g).alias(f"__g2_{g}") for g in group_cols],
        F.col("__v").alias("__v2"),
    )
    cond = F.col("__pid2") < F.col(_PID)
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__g2_{g}"))
    return (
        cnt.join(F.broadcast(b), cond, "left")
        .groupBy(_PID, *group_cols)
        .agg(F.coalesce(combine, empty).alias("__off"))
    )


def _join_group_keys(df: DataFrame, small: DataFrame, group_cols: list[str], extra_key: str | None = None) -> DataFrame:
    """Broadcast-join ``small`` onto ``df`` by the group keys (plus
    ``extra_key`` with plain equality) using NULL-SAFE equality — a
    plain equi-join would silently DROP rows whose group key is NULL
    (null != null), whereas the Window.partitionBy these operators
    replace keeps NULL as its own partition. The small side's key
    columns are renamed and dropped after the join."""
    renamed = small
    for c in group_cols:
        renamed = renamed.withColumnRenamed(c, f"__sk_{c}")
    cond = F.lit(True)
    if extra_key is not None:
        renamed = renamed.withColumnRenamed(extra_key, "__sk_pid")
        cond = F.col(extra_key) == F.col("__sk_pid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__sk_{c}"))
    out = df.join(F.broadcast(renamed), cond)
    drops = [f"__sk_{c}" for c in group_cols] + (["__sk_pid"] if extra_key else [])
    return out.drop(*drops)


def _prefix_and_total(cnt: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exclusive prefix count ``__off`` AND group row total ``__n``
    per (partition, group), in ONE pass over the P-row count frame:
    join every (pid, group) row to ALL same-group rows (null-safe,
    inner — each row matches at least itself) and split the two
    aggregates with a pid predicate. One pass matters for execution
    order, not just plan size: computing them as two separate
    broadcast frames (the r07 shape) put TWO broadcast-build threads
    on the wire at once, each racing to compute the cached range
    exchange's lineage before the cache filled — the r07 bench
    regressions (daily_screener 2.04→4.78s). With a single build,
    the innermost broadcast materializes ``rp``'s cache strictly
    before anything else reads it. Totals still derive from the
    SAME per-partition counts as the offsets (r06 verdict task 3)."""
    b = cnt.select(
        F.col(_PID).alias("__pid2"),
        *[F.col(g).alias(f"__g2_{g}") for g in group_cols],
        F.col("__v").alias("__v2"),
    )
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__g2_{g}"))
    return (
        cnt.join(F.broadcast(b), cond, "inner")
        .groupBy(_PID, *group_cols)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__pid2") < F.col(_PID), F.col("__v2"))),
                F.lit(0).cast("long"),
            ).alias("__off"),
            F.sum("__v2").alias("__n"),
        )
    )


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out: str = "rn",
    group_cols: list[str] | None = None,
    _with_totals: bool = False,
):
    """Global (or per-group) ROW_NUMBER over a total order, no
    single-partition stage, no construction-time job. ``order_cols``
    must be a total order (include a unique tiebreak) for a
    deterministic result; ``group_cols`` (optional, low-cardinality)
    scope the numbering the way ``PARTITION BY`` would — including a
    NULL group key, which ranks as its own group exactly like
    PARTITION BY. With ``_with_totals`` (internal), the result also
    carries each group's row total ``__n`` (and keeps ``_PID``) so
    percent_rank/NTILE derive totals from the SAME per-partition
    counts as the offsets — via the single merged broadcast frame,
    never a second build racing the first (see _prefix_and_total)."""
    group_cols = group_cols or []
    rp = _range_partitioned(df, [*group_cols, *order_cols])
    cnt = _per_partition_agg(rp, group_cols, F.count(F.lit(1)))
    if _with_totals:
        off = _prefix_and_total(cnt, group_cols)
    else:
        off = _exclusive_prefix(cnt, group_cols, F.sum("__v2"), F.lit(0).cast("long"))
    w = Window.partitionBy(_PID, *group_cols).orderBy(*order_cols)
    ranked = (
        _join_group_keys(rp, off, group_cols, extra_key=_PID)
        .withColumn(out, F.row_number().over(w) + F.col("__off"))
        .drop("__off")
    )
    if _with_totals:
        return ranked
    return ranked.drop(_PID)


def global_percent_rank(
    df: DataFrame,
    value_col: str,
    out: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """PERCENT_RANK() OVER (ORDER BY value_col) at scale:
    (min-rank-of-ties − 1) / (n − 1), exactly Spark/ANSI semantics.
    Ties need no explicit tiebreak — equal values share one range
    partition and collapse via min()."""
    group_cols = group_cols or []
    base = global_row_number(df, [value_col], "__rn", group_cols, _with_totals=True)
    # ties collapse to min rank via a window keyed on the VALUE
    # (partitioned — never an empty partition spec); group totals
    # __n ride the same broadcast as the offsets
    wt = Window.partitionBy(*group_cols, value_col)
    base = base.withColumn("__minrn", F.min("__rn").over(wt))
    return base.withColumn(
        out,
        F.when(
            F.col("__n") > 1,
            (F.col("__minrn") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
    ).drop(_PID, "__rn", "__minrn", "__n")


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list,
    out: str = "tile",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """NTILE(n) OVER ([PARTITION BY group] ORDER BY order_cols) at
    scale. ``order_cols`` must be a total order (unique tiebreak) —
    the same requirement ANSI NTILE has for a deterministic result.
    Exact NTILE fill semantics: the first (n mod k) tiles get
    ⌈n/k⌉ rows, the rest ⌊n/k⌋."""
    group_cols = group_cols or []
    base = global_row_number(df, order_cols, "__rn", group_cols, _with_totals=True)
    # qv = floor(n/k) rows per small tile; the first r = n mod k
    # tiles get qv+1 rows (ANSI NTILE fill). Pure integer DIV — a
    # double division could round up across a tile boundary at
    # 2^26+-row tiles
    nt = int(n_tiles)
    tile = F.expr(
        f"CAST(CASE WHEN __rn <= (__n % {nt}) * (__n DIV {nt} + 1) "
        f"THEN (__rn - 1) DIV (__n DIV {nt} + 1) + 1 "
        f"ELSE (__n % {nt}) + (__rn - (__n % {nt}) * (__n DIV {nt} + 1) - 1) "
        f"DIV GREATEST(__n DIV {nt}, 1) + 1 END AS BIGINT)"
    )
    return base.withColumn(out, tile).drop(_PID, "__rn", "__n")


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out: str = "run_sum",
) -> DataFrame:
    """INCLUSIVE running SUM of ``value_col`` over a global total
    order — the distributed scan-sum primitive (systematic/PPS
    sampling boundaries, cumulative-weight splits, global CDFs) —
    with the same two-phase shape as the rest of this module: a
    per-partition running sum plus each partition's incoming offset
    from the smaller-pid theta-join over the P-row per-partition
    totals. ``order_cols`` must be a total order (unique tiebreak)
    for a deterministic result; the sum is exact for integral
    ``value_col`` (BIGINT accumulation — use the fixed-point
    discipline of functions/exact.py first if the weights are
    doubles)."""
    rp = _range_partitioned(df, order_cols)
    cnt = _per_partition_agg(rp, [], F.sum(F.col(value_col)))
    off = _exclusive_prefix(cnt, [], F.sum("__v2"), F.lit(0).cast("long"))
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = F.sum(value_col).over(w)  # inclusive within the partition
    return (
        rp.join(F.broadcast(off), [_PID])
        .withColumn(out, (local + F.col("__off")).cast("long"))
        .drop(_PID, "__off")
    )


def range_prefix_scan_max(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out: str = "run_max",
) -> DataFrame:
    """Exclusive running MAX of ``value_col`` over a global total
    order (the sort-scan primitive behind skyline/Pareto queries),
    distributed: per-partition running max + each partition's
    incoming prefix max from the smaller-pid theta-join (NULL-safe:
    a partition whose value_col is entirely NULL aggregates to NULL
    and MAX ignores it in the combine). Rows where no predecessor
    exists get NULL — same as a window frame of
    (unbounded preceding, -1)."""
    rp = _range_partitioned(df, order_cols)
    cnt = _per_partition_agg(rp, [], F.max(F.col(value_col)))
    # max ignores NULLs; a first partition (no predecessors) gets NULL
    off = _exclusive_prefix(cnt, [], F.max("__v2"), F.lit(None)).withColumnRenamed(
        "__off", "__pfx"
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        rp.join(F.broadcast(off), [_PID])
        .withColumn(
            out,
            F.when(
                local.isNotNull() & F.col("__pfx").isNotNull(),
                F.greatest(local, F.col("__pfx")),
            ).otherwise(F.coalesce(local, F.col("__pfx"))),
        )
        .drop(_PID, "__pfx")
    )
