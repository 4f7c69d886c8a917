"""Distributed total-order ranking — global row_number /
percent_rank / NTILE / prefix-scan WITHOUT a single-partition
window.

An unpartitioned ``Window.orderBy(...)`` plans a WindowExec with an
empty partition spec: Spark funnels the ENTIRE input through one
task — the classic cluster-scale failure mode (the plan lint in
tests/test_plan_lint.py bans it). These helpers compute the same
values with the textbook two-phase scheme:

1. ``repartitionByRange`` on the order key — partitions hold
   disjoint, ordered key ranges (equal keys land in ONE partition,
   so tie semantics survive), each ~|input|/P rows;
2. a per-partition window keyed on ``spark_partition_id()`` — a
   balanced hash exchange, never a funnel;
3. a bounded driver collect of ONE aggregate row per partition
   (count / max — the same "metadata-scale collect" contract as
   TableIO.read_pruned), prefix-combined in Python and broadcast
   back as each partition's incoming offset.

The result is deterministic and identical to the single-sort
window: range boundaries may vary run to run, but a row's global
rank is a pure function of the data given a total order (and for
percent_rank, ties collapse to min-rank regardless of intra-tie
order).

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
    partition id. Materialized (localCheckpoint) because the frame
    feeds both the offset aggregate and the ranked output — on a
    cluster this would be a persisted shuffle stage; recomputing it
    could in principle resample different (still-correct) range
    boundaries between the two reads, so pinning also removes that
    freedom."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(n, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _prefix_rows(rp: DataFrame, group_cols: list[str], agg: Column, combine, init):
    """Collect one ``agg`` row per (partition, group), exclusive-
    prefix-combine across partitions within each group, and return
    the rows for a broadcast offsets frame. Bounded: one row per
    partition per group — group_cols are low-cardinality by this
    module's contract (global ranks or per-language style groups)."""
    rows = (
        rp.groupBy(_PID, *group_cols).agg(agg.alias("__v")).collect()
    )
    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault(tuple(r[c] for c in group_cols), []).append(r)
    out = []
    for key, grp in by_group.items():
        acc = init
        for r in sorted(grp, key=lambda r: r[_PID]):
            out.append((r[_PID], *key, acc))
            acc = r["__v"] if acc is None else combine(acc, r["__v"])
    return out


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


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out: str = "rn",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Global (or per-group) ROW_NUMBER over a total order, no
    single-partition stage. ``order_cols`` must be a total order
    (include a unique tiebreak) for a deterministic result;
    ``group_cols`` (optional, low-cardinality) scope the numbering
    the way ``PARTITION BY`` would — including a NULL group key,
    which ranks as its own group exactly like PARTITION BY."""
    group_cols = group_cols or []
    spark = df.sparkSession
    rp = _range_partitioned(df, [*group_cols, *order_cols])
    off = _prefix_rows(rp, group_cols, F.count(F.lit(1)), lambda a, b: a + b, 0)
    from pyspark.sql.types import LongType, StructField, StructType

    base = rp.select(F.col(_PID), *[F.col(c) for c in group_cols]).schema
    schema = StructType(
        [base[0]]
        # group keys forced nullable: a NULL group is a legal key
        + [StructField(f.name, f.dataType, True) for f in base.fields[1:]]
        + [StructField("__off", LongType(), False)]
    )
    off_df = spark.createDataFrame(off, schema)
    w = Window.partitionBy(_PID, *group_cols).orderBy(*order_cols)
    return (
        _join_group_keys(rp, off_df, group_cols, extra_key=_PID)
        .withColumn(out, F.row_number().over(w) + F.col("__off"))
        .drop(_PID, "__off")
    )


def _with_group_totals(base: DataFrame, group_cols: list[str]) -> DataFrame:
    """Attach each group's row total ``__n`` to a frame that already
    carries a contiguous per-group ``__rn`` — as max(__rn), derived
    from the SAME pinned range-partitioned lineage the ranks came
    from. Re-aggregating the caller's original df here (the r05
    shape) both recomputed the upstream plan a second time and, on a
    nondeterministic source, could disagree with the ranks
    (percent_rank > 1 / wrong NTILE fill); max of the rank column
    cannot (ADVICE r05)."""
    if group_cols:
        counts = base.groupBy(*group_cols).agg(F.max("__rn").alias("__n"))
        return _join_group_keys(base, counts, group_cols)
    counts = base.agg(F.max("__rn").alias("__n"))
    return base.crossJoin(F.broadcast(counts))


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
    base = global_row_number(df, [value_col], "__rn", group_cols)
    # ties collapse to min rank via a window keyed on the VALUE
    # (partitioned — never an empty partition spec); group sizes come
    # from an aggregate broadcast back
    wt = Window.partitionBy(*group_cols, value_col)
    base = base.withColumn("__minrn", F.min("__rn").over(wt))
    base = _with_group_totals(base, group_cols)
    return base.withColumn(
        out,
        F.when(
            F.col("__n") > 1,
            (F.col("__minrn") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
    ).drop("__rn", "__minrn", "__n")


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
    base = global_row_number(df, order_cols, "__rn", group_cols)
    base = _with_group_totals(base, group_cols)
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
    return base.withColumn(out, tile).drop("__rn", "__n")


def range_prefix_scan_max(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out: str = "run_max",
) -> DataFrame:
    """Exclusive running MAX of ``value_col`` over a global total
    order (the sort-scan primitive behind skyline/Pareto queries),
    distributed: per-partition running max + each partition's
    incoming prefix max from the bounded driver combine. Rows where
    no predecessor exists get NULL — same as a window frame of
    (unbounded preceding, -1)."""
    rp = _range_partitioned(df, order_cols)
    # None-safe max: a partition whose value_col is entirely NULL
    # aggregates to None and must not poison the running combine
    off = _prefix_rows(
        rp,
        [],
        F.max(F.col(value_col)),
        lambda a, b: a if b is None else (b if a is None else max(a, b)),
        None,
    )
    spark = df.sparkSession
    from pyspark.sql.types import StructField, StructType

    base = rp.select(F.col(_PID).alias(_PID), F.col(value_col).alias("__pfx")).schema
    schema = StructType(
        [base[0], StructField("__pfx", base[1].dataType, True)]  # first partition: NULL prefix
    )
    off_df = spark.createDataFrame(off, schema)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        rp.join(F.broadcast(off_df), [_PID])
        .withColumn(
            out,
            F.when(
                local.isNotNull() & F.col("__pfx").isNotNull(),
                F.greatest(local, F.col("__pfx")),
            ).otherwise(F.coalesce(local, F.col("__pfx"))),
        )
        .drop(_PID, "__pfx")
    )
