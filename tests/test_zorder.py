"""Z-order clustering + manifest file skipping (TableIO.zorder_rewrite /
file_stats / read_pruned)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from fin_trade_craft_spark.operators.zorder import zorder_key  # noqa: E402
from fin_trade_craft_spark.sources.io import TableIO  # noqa: E402

N_FILES = 16


def _grid_df(spark):
    """64×64 uniform grid: x and y independent, so a slice on either
    column covers the full range of the other — the adversarial case
    for linear sort."""
    return spark.range(4096).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )


def test_zorder_interleave_exact_small_domain(spark):
    """4-bit two-column key on the exact domain [0,15]²: the Morton
    key must equal the hand-computed bit interleave for every cell."""
    df = spark.range(256).select(
        (F.col("id") % 16).cast("double").alias("x"),
        (F.col("id") / 16).cast("long").cast("double").alias("y"),
    )
    got = df.select("x", "y", zorder_key(df, ["x", "y"], bits_per_col=4)).collect()

    def morton(a: int, b: int) -> int:
        out = 0
        for i in range(4):
            out |= ((a >> i) & 1) << (2 * i + 1)
            out |= ((b >> i) & 1) << (2 * i)
        return out

    for r in got:
        assert r["__zkey"] == morton(int(r["x"]), int(r["y"]))


def test_zorder_rewrite_preserves_rows_and_prunes_both_columns(spark, tmp_path):
    """After zorder_rewrite: (a) the table contents are unchanged,
    (b) a narrow range predicate on EITHER column prunes most files
    via the manifest, and (c) the pruned read returns exactly the
    full-scan filter result."""
    io = TableIO(spark, str(tmp_path))
    io.overwrite(_grid_df(spark).repartition(N_FILES), "grid")
    before = io.read("grid").toPandas()
    io.zorder_rewrite("grid", ["x", "y"], N_FILES)
    after = io.read("grid").toPandas()
    ok, msg = compare(before, after)
    assert ok, f"zorder rewrite changed table contents: {msg}"

    for col in ("x", "y"):
        pruned, n_scanned, n_total = io.read_pruned("grid", col, 8.0, 15.0)  # 1/8 slice
        assert n_total == N_FILES
        assert n_scanned <= n_total // 2, f"{col}: scanned {n_scanned}/{n_total}"
        expect = io.read("grid").filter(F.col(col).between(8.0, 15.0)).toPandas()
        ok, msg = compare(pruned.toPandas(), expect)
        assert ok, f"{col}: pruned read diverges from full filter: {msg}"


def test_zorder_beats_linear_sort_on_second_column(spark, tmp_path):
    """The point of z-order: under a linear x-sort a y-slice
    intersects EVERY file; under z-order it intersects only the
    files whose hyper-rectangle crosses the slice."""
    io = TableIO(spark, str(tmp_path))

    linear = _grid_df(spark).repartitionByRange(N_FILES, "x").sortWithinPartitions("x")
    io.overwrite(linear, "linear")
    io.overwrite(_grid_df(spark).repartition(N_FILES), "zed")
    io.zorder_rewrite("zed", ["x", "y"], N_FILES)

    _, lin_scanned, lin_total = io.read_pruned("linear", "y", 8.0, 15.0)
    _, z_scanned, z_total = io.read_pruned("zed", "y", 8.0, 15.0)
    assert lin_total == z_total == N_FILES
    assert lin_scanned == N_FILES, "x-sorted layout should not prune a y-slice"
    assert z_scanned < lin_scanned // 2, f"z-order scanned {z_scanned} vs linear {lin_scanned}"


def test_read_pruned_null_stats_and_empty_selection(spark, tmp_path):
    """Files whose stats column is all-NULL must be KEPT (stats can
    never drop rows); a range hitting nothing returns an empty frame
    with 0 files scanned."""
    io = TableIO(spark, str(tmp_path))
    some = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k long, v double")
    nulls = spark.createDataFrame([(3, None), (4, None)], "k long, v double")
    io.overwrite(some.coalesce(1), "t")
    io.append(nulls.coalesce(1), "t")

    pruned, n_scanned, n_total = io.read_pruned("t", "v", 5.5, 7.0)
    assert n_total == 2 and n_scanned == 2  # null-stats file kept
    assert [r.k for r in pruned.collect()] == [2]

    empty, n_scanned, n_total = io.read_pruned("t", "v", 100.0, 200.0)
    assert n_scanned == 1  # only the null-stats file survives the envelope test
    assert empty.count() == 0

    nothing, n_scanned, _ = TableIO(spark, str(tmp_path)).read_pruned("t", "k", 100, 200)
    assert n_scanned == 0 and nothing.count() == 0


def test_read_pruned_on_partitioned_table(spark, tmp_path):
    """read_pruned must keep hive partition columns resolvable and
    match read(table)+filter exactly on a partitioned table (leaf
    files read without basePath silently drop partition columns)."""
    io = TableIO(spark, str(tmp_path))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("day"),
        (F.col("id") * 2.0).alias("v"),
    )
    io.overwrite(df, "t", partition_by=["day"])

    # prune on the partition column itself
    pruned, n_scanned, n_total = io.read_pruned("t", "day", 1, 2)
    expect = io.read("t").filter(F.col("day").between(1, 2)).toPandas()
    ok, msg = compare(pruned.toPandas(), expect)
    assert ok, msg
    assert n_scanned < n_total

    # prune on a data column: partition columns must still be present
    pruned2, _, _ = io.read_pruned("t", "v", 0.0, 50.0)
    assert "day" in pruned2.columns
    expect2 = io.read("t").filter(F.col("v").between(0.0, 50.0)).toPandas()
    ok, msg = compare(pruned2.toPandas(), expect2)
    assert ok, msg
