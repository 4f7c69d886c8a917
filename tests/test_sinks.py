"""CSV source/sink round-trips (SURVEY S3/S5: symbol-universe CSV
reads, backtest/recommendation CSV exports)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "SYM001", 99.5), (2, "SYM002", None)], "symbol_id int, symbol string, score double"
    )
    out = str(tmp_path / "recs")
    df.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out, schema=df.schema)
    got = sorted((r.symbol_id, r.symbol, r.score) for r in back.collect())
    assert got == [(1, "SYM001", 99.5), (2, "SYM002", None)]


def test_parquet_sink_snappy(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    out = str(tmp_path / "pq")
    df.write.option("compression", "snappy").parquet(out)
    assert spark.read.parquet(out).count() == 1
    assert any(".snappy.parquet" in p.name for p in Path(out).iterdir())


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink coverage: typed round-trip incl. arrays and
    decimals (the other columnar warehouse format Spark reads
    natively)."""
    df = spark.createDataFrame(
        [(1, [1.5, 2.5], "x"), (2, [], None)],
        "k int, emb array<double>, tag string",
    ).withColumn("price", F.col("k").cast("decimal(10,2)") * 1.5)
    out = str(tmp_path / "orc")
    df.write.option("compression", "zstd").orc(out)
    back = spark.read.orc(out)
    assert back.schema == df.schema
    got = sorted((r.k, r.emb, r.tag, float(r.price)) for r in back.collect())
    assert got == [(1, [1.5, 2.5], "x", 1.5), (2, [], None, 3.0)]


def test_json_lines_roundtrip(spark, tmp_path):
    """JSON-lines source/sink: schema-on-read with explicit schema
    (the interchange format for document corpora)."""
    df = spark.createDataFrame(
        [(1, "hello world", {"lang": "en"}), (2, "bonjour", {"lang": "fr"})],
        "doc_id long, text string, meta map<string,string>",
    )
    out = str(tmp_path / "jsonl")
    df.write.json(out)
    back = spark.read.schema(df.schema).json(out)
    got = sorted((r.doc_id, r.text, dict(r.meta)) for r in back.collect())
    assert got == [(1, "hello world", {"lang": "en"}), (2, "bonjour", {"lang": "fr"})]


def test_atomic_swap_crash_recovery(spark, tmp_path):
    """Rename-based table swap: inject a crash at every protocol
    boundary and verify recover_table restores a complete, readable
    table from on-disk state alone."""
    import os
    import shutil

    from fin_trade_craft_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v2 = spark.createDataFrame([(1, "A"), (3, "C")], "id int, v string")
    final, tmp, old = io._swap_paths("t")

    def reset():
        for p in (final, tmp, old):
            shutil.rmtree(p, ignore_errors=True)
        io.overwrite(v1, "t")

    def rows():
        return sorted((r.id, r.v) for r in io.read("t").collect())

    # crash DURING staging: partial tmp dir, live table untouched
    reset()
    os.makedirs(tmp)
    (Path(tmp) / "part-00000.parquet").write_bytes(b"partial garbage")
    assert io.recover_table("t") == "aborted_stage"
    assert not os.path.exists(tmp) and rows() == [(1, "a"), (2, "b")]

    # crash BETWEEN the two commit renames: table momentarily absent,
    # staged copy complete -> rolled forward to v2
    reset()
    v2.write.parquet(tmp)
    os.rename(final, old)  # first rename happened, second did not
    assert io.recover_table("t") == "rolled_forward"
    assert rows() == [(1, "A"), (3, "C")] and not os.path.exists(old)

    # crash AFTER commit, before old-copy cleanup
    reset()
    shutil.copytree(final, old)
    assert io.recover_table("t") == "cleaned"
    assert rows() == [(1, "a"), (2, "b")] and not os.path.exists(old)

    # nothing to do
    assert io.recover_table("t") == "ok"

    # and the happy path end-to-end still works (upsert full rewrite)
    io.upsert(v2, "t", ["id"])
    assert rows() == [(1, "A"), (2, "b"), (3, "C")]
    assert not os.path.exists(tmp) and not os.path.exists(old)


def test_recovery_retains_history_and_sweeps_rewrite_tmp(spark, tmp_path):
    """Crash recovery must honor retention: an old copy found in the
    commit window becomes a history version (not silently dropped)
    when retain_history > 0, in both the cleaned and rolled-forward
    paths; and stale uuid-named __rewrite_tmp_* staging dirs (a crash
    inside publish_audited before commit) are swept."""
    import os
    import shutil

    from fin_trade_craft_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path / "wh"), retain_history=3)
    v1 = spark.createDataFrame([(1, "a")], "id int, v string")
    v2 = spark.createDataFrame([(1, "A")], "id int, v string")
    final, tmp, old = io._swap_paths("t")

    # crash AFTER commit, before old-copy disposal → retained version
    io.overwrite(v1, "t")
    io.overwrite(v2, "t")          # normal commit retains v1 as version 1
    assert io.history("t") == [1]
    shutil.copytree(final, old)    # simulate interrupted cleanup
    assert io.recover_table("t") == "cleaned"
    assert io.history("t") == [1, 2]  # old copy retired, not dropped

    # crash BETWEEN the commit renames → roll forward AND retain old
    v1.write.parquet(tmp)
    os.rename(final, old)
    assert io.recover_table("t") == "rolled_forward"
    assert io.history("t") == [1, 2, 3]
    assert sorted(r.v for r in io.read("t").collect()) == ["a"]

    # stale publish_audited staging dir is swept
    stale = f"{io.path('t')}__rewrite_tmp_deadbeef"
    os.makedirs(stale)
    assert io.recover_table("t") == "cleaned"
    assert not os.path.exists(stale)
    assert io.recover_table("t") == "ok"


def test_read_pruned_typed_bounds_error(spark, tmp_path):
    """A bound whose Python type can't compare with the column's
    collected stats must raise a clear TypeError naming the expected
    type, not a bare comparison error from inside the driver loop."""
    import datetime

    import pytest

    from fin_trade_craft_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 1)), (2, datetime.date(2020, 6, 1))], "id int, d date"
    )
    io.overwrite(df, "t")
    with pytest.raises(TypeError, match="read_pruned bounds.*'d'.*date"):
        io.read_pruned("t", "d", "2020-01-01", "2020-03-01")
    # correctly-typed bounds still work
    rows, n_scanned, n_total = io.read_pruned(
        "t", "d", datetime.date(2019, 1, 1), datetime.date(2020, 3, 1)
    )
    assert [r.id for r in rows.collect()] == [1]


def test_reader_vs_writer_swap_isolation(spark, tmp_path):
    """r10 verdict #6: crash injection covers the WRITER; this
    interposes a READER at every commit-protocol boundary and proves
    snapshot isolation — the reader sees the complete old table or
    the complete new table, never a mix of part files, and the
    momentary absent-directory window between the two commit renames
    resolves via read_committed's bounded wait."""
    import os
    import shutil
    import threading
    import time

    from fin_trade_craft_spark.sources.io import TableIO

    io = TableIO(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v2 = spark.createDataFrame([(1, "A"), (3, "C")], "id int, v string")
    OLD_ROWS = [(1, "a"), (2, "b")]
    NEW_ROWS = [(1, "A"), (3, "C")]
    final, tmp, old = io._swap_paths("t")

    def reset():
        for p in (final, tmp, old):
            shutil.rmtree(p, ignore_errors=True)
        io.overwrite(v1, "t")

    def rows(df):
        return sorted((r.id, r.v) for r in df.collect())

    # boundary 1 — mid-stage (tmp holds a partial, garbage write):
    # the reader must see the complete OLD table; the staged dir must
    # be invisible to it
    reset()
    os.makedirs(tmp)
    (Path(tmp) / "part-00000.parquet").write_bytes(b"partial garbage")
    assert rows(io.read_committed("t")) == OLD_ROWS

    # boundary 2 — stage complete, commit not started: still OLD
    reset()
    v2.write.parquet(tmp)
    assert rows(io.read_committed("t")) == OLD_ROWS

    # boundary 3 — BETWEEN the two commit renames (final absent,
    # old=v1, tmp=v2 staged): a concurrent committer finishes the
    # second rename while the reader waits; the reader gets the
    # complete NEW table — never an error, never a partial
    reset()
    v2.write.parquet(tmp)
    os.rename(final, old)  # first commit rename

    def finish_commit():
        time.sleep(0.3)
        os.rename(tmp, final)  # second commit rename
        shutil.rmtree(old, ignore_errors=True)

    t = threading.Thread(target=finish_commit)
    t.start()
    got = rows(io.read_committed("t"))
    t.join()
    assert got == NEW_ROWS

    # boundary 4 — post-commit, old copy not yet retired: NEW
    reset()
    v2.write.parquet(tmp)
    os.rename(final, old)
    os.rename(tmp, final)
    assert rows(io.read_committed("t")) == NEW_ROWS

    # list-then-read race: a frame whose file listing predates the
    # swap must fail LOUDLY (or still yield the complete old rows if
    # its scan won the race) when the swap retires those files — a
    # silent old/new blend must be impossible
    reset()
    stale = io.read("t")  # listing captured against v1's files
    io.upsert(v2, "t", ["id"])  # full-rewrite swap retires v1's files
    try:
        got = rows(stale)
    except Exception:
        got = None  # loud missing-file failure — acceptable outcome
    assert got is None or got == OLD_ROWS

    # absent table is still a plain loud error, not an infinite wait
    shutil.rmtree(final, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    import pytest as _pytest

    with _pytest.raises(Exception):
        io.read_committed("t", attempts=3, wait=0.01).collect()
