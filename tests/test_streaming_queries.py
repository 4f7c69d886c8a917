"""Differential tests: every registered streaming query (real
readStream → AvailableNow drain) vs its batch DuckDB oracle at
sf0.001 — the same per-family parametrized gate the batch query
modules have. Since r9 this includes the stateful zone query (its
de-stating proof made the output SQL-expressible), so the whole
streaming registry is oracle-diffed here."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # noqa: E402

from fin_trade_craft_spark.queries import streaming  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.mark.parametrize("name", sorted(set(streaming.QUERIES) & set(streaming.ORACLES)))
def test_streaming_vs_oracle(spark, duck, name):
    sdf = streaming.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(streaming.ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result"
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_stage_dir_relative_sf_dir(tmp_path):
    """Regression (r9, found by the sf5 sweep): a RELATIVE sf_dir
    used to produce symlinks that dangle from inside the staging
    temp dir, and a file-source stream over dangling links yields an
    EMPTY stream instead of an error — a silent-zero-rows wrong
    result. _stage_dir must resolve sources to absolute paths and
    fail fast if staging yields no readable files."""
    import os

    rel = os.path.relpath(SF_SMOKE, os.getcwd())
    staged, n = streaming._stage_dir(rel, "events")
    files = sorted(Path(staged).glob("*.parquet"))
    assert n >= 1 and len(files) == n
    assert all(p.exists() and p.resolve().is_file() for p in files)

    with pytest.raises(FileNotFoundError):
        streaming._stage_dir(str(tmp_path), "events")


def test_time_ordered_staging_delivers_two_ordered_batches(spark):
    """r10 (r09 verdict task 4): the stateful zone query's stream
    must arrive as ≥2 REAL micro-batches whose time slices are
    disjoint and ordered — otherwise its oracle only ever exercises
    a single-batch fold. Drains the staged source through
    foreachBatch and pins (a) exactly n_batches batches, (b) every
    ts in batch k strictly before every ts in batch k+1, (c) no
    rows lost."""
    import tempfile

    from pyspark.sql import functions as F

    ev = streaming._events_stream_time_ordered(spark, SF_SMOKE, n_batches=2)
    seen: list[tuple[int, int, int, int]] = []

    def fb(df, bid):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).collect()[0]
        seen.append((bid, r["n"], r["lo"], r["hi"]))

    q = (
        ev.writeStream.foreachBatch(fb)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ordered_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert len(seen) == 2, seen
    (b0, n0, lo0, hi0), (b1, n1, lo1, hi1) = sorted(seen)
    assert (b0, b1) == (0, 1)
    assert hi0 < lo1, f"batch slices overlap: {seen}"
    total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert n0 + n1 == total and n0 > 0 and n1 > 0
