"""The local gate must be dtype-faithful: DuckDB types a bare
integer ``SUM(CASE...)`` as HUGEINT (int128), which pandas silently
coerces but the driver's value hash does not — the r03 failure mode
(`null_handling_report`, `shipping_delay_modes`).  These tests pin
that an intentionally uncast SUM goes red under the gate's declared-
dtype check, and that every registered oracle in the repo stays
clean under the same check (no Spark needed — DESCRIBE only).
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.check_correctness import oracle_dtype_issues  # noqa: E402


def _types(con, sql):
    rel = con.sql(sql)
    return rel.columns, rel.types


def test_uncast_sum_fixture_goes_red():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1), (2), (3)) v(x)")
    cols, types = _types(con, "SELECT SUM(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS n FROM t")
    fails, _ = oracle_dtype_issues(cols, types)
    assert fails == ["n:HUGEINT"]


def test_cast_sum_fixture_stays_green():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1), (2), (3)) v(x)")
    cols, types = _types(
        con, "SELECT CAST(SUM(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n FROM t"
    )
    fails, warns = oracle_dtype_issues(cols, types)
    assert fails == [] and warns == []


def test_decimal_output_warns_not_fails():
    con = duckdb.connect()
    cols, types = _types(con, "SELECT CAST(1.5 AS DECIMAL(18,2)) AS d")
    fails, warns = oracle_dtype_issues(cols, types)
    assert fails == []
    assert warns == ["d:DECIMAL(18,2)"]


def test_all_registered_oracles_are_dtype_clean(duck):
    """Repo-wide sweep: no oracle may declare a HUGEINT output column.
    This is exactly the check that would have caught the two r03
    driver hash-fails before the driver did."""
    import __spark_entry__ as entrymod

    con = duck
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        cols, types = _types(con, sql)
        fails, _ = oracle_dtype_issues(cols, types)
        if fails:
            bad[name] = fails
    assert bad == {}


def test_driver_slate_rotation_contract():
    """The grading driver value-checks the FIRST 50 entries of
    ``queries()``.  r11 pinned a cross-family slate; since r12 the
    slate ROTATES (r11 verdict #2): 5 fixed relational anchors + the
    next 45 queries, in registry order, never sampled in any prior
    round's CORRECTNESS_r*.json.  Pin that the first 50 is the
    explicit DRIVER_SLATE, that every entry has a value oracle, that
    the anchors lead, and that the 45 rotating names have no prior
    driver row (so every round's sample adds new driver evidence)."""
    import glob
    import json

    import __spark_entry__ as entrymod

    from fin_trade_craft_spark.queries import DRIVER_SLATE, SLATE_ROUND

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    first50 = list(qs)[:50]
    assert first50 == DRIVER_SLATE
    assert list(oracles)[:50] == DRIVER_SLATE
    assert all(n in oracles for n in first50)

    anchors = [
        "pricing_summary",
        "top_revenue_customers",
        "regional_revenue",
        "latest_order_per_customer",
        "top_orders_per_segment",
    ]
    assert first50[:5] == anchors
    sampled_before = set()
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        if rnd < SLATE_ROUND:
            sampled_before |= set(json.load(open(f)).keys())
    rotating = first50[5:]
    already = [n for n in rotating if n in sampled_before]
    assert already == [], f"rotating slate entries already driver-sampled: {already}"
    # reordering must not drop or duplicate anything
    assert len(qs) == len(set(qs)) >= 223
