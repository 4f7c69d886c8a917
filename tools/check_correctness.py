"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at the given sf dir, then compares row count, column
names, and (column-name-sorted, row-sorted) cell values exactly.
Floats must be bit-identical — the engine's exact-decimal discipline
makes that achievable; near-misses are reported with max abs diff to
aid debugging.

The driver's value hash is *declared-dtype* sensitive, but pandas
canonicalization below coerces integer families to Int64 — which in
r03 masked two oracles whose bare ``SUM(CASE...)`` DuckDB typed as
HUGEINT (int128) and the driver hash-failed.  So before comparing we
now also validate the oracle's declared DuckDB result types: any
HUGEINT/UHUGEINT output column is a hard FAIL (cast it in the SQL),
and a DECIMAL output whose Spark twin is a float is a warning.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --lint   # DESCRIBE-only sweep,
           no Spark: flags HUGEINT/DECIMAL outputs in every oracle
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


_BAD_DECLARED = ("HUGEINT", "UHUGEINT", "INT128")


def oracle_dtype_issues(columns: list[str], types: list) -> tuple[list[str], list[str]]:
    """Split declared DuckDB output types into (hard fails, warnings).

    HUGEINT-family columns are hard fails: pandas coerces them to
    float64/object so the local compare can still pass while the
    driver's dtype-sensitive hash diverges.  DECIMAL outputs are
    warnings — the repo discipline is to CAST to DOUBLE explicitly.
    """
    fails, warns = [], []
    for col, t in zip(columns, types):
        ts = str(t).upper()
        if any(b in ts for b in _BAD_DECLARED):
            fails.append(f"{col}:{ts}")
        elif "DECIMAL" in ts:
            warns.append(f"{col}:{ts}")
    return fails, warns


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return False, f"columns spark={sc} oracle={oc}"
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64").to_numpy()
            bv = bv.astype("float64").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = ~eq
                with np.errstate(invalid="ignore"):
                    md = np.nanmax(np.abs(av[bad] - bv[bad]))
                return False, f"col {c}: {bad.sum()} mismatches, max|diff|={md:g}"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                return False, f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
    return True, "ok"


def lint_oracles(sf_dir: str) -> int:
    """Spark-free sweep: DESCRIBE every oracle on DuckDB and flag
    declared output dtypes the driver hash would choke on."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    from fin_trade_craft_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")
    n_fail = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(sql)
            fails, warns = oracle_dtype_issues(rel.columns, rel.types)
        except Exception as e:
            print(f"FAIL  {name}: oracle does not bind: {e}")
            n_fail += 1
            continue
        if fails:
            print(f"FAIL  {name}: driver-hash-unsafe declared dtypes: {fails}")
            n_fail += 1
        elif warns:
            print(f"WARN  {name}: decimal output columns (cast to DOUBLE?): {warns}")
    print(f"\nlint: {n_fail} oracle(s) with hash-unsafe declared dtypes")
    return 1 if n_fail else 0


def main() -> int:
    sys.path.insert(0, "/root/repo")

    args = [a for a in sys.argv[1:] if a != "--lint"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if "--lint" in sys.argv[1:]:
        return lint_oracles(sf_dir)

    import __spark_entry__ as entrymod

    from fin_trade_craft_spark.session import get_spark
    from fin_trade_craft_spark.sources.catalog import TABLES

    only = set(args[1:])

    # SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2" — e.g. raising the guarded
    # exact-tier row budget for an offline sf1 verification sweep
    # (spark.fin_trade_craft.exactTierMaxRows=200000), exactly the
    # escape hatch the guard's error message documents. Split on
    # bare commas: values containing commas (e.g. JVM option lists)
    # are NOT supported here — this is a test-tool knob, not a
    # general conf channel.
    import os

    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    # ADVICE r09: every registered DuckDB oracle replays the FLAT
    # quantizer build, but quantizer=auto flips the embedding family
    # to the hierarchical tier above HIER_MIN_ROWS (50k vectors — the
    # sf5 replica crosses it). Pin flat here so an oracle sweep at ANY
    # scale compares like with like; the hierarchical tier keeps its
    # own oracles (hierarchical_cell_stats replays the two-level build
    # explicitly, independent of this conf). SPARK_GRAFT_EXTRA_CONF
    # can still override for tier-divergence experiments.
    extra.setdefault("spark.fin_trade_craft.quantizer", "flat")
    spark = get_spark("correctness-check", shuffle_partitions=8, extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(sdf)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dtype_fails, dtype_warns = oracle_dtype_issues(rel.columns, rel.types)
            odf = rel.df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if dtype_fails:
            print(f"FAIL  {name}: driver-hash-unsafe declared dtypes: {dtype_fails}")
            n_fail += 1
            continue
        if dtype_warns:
            print(f"WARN  {name}: decimal output columns: {dtype_warns}")
        ok, msg = compare(sdf, odf)
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: rows={len(sdf)} {msg if not ok else ''} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
