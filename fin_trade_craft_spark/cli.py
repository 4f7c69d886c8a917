"""Pipeline CLI — the reference's operational entry points
(`transforms/run_daily_transform.py:367-421` --only/--skip/--dry-run,
`rebuild_signals_from_scratch.py:243-255` --check-only) over the
Spark pipeline, so a reference user keeps their invocation habits:

    python -m fin_trade_craft_spark.cli --warehouse /path/wh
    python -m fin_trade_craft_spark.cli --only fundamentals quality
    python -m fin_trade_craft_spark.cli --skip market
    python -m fin_trade_craft_spark.cli --dry-run
    python -m fin_trade_craft_spark.cli --check-only

Exit code 1 if any transform fails (the reference's per-script
exit-code contract); --dry-run prints the would-run plan without a
SparkSession.
"""

from __future__ import annotations

import argparse
import sys

from .plans.pipeline import DEFAULT_GROUP_ORDER


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fin_trade_craft_spark",
        description="Run the daily transformation pipeline on the parquet warehouse",
    )
    p.add_argument("--warehouse", default="warehouse", help="warehouse root directory")
    p.add_argument("--only", nargs="+", choices=DEFAULT_GROUP_ORDER, help="run only these groups")
    p.add_argument("--skip", nargs="+", choices=DEFAULT_GROUP_ORDER, help="skip these groups")
    p.add_argument("--include-market", action="store_true", help="include the market group (21k-symbol pass; reference default-off)")
    p.add_argument("--dry-run", action="store_true", help="print what would run without executing")
    p.add_argument("--check-only", action="store_true", help="consistency report only (rebuild --check-only analog)")
    p.add_argument(
        "--daily-market",
        metavar="SF_DIR",
        help="orchestrated daily market run over an sf parquet dir: "
        "incremental discovery (watermark ledger) -> indicators -> "
        "signals -> screener -> chart input, with stage breakdown",
    )
    p.add_argument(
        "--staleness-hours",
        type=float,
        default=168.0,
        help="ledger staleness threshold for --daily-market work discovery",
    )
    return p


def resolve_groups(only: list[str] | None, skip: list[str] | None, include_market: bool) -> list[str]:
    if only and skip:
        raise SystemExit("Cannot use --only and --skip together")
    groups = list(only) if only else [
        g for g in DEFAULT_GROUP_ORDER if include_market or g != "market"
    ]
    if skip:
        groups = [g for g in groups if g not in skip]
    return groups


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    groups = resolve_groups(args.only, args.skip, args.include_market)

    if args.dry_run:
        for g in groups:
            print(f"would run group: {g}")
        return 0

    from .plans.pipeline import build_default_pipeline, consistency_check
    from .session import get_spark
    from .sources.io import TableIO

    spark = get_spark("fin-trade-craft-pipeline")
    io = TableIO(spark, args.warehouse)

    if args.daily_market:
        from .plans.daily_run import run_daily_market

        rep = run_daily_market(
            spark, args.daily_market, io, staleness_hours=args.staleness_hours
        )
        for line in rep.lines():
            print(line)
        return 0

    if args.check_only:
        for row in consistency_check(io).collect():
            print(
                f"{row.table_name}: rows={row.n_rows} symbols={row.n_symbols}"
                f" dates=[{row.min_date} .. {row.max_date}]"
            )
        return 0

    pipeline = build_default_pipeline(io)
    results = pipeline.run(include_market=args.include_market, only_groups=groups)
    ok = True
    for r in results:
        status = "OK " if r.ok else "FAIL"
        print(f"[{status}] {r.group}/{r.name}: rows={r.rows}{' err=' + r.error if r.error else ''}")
        ok = ok and r.ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
