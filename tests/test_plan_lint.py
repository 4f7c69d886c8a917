"""Plan lint over the ENTIRE registered query surface: no batch
query may plan a CartesianProduct (the unbounded all-pairs join —
every intentional cross join in the repo is against a 1-row or
dimension-sized frame and must come out as a broadcast nested-loop
instead). Catches future regressions where a join condition is
dropped or a broadcast threshold change degrades a plan, without
executing anything: we inspect the pre-AQE physical plan.

Streaming queries are excluded — building them executes a drain."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.queries import all_queries  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def test_no_cartesian_product_in_any_plan(spark):
    offenders = {}
    for name, fn in sorted(all_queries().items()):
        if name.startswith("streaming_"):
            continue
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = [
                ln.strip() for ln in plan.splitlines() if "CartesianProduct" in ln
            ][:2]
    assert not offenders, f"CartesianProduct planned in: {offenders}"
