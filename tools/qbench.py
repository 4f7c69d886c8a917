"""Focused per-query bench: fresh JVM, same warmup + noop-sink +
min-of-2 methodology as bench.py, but only for the named queries —
the A/B instrument for optimization work (a full bench re-run costs
~13 min and carries cross-query cache interference; this isolates
the queries under study).

Usage: python tools/qbench.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       QBENCH_ATTEMPTS    (default 2)
Prints one JSON line: {"queries": {name: min_sec}, "attempts": {...}}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_att = int(os.environ.get("QBENCH_ATTEMPTS", "2"))

    from fin_trade_craft_spark.queries import all_queries
    from fin_trade_craft_spark.session import get_spark

    spark = get_spark("qbench", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    warm = spark.createDataFrame([(1, 1.0)], "k int, v double")
    warm.groupBy("k").applyInPandas(lambda p: p, "k int, v double").count()
    smoke = "/root/testdata/sf0.001"
    warm_dir = smoke if os.path.isdir(smoke) else sf_dir
    queries["pricing_summary"](spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    attempts: dict[str, list[float]] = {}
    for name in names:
        best = None
        attempts[name] = []
        for _ in range(n_att):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            attempts[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            del df
            gc.collect()
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings, "attempts": attempts}))


if __name__ == "__main__":
    main()
