"""Per-job/stage profile of one or more registered queries: runs the
query through the noop sink (bench methodology) and then reads the
live Spark UI REST API for per-job wall clock and per-stage task
time, shuffle read/write bytes, spill, and task counts — the
empirical loop of the optimization guide (§1.1) without leaving the
terminal.

Usage: python tools/jobprof.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       JOBPROF_ATTEMPTS   (default 2; the LAST attempt is profiled —
                           steady state, matching bench min-of-2)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_att = int(os.environ.get("JOBPROF_ATTEMPTS", "2"))

    from fin_trade_craft_spark.queries import all_queries
    from fin_trade_craft_spark.session import get_spark

    spark = get_spark("jobprof", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    warm = spark.createDataFrame([(1, 1.0)], "k int, v double")
    warm.groupBy("k").applyInPandas(lambda p: p, "k int, v double").count()
    smoke = "/root/testdata/sf0.001"
    warm_dir = smoke if os.path.isdir(smoke) else sf_dir
    queries["pricing_summary"](spark, warm_dir).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        dts = []
        for att in range(n_att):
            if att == n_att - 1:  # profile only the last (steady-state) attempt
                jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
            spark.sparkContext.setJobDescription(f"jobprof:{name}:a{att}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dts.append(round(time.time() - t0, 3))
            del df
            gc.collect()
        jobs = [j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: attempts={dts} (profiled: last) ===")
        stages_idx = {s["stageId"]: s for s in _get(f"{base}/stages?status=complete")}
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_done = j.get("completionTime", "")
            dur = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d0 = datetime.strptime(t_sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                d1 = datetime.strptime(t_done.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(d1 - d0).total_seconds():6.2f}s"
            except Exception:
                dur = "      ?"
            desc = (j.get("description") or j.get("name", ""))[:80]
            print(f"job {j['jobId']:>4} {dur}  tasks={j.get('numCompletedTasks', 0):>4}  {desc}")
            for sid in sorted(j.get("stageIds", [])):
                s = stages_idx.get(sid)
                if s is None:
                    continue
                nm = s.get("name", "")[:60]
                print(
                    f"    stage {sid:>4} tasks={s.get('numCompleteTasks', 0):>4}"
                    f" exec={s.get('executorRunTime', 0)/1000:7.1f}s"
                    f" in={_fmt_bytes(s.get('inputBytes', 0)):>9}"
                    f" sr={_fmt_bytes(s.get('shuffleReadBytes', 0)):>9}"
                    f" sw={_fmt_bytes(s.get('shuffleWriteBytes', 0)):>9}"
                    f" spill={_fmt_bytes(s.get('diskBytesSpilled', 0)):>8}"
                    f"  {nm}"
                )


if __name__ == "__main__":
    main()
