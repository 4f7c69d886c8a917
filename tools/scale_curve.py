"""Measure the scale curve for the heaviest query families across
replica scale factors (r08 verdict task 7: at least one point
beyond the single 10× measurement the 100-TB story used to rest
on). Protocol matches bench.py: local[$SPARK_GRAFT_CPUS], noop-sink
materialization, min-of-2 per query, one session per scale factor.

Usage: python tools/scale_curve.py <sf_dir> [query ...]
Prints one JSON line {"sf_dir": ..., "queries": {name: [cold, warm]},
"mem": {name: {...}}}.

r09 verdict task 7: alongside wall time, each attempt records the
memory/spill posture from the UI REST stage metrics (the same
numbers the Spark UI shows) attributed to the stages the attempt
ran: peak_exec_mem = max per-stage peakExecutionMemory (summed over
the stage's tasks by Spark), spill = total memory+disk bytes
spilled. A nonzero spill at a given SF is the direct "partition no
longer fits executor memory" tripwire the 100-TB sizing notes need.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# One representative per heavy family (text / dedup / similarity /
# capstones / fin pipeline), plus a relational anchor.
DEFAULT_QUERIES = [
    "pricing_summary",
    "unigram_logprob_scores",
    "bigram_interpolated_scores",
    "doc_repetition_filter",
    "tfidf_top_terms",
    "bpe_merge_rounds",
    "minhash_near_dupes",
    "dedup_jaccard_verified",
    "simhash_hamming_pairs",
    "leakage_safe_split",
    "semdedup",
    "ivf_search",
    "kmeans_centroids",
    "ivf_pq_search",
    "corpus_build",
    "corpus_build_ingest",
    "corpus_build_ingest_stored",
    "fin_signals_pipeline",
]


def _stage_snapshot(spark) -> dict[int, dict]:
    """Completed/failed stage metrics from the UI REST API (always
    on in the engine's sessions) keyed by (stageId, attemptId)."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return {(s["stageId"], s["attemptId"]): s for s in _json.load(r)}
    except Exception:
        return {}


def _attempt_mem(before: dict, after: dict) -> dict:
    """peak/spill over the stages this attempt added."""
    new = [s for k, s in after.items() if k not in before]
    return {
        "peak_exec_mem": max((s.get("peakExecutionMemory", 0) for s in new), default=0),
        "spill_mem": sum(s.get("memoryBytesSpilled", 0) for s in new),
        "spill_disk": sum(s.get("diskBytesSpilled", 0) for s in new),
        "n_stages": len(new),
    }


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES

    from fin_trade_craft_spark.queries import all_queries
    from fin_trade_craft_spark.session import get_spark

    spark = get_spark(
        "scale_curve", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # Both attempts are recorded: for session-memoized queries the
    # FIRST attempt carries the one-time index build (LSH signatures,
    # semantic edges, codebooks) and the second the warm serving cost
    # — the scale curve needs both (build cost scales with the
    # corpus; serving cost with the probe set).
    timings: dict[str, list[float]] = {}
    mem: dict[str, list[dict]] = {}
    for name in names:
        atts = []
        matts = []
        for _ in range(2):
            before = _stage_snapshot(spark)
            t0 = time.time()
            df = q[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            atts.append(round(time.time() - t0, 3))
            matts.append(_attempt_mem(before, _stage_snapshot(spark)))
            del df
            gc.collect()
        timings[name] = atts
        mem[name] = matts
        spill = max(m["spill_mem"] + m["spill_disk"] for m in matts)
        peak = max(m["peak_exec_mem"] for m in matts)
        print(
            f"# {name}: {atts} peak_exec_mem={peak/1e6:.0f}MB spill={spill/1e6:.0f}MB",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "queries": timings, "mem": mem}))


if __name__ == "__main__":
    main()
