"""Measure the scale curve for the heaviest query families across
replica scale factors (r08 verdict task 7: at least one point
beyond the single 10× measurement the 100-TB story used to rest
on). Protocol matches bench.py: local[$SPARK_GRAFT_CPUS], noop-sink
materialization, min-of-2 per query, one session per scale factor.

Usage: python tools/scale_curve.py <sf_dir> [query ...]
Prints one JSON line {"sf_dir": ..., "queries": {name: sec}}.
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
    "fin_signals_pipeline",
]


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
    for name in names:
        atts = []
        for _ in range(2):
            t0 = time.time()
            df = q[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            atts.append(round(time.time() - t0, 3))
            del df
            gc.collect()
        timings[name] = atts
        print(f"# {name}: {atts}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
