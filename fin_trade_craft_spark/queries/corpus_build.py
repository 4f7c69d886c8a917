"""corpus_build — the end-to-end training-corpus curation capstone
(r07 verdict task 4): every document flows through the full dedup /
quality ladder and comes out with a keep-decision and, if kept, its
sampling weight and shard assignment — the manifest a pretraining
data pipeline actually materializes.

Stage ladder (each stage operates on the SURVIVORS of the previous
one — a doc removed as an exact dup never participates in near-dup
clustering, exactly like a production pipeline):

1. exact dedup        — md5(content) group-by, keep min doc_id
2. MinHash-LSH        — banded candidates → exact-Jaccard ≥ 0.5
                        verify → connected components → keep min id
3. SemDeDup           — IVF-cell-confined cosine ≥ θ pairs →
                        connected components → keep min id
4. quality gate       — the canonical quality score (THE same
                        expression doc_quality_scores registers),
                        drop below CB_QUALITY_MIN
5. mixture weights    — temperature weights over the survivors'
                        per-source token mass (same quantized-pow
                        math as source_mixture_weights)
6. shard packing      — per-language running-token-count shards
                        (same rule as shard_packing)

Output: one row per INPUT document —
(doc_id, source, lang, n_tokens, keep_reason, kept, mix_weight,
shard_id); dropped docs carry their drop reason and NULL
weight/shard. The reasons are disjoint by construction (a doc is
judged by at most one stage, its first).

Correctness: every stage is individually value-oracled elsewhere
(dedup_exact / dedup_clusters / semdedup / doc_quality_scores /
source_mixture_weights / shard_packing); the capstone's oracle is
the COMPOSED CTE chain with the survivor restriction threaded
through — proving the ladder composes in one lazy Spark plan (plus
the two documented driver-coordinated pieces) without intermediate
writes.

Scale shape: stages 1/4/5/6 are hash aggregates and one per-lang
window over survivor token counts; stage 2's quadratic work is
confined to LSH band collisions; stage 3's to IVF cells. r09: the
expensive shared state — LSH signatures/verified pairs/components
and the semantic cell-pair edge set — comes from the SESSION MEMOS
(queries/dedup._LSH_MEMO, queries/similarity._SEM_MEMO), so the
capstone no longer re-runs the ladder the sibling queries
(dedup_clusters, leakage_safe_split, semdedup) already built in the
same session; stage 2 restricts the full-corpus components (exact —
proof at the call site), stage 3 re-runs only the component loop
over the restricted edge frame. Construction launches jobs by
design (the stage-3 component loop and, on a cold memo, the shared
builds — same exemptions as dedup_clusters/semdedup).

Reference parity: the reference has no corpus pipeline (it is a
market-data warehouse); this composes the repo's LLM-pipeline
family, cited per stage in the stage queries' own docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup as D
from ..operators.pinning import pin_on_first_action
from ..sources.catalog import load_table
from .corpus_mix import MIX_ALPHA, _with_mix_weight_quota
from .dedup import _BANDS, _MH_COLS, _NORM, _SHINGLES, _TOKS, _lsh_components
from .similarity import SEMDEDUP_THETA, _km_sql, _sem_state
from .text import QUALITY_SQL, SHARD_TOKEN_BUDGET, quality_score_expr

CB_QUALITY_MIN = 64.0  # ~10th percentile of the fixture corpus —
# drops the genuinely short/repetitive tail without gutting the
# corpus; threshold comparisons are safe because the quality
# expression is bit-exact cross-engine (doc_quality_scores oracle)


def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # one enriched pass: tokens / token count / content hash /
    # quality all derive from a single tokenize, persisted — the
    # component loops below materialize it during construction, so
    # every later stage reads the cache (no sibling-branch race)
    enriched = (
        docs.select("doc_id", "source", "lang", "text", T.tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            # size(NULL) is -1 under Spark's legacy sizeOfNull — the
            # oracle's len(NULL) is NULL, and a -1 would also poison
            # the mixture token sums; propagate NULL explicitly
            F.expr("CASE WHEN toks IS NULL THEN NULL ELSE size(toks) END")
            .cast("bigint")
            .alias("n_tokens"),
            T.content_hash(F.col("text")).alias("h"),
            quality_score_expr().alias("quality"),
        )
        .persist()
    )

    # Each stage's drop list is localCheckpoint-ed (eager) as it is
    # derived: the frames are tiny ((doc_id, reason) at dup/low-
    # quality fractions of the corpus), every later stage consumes
    # them through anti-joins, and the final manifest reads all four
    # again — without the cut, each downstream evaluation re-runs
    # the restriction joins and (worst) the component labels' self-
    # pair branch re-evaluated the whole restricted-edge lineage per
    # action (measured ~6s of the r09-interim 9s action at sf0.1).
    # corpus_build's construction launches jobs by design (lint
    # exemption); at 100 TB these materializations are the manifest
    # intermediates a production pipeline persists anyway.
    # stage 1: exact dedup (keep min doc_id per content hash)
    canon = enriched.groupBy("h").agg(F.min("doc_id").alias("__c"))
    exact_drop = (
        enriched.join(canon, "h")
        .filter(F.col("doc_id") != F.col("__c"))
        .select("doc_id", F.lit("exact_dup").alias("reason"))
        .localCheckpoint(eager=True)
    )
    s1 = enriched.join(exact_drop.select("doc_id"), "doc_id", "left_anti")

    # stage 2: MinHash-LSH near-dup drops among exact survivors —
    # derived from the SESSION-MEMOIZED full-corpus components
    # (queries/dedup._lsh_components) instead of re-running the
    # signature build + verify + component loop on s1 (r08 verdict
    # task 1). Restricting the full-corpus result is EXACT here:
    # (a) pairs(s1) = pairs(full) ∩ s1×s1 — signatures, band
    #     collisions, and Jaccard are pairwise functions of the two
    #     docs alone;
    # (b) components never split under exact-dup removal — a dropped
    #     doc d has identical normalized content to its surviving
    #     canonical c, hence identical shingles/signatures, so every
    #     edge (x, d) is mirrored by (x, c): any path through d
    #     re-routes through c within s1;
    # (c) the component minimum always survives stage 1 — if the min
    #     m were an exact-drop, its canonical c < m sits in the same
    #     component (mirror), contradicting minimality — so the full
    #     labels ARE the s1 labels.
    # The drop set (doc_id ≠ cluster_id within s1) is therefore
    # bit-identical to running the ladder on s1, which is exactly
    # what the oracle below replays.
    ncc = _lsh_components(spark, sf_dir).join(
        s1.select("doc_id"), "doc_id", "left_semi"
    )
    near_drop = (
        ncc.filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", F.lit("near_dup").alias("reason"))
        .localCheckpoint(eager=True)
    )
    s2 = s1.join(near_drop.select("doc_id"), "doc_id", "left_anti")

    # stage 3: SemDeDup among near-dup survivors (embeddings share
    # the documents' id space; docs without a vector pass through).
    # The within-cell cosine edge set comes from the session memo
    # (shared with `semdedup`) restricted to s2 on both endpoints —
    # exact for the same pairwise reason as stage 2(a). The
    # component loop DOES re-run here (semantic components can split
    # when near-dup survivors drop out — no mirror-edge guarantee),
    # but over the restricted edge frame only: edge-sized work, no
    # kernel re-execution.
    sedges_full = _sem_state(spark, sf_dir)["edges"]
    sedges = (
        sedges_full.join(s2.select(F.col("doc_id").alias("d1")), "d1", "left_semi")
        .join(s2.select(F.col("doc_id").alias("d2")), "d2", "left_semi")
        .localCheckpoint(eager=True)
    )
    scc = D.connected_components(sedges)
    sem_drop = (
        scc.filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", F.lit("semantic_dup").alias("reason"))
        .localCheckpoint(eager=True)
    )
    s3 = s2.join(sem_drop.select("doc_id"), "doc_id", "left_anti")

    # stage 4: quality gate (precomputed canonical score)
    low_drop = (
        s3.filter(F.col("quality") < CB_QUALITY_MIN)
        .select("doc_id", F.lit("low_quality").alias("reason"))
        .localCheckpoint(eager=True)
    )
    # kept = survivors MINUS low_drop (anti-join), NOT the symmetric
    # `quality >= min` filter: a NULL quality (NULL text) fails BOTH
    # comparisons, and the symmetric form silently dropped the row
    # from the manifest entirely — breaking the one-row-per-input
    # contract and diverging from the oracle, whose final CASE
    # treats not-dropped-by-any-stage as kept.
    kept = s3.join(low_drop.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", "source", "lang", "n_tokens"
    )

    # stage 5: temperature mixture over the survivors' source masses
    per_src = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
    mixw = _with_mix_weight_quota(per_src).select("source", "mix_weight")

    # stage 6: per-language token-budget shards over the survivors
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    kept_m = (
        kept.withColumn("shard_id", F.floor(before / F.lit(SHARD_TOKEN_BUDGET)).cast("bigint"))
        .join(F.broadcast(mixw), "source")  # sources are a small dimension at any scale
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            F.lit("kept").alias("keep_reason"),
            F.lit(True).alias("kept"),
            "mix_weight",
            "shard_id",
        )
    )
    drops = exact_drop.unionByName(near_drop).unionByName(sem_drop).unionByName(low_drop)
    drop_m = enriched.join(drops, "doc_id").select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        F.col("reason").alias("keep_reason"),
        F.lit(False).alias("kept"),
        F.lit(None).cast("double").alias("mix_weight"),
        F.lit(None).cast("bigint").alias("shard_id"),
    )
    # fill=False: the stage-3 component loop materializes `enriched`
    # during construction; the pin only registers it for GC-release
    # (the session-memoized LSH/semantic frames are exempt and stay).
    return pin_on_first_action(
        kept_m.unionByName(drop_m).orderBy("doc_id"), [enriched], fill=False
    )


ORACLE_CORPUS_BUILD = f"""
WITH {_km_sql()},
base0 AS MATERIALIZED (
  SELECT doc_id, source, lang, text, {_TOKS} AS toks FROM documents
),
base AS MATERIALIZED (
  SELECT doc_id, source, lang, text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         md5({_NORM}) AS content_md5,
         {QUALITY_SQL} AS quality
  FROM base0
),
g AS (SELECT content_md5, MIN(doc_id) AS canon FROM base GROUP BY content_md5),
exact_drop AS MATERIALIZED (
  SELECT doc_id FROM base JOIN g USING (content_md5) WHERE doc_id <> canon
),
s1 AS MATERIALIZED (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)),
toks_t AS (SELECT doc_id, {_TOKS} AS toks FROM s1),
sh_sets AS MATERIALIZED (SELECT doc_id, {_SHINGLES} AS shingles FROM toks_t WHERE len(toks) >= 3),
sigs AS MATERIALIZED (
  SELECT doc_id,
{_MH_COLS}
  FROM sh_sets
),
banded AS (SELECT doc_id, unnest([{_BANDS}]) AS band FROM sigs),
cands AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
),
sizes_sh AS MATERIALIZED (SELECT doc_id, len(shingles) AS n_sh FROM sh_sets),
exsh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh_sets),
inter AS MATERIALIZED (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM exsh a JOIN exsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
npairs AS MATERIALIZED (
  SELECT d1, d2
  FROM cands JOIN inter USING (d1, d2)
  JOIN sizes_sh z1 ON d1 = z1.doc_id JOIN sizes_sh z2 ON d2 = z2.doc_id
  WHERE inter / CAST(z1.n_sh + z2.n_sh - inter AS DOUBLE) >= 0.5
),
nedges AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM npairs UNION SELECT d2, d1 FROM npairs),
nrec AS MATERIALIZED (
  WITH RECURSIVE reach(node, root) AS (
    SELECT src, src FROM nedges
    UNION
    SELECT e.dst, r.root FROM reach r JOIN nedges e ON e.src = r.node
  )
  SELECT node, MIN(root) AS cluster FROM reach GROUP BY node
),
near_drop AS MATERIALIZED (SELECT node AS doc_id FROM nrec WHERE cluster <> node),
s2 AS MATERIALIZED (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)),
cells AS MATERIALIZED (SELECT vec_id, cid AS cell FROM kranked WHERE rn = 1),
exv AS MATERIALIZED (
  SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
  FROM embeddings, LATERAL (SELECT unnest(range(0, len(embedding))) AS i)
  WHERE vec_id IN (SELECT doc_id FROM s2)
),
vnorm AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CAST(floor((v * v) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS n2v
  FROM exv GROUP BY vec_id
),
-- candidate pairs first, then coordinates (join-order fix shared
-- with ORACLE_SEMDEDUP: coordinate-first planning exploded before
-- the cell restriction pruned)
scpairs AS MATERIALIZED (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.vec_id IN (SELECT doc_id FROM s2) AND b.vec_id IN (SELECT doc_id FROM s2)
),
pdots AS MATERIALIZED (
  SELECT p.d1, p.d2,
         CAST(SUM(CAST(floor((a.v * b.v) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM scpairs p
  JOIN exv a ON a.vec_id = p.d1
  JOIN exv b ON b.vec_id = p.d2 AND b.i = a.i
  GROUP BY 1, 2
),
sdp AS MATERIALIZED (
  SELECT d1, d2
  FROM pdots JOIN vnorm na ON d1 = na.vec_id JOIN vnorm nb ON d2 = nb.vec_id
  WHERE dot / (SQRT(na.n2v) * SQRT(nb.n2v)) >= {SEMDEDUP_THETA}
),
sedges AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM sdp UNION SELECT d2, d1 FROM sdp),
srec AS MATERIALIZED (
  WITH RECURSIVE reach2(node, root) AS (
    SELECT src, src FROM sedges
    UNION
    SELECT e.dst, r.root FROM reach2 r JOIN sedges e ON e.src = r.node
  )
  SELECT node, MIN(root) AS cluster FROM reach2 GROUP BY node
),
sem_drop AS MATERIALIZED (SELECT node AS doc_id FROM srec WHERE cluster <> node),
s3 AS MATERIALIZED (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM sem_drop)),
low_drop AS MATERIALIZED (SELECT doc_id FROM s3 WHERE quality < {CB_QUALITY_MIN}),
s4 AS MATERIALIZED (SELECT * FROM s3 WHERE quality >= {CB_QUALITY_MIN}),
per_src AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM s4 GROUP BY source
),
raw_t AS (
  SELECT source,
         CAST(pow(CAST(total_tokens AS DOUBLE), {MIX_ALPHA}) AS DECIMAL(28,10)) AS raw
  FROM per_src
),
wt AS (
  SELECT source, CAST(raw AS DOUBLE) / CAST(SUM(raw) OVER () AS DOUBLE) AS mix_weight
  FROM raw_t
),
pk AS (
  SELECT doc_id,
         CAST(floor(CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              / {SHARD_TOKEN_BUDGET}.0) AS BIGINT) AS shard_id
  FROM s4
),
kept_w AS (
  SELECT s4.doc_id, wt.mix_weight, pk.shard_id
  FROM s4 JOIN wt USING (source) JOIN pk USING (doc_id)
)
SELECT b.doc_id, b.source, b.lang, b.n_tokens,
  CASE WHEN ed.doc_id IS NOT NULL THEN 'exact_dup'
       WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       WHEN sd.doc_id IS NOT NULL THEN 'semantic_dup'
       WHEN ld.doc_id IS NOT NULL THEN 'low_quality'
       ELSE 'kept' END AS keep_reason,
  (ed.doc_id IS NULL AND nd.doc_id IS NULL AND sd.doc_id IS NULL
   AND ld.doc_id IS NULL) AS kept,
  kw.mix_weight, kw.shard_id
FROM base b
LEFT JOIN exact_drop ed USING (doc_id)
LEFT JOIN near_drop nd USING (doc_id)
LEFT JOIN sem_drop sd USING (doc_id)
LEFT JOIN low_drop ld USING (doc_id)
LEFT JOIN kept_w kw USING (doc_id)
ORDER BY b.doc_id
"""


QUERIES = {"corpus_build": corpus_build}
ORACLES = {"corpus_build": ORACLE_CORPUS_BUILD}
