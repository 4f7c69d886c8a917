"""Embedding similarity search (LLM-pipeline ANN operators).

Baseline: brute-force cosine top-k — broadcast the (small) query
set against the corpus; per-pair dot products run as JVM
higher-order functions (``zip_with`` + ``aggregate``) with an exact
DECIMAL accumulator, so scores are order-independent and
bit-reproducible at any parallelism.

Scale path: IVF — assign vectors to coarse centroids (k-means-style,
here the provided ``label`` partitions or computed centroids), probe
only the nearest partitions. Candidate set shrinks from N to
N/k_partitions × n_probe; same top-k tail.

A Pandas-UDF (numpy matmul) variant exists for throughput when
bit-reproducibility is not required; the decimal path is the
correctness reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Float accumulation scheme: round each double product to an
# integer number of 1e-12 units via floor(x*1e12 + 0.5) — pure IEEE
# double ops with identical results in every engine — then sum the
# resulting BIGINTs exactly. We deliberately avoid double→DECIMAL
# casts here: engines disagree on the rounding mode (HALF_UP vs
# half-even), and raw binary floats DO land on exact 1e-12 ties
# (any dyadic m/2^(s+1) with odd m), unlike decimal-valued money
# columns which provably can't tie. Scaled sums stay < 2^53, so the
# final integer→double conversion is exact.
_SCALE = "1e12"


def _scaled(prod: str) -> str:
    return f"CAST(floor(({prod}) * {_SCALE} + 0.5) AS BIGINT)"


def dot_exact(a: str, b: str) -> Column:
    """Order-independent dot product of two array<float> columns."""
    return F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
        f" {_scaled('CAST(x AS DOUBLE) * CAST(y AS DOUBLE)')}),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / {_SCALE}"
    )


def norm2_exact(a: str) -> Column:
    """Order-independent squared L2 norm of an array<float> column."""
    return F.expr(
        f"CAST(aggregate({a}, CAST(0 AS BIGINT), (acc, x) ->"
        f" acc + {_scaled('CAST(x AS DOUBLE) * CAST(x AS DOUBLE)')}) AS DOUBLE) / {_SCALE}"
    )


def cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    return dot / (F.sqrt(n2a) * F.sqrt(n2b))


def cosine_pairs_kernel(
    pairs: DataFrame, e1: str = "e1", e2: str = "e2", out: str = "cos_sim"
) -> DataFrame:
    """Arrow-batched numpy twin of
    ``cosine(dot_exact(e1,e2), norm2_exact(e1), norm2_exact(e2))``
    for PAIR frames: identical fixed-point arithmetic (per-product
    floor(x·1e12+0.5) → exact int64 sums → one double division), so
    results are bit-equal to the HOF-expression path — but one
    vectorized numpy pass per batch instead of three interpreted
    64-element lambda folds per ROW, which dominates verify-stage
    wall on large candidate sets. Passes every non-vector column
    through; replaces the two vector columns with ``out``.

    Stated edges of the bit-equality claim (ADVICE r05):

    - **Zero-norm vectors**: cosine is 0/0. The HOF-expression path
      yields a double NaN; this kernel also computes NaN, but Arrow's
      nan_as_null maps it to SQL NULL on the way back — NULL here vs
      NaN there. Threshold filters (``>= θ``) agree in both cases
      (NaN and NULL both fail a comparison), which is why every
      in-repo consumer is unaffected; don't rely on the distinction
      elsewhere.
    - **Vector length**: all vectors in a frame must share one
      dimensionality. Mixed lengths would stack into a ragged object
      array whose ``A * B`` crashes obscurely — np.stack below turns
      that into an explicit per-batch error instead."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    keep = [c for c in pairs.columns if c not in (e1, e2)]
    schema = StructType(
        [pairs.schema[c] for c in keep] + [StructField(out, DoubleType())]
    )

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL vectors -> NaN, which Arrow's nan_as_null maps
            # back to SQL NULL — exactly the HOF-expression path's
            # output (and stacking a None would make the batch
            # ragged / crash)
            valid = (pdf[e1].notna() & pdf[e2].notna()).to_numpy()
            cos = np.full(len(pdf), np.nan)
            if valid.any():
                try:
                    A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[e1][valid]])
                    B = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[e2][valid]])
                except ValueError as e:
                    raise ValueError(
                        "cosine_pairs_kernel requires a uniform vector length "
                        f"within the frame ({e1}/{e2}): {e}"
                    ) from None
                dots = np.floor(A * B * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12
                n2a = np.floor(A * A * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12
                n2b = np.floor(B * B * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12
                cos[valid] = dots / (np.sqrt(n2a) * np.sqrt(n2b))
            o = pdf[keep].copy()
            o[out] = cos
            yield o

    return pairs.mapInPandas(fn, schema)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (self excluded),
    with EXACT scaled-integer scoring (bit-reproducible, oracle-
    hashable — this is the correctness-reference path; the float
    twin below trades that for matmul throughput).

    The query matrix rides to every task in the kernel closure
    (queries are benchmark-sized by contract) — the corpus is never
    shuffled, each Arrow batch scores its slice in vectorized numpy
    using the same per-product floor(x*1e12+0.5) → int64-sum
    arithmetic as ``dot_exact`` (bit-identical: IEEE doubles and
    exact integer adds), and emits only its LOCAL top-k per query.
    The global window then ranks k·|queries| rows per batch, not the
    corpus — top-k of a union is the top-k of local top-ks under the
    same deterministic (cos desc, nid asc) order. (r02 shape was a
    broadcast crossJoin with per-pair interpreted zip_with/aggregate
    lambdas — same values, ~3× the wall time.)

    Degenerate (zero-norm) embeddings: cosine is undefined (0/0), so
    zero-norm CORPUS vectors are excluded from every candidate set
    and a zero-norm QUERY returns no neighbors. Without the explicit
    filter the two stages would disagree — np.lexsort places NaN
    last (silently dropped from local top-k) while Spark's
    ``F.desc`` ranks NaN first in the global window."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    if not q_rows:
        # empty query set → empty result (np.asarray([]) would be 1-D
        # and crash the axis-1 sums below)
        spark = corpus.sparkSession
        return spark.createDataFrame([], "qid long, rank int, nid long, cos_sim double")
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.asarray([np.asarray(r[1], dtype=np.float64) for r in q_rows], dtype=np.float64)
    n2q = np.floor(Q * Q * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            Cm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
            )
            n2c = np.floor(Cm * Cm * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                if n2q[j] == 0.0:
                    continue  # zero-norm query: cosine undefined, no neighbors
                dots = np.floor(Cm * Q[j] * 1e12 + 0.5).astype(np.int64).sum(axis=1) / 1e12
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (np.sqrt(n2q[j]) * np.sqrt(n2c))
                mask = (ids != qids[j]) & (n2c > 0.0)
                s, nid = cos[mask], ids[mask]
                order = np.lexsort((nid, -s))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(nid[order])
                out_s.extend(s[order])
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "cos_sim": out_s})

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "qid long, nid long, cos_sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos_sim")
    )


def knn_bruteforce_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Throughput variant of ``knn_bruteforce``: Arrow-batched
    ``mapInPandas`` with one numpy matmul per batch instead of
    per-pair JVM lambda accumulation. ~IEEE-double accurate but NOT
    bit-reproducible across summation orders (BLAS folds in
    whatever order it likes) — use the decimal path when results
    must hash-match an oracle; use this when scoring throughput is
    the budget.

    Scale shape: identical to the exact path — the query matrix
    rides to every task in the UDF closure (queries are
    benchmark-sized by contract), the corpus is never shuffled, and
    each batch emits only its LOCAL top-k per query, so the final
    global top-k window sees k·|queries| rows per batch, not the
    corpus."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([list(r[1]) for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        qmat = np.where(qnorm > 0, qmat / qnorm, np.nan)
    q_ok = qnorm[:, 0] > 0

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                cmat = np.where(cnorm > 0, cmat / cnorm, np.nan)
            sims = cmat @ qmat.T  # (n_corpus_batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                if not q_ok[j]:
                    continue  # zero-norm query: cosine undefined, no neighbors
                mask = (ids != qids[j]) & (cnorm[:, 0] > 0)
                s, nid = sims[mask, j], ids[mask]
                # local top-k, ties broken by nid asc (matches the
                # exact path's deterministic ordering)
                order = np.lexsort((nid, -s))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(nid[order])
                out_s.extend(s[order])
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "cos_sim": out_s})

    c = corpus.select(id_col, vec_col)
    scored = c.mapInPandas(score, "qid long, nid long, cos_sim double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos_sim")
    )
