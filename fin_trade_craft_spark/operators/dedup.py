"""Deduplication operators for training-data pipelines.

Four tiers, cheapest-first — the standard LLM-corpus dedup ladder:

1. **Exact** — hash-groupBy on normalized content (one shuffle on
   the hash; at 100 TB this is a map-side md5 + shuffle of 16-byte
   keys, not documents).
2. **MinHash + LSH** — shingle → k min-hashes → band → bucket-join.
   Candidate generation touches only band-bucket collisions, so the
   pair space is ~linear, not quadratic. Hashes derive from md5 so
   signatures are deterministic across engines and runs (no seeded
   RNG to ship to executors).
3. **SimHash** — per-token md5-nibble votes → compact bit
   signature; near-dup = same signature bucket (Hamming-style).
4. **Exact n-gram Jaccard** — the verifier: computed only on
   candidate pairs (from 2/3) or, at fixture scale, on the full
   shingle self-join.

All four are pure DataFrame expressions — no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def with_shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """doc_id + distinct k-shingle array (drops docs shorter than
    one shingle)."""
    d = docs.select(id_col, T.tokens(F.col(text_col)).alias("toks"))
    return (
        d.filter(F.expr(f"size(toks) >= {k}"))
        .select(id_col, T.shingles("toks", k).alias("shingles"))
    )


def exploded_shingles(shingle_sets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return shingle_sets.select(id_col, F.explode("shingles").alias("shingle"))


def exact_jaccard_pairs(shingle_sets: DataFrame, id_col: str = "doc_id", min_jaccard: float = 0.5) -> DataFrame:
    """All pairs sharing ≥1 shingle, with exact Jaccard ≥ threshold.
    Quadratic in colliding docs — use after LSH candidate pruning at
    scale; exact at fixture scale.

    Shape matters more than the math here: set sizes ride along on
    the exploded frame (one pass over the tokenize→shingle chain
    instead of four — two join branches + two size lookups), and the
    self-join keys on ``xxhash64(shingle)`` so the shuffle carries
    8-byte longs, not variable-length n-gram strings. A 64-bit
    collision would merge two shingles' doc lists (p ≈ n²/2⁶⁵ —
    immaterial below ~billions of distinct shingles, and the
    DuckDB-oracle differential would surface one at test scale)."""
    base = shingle_sets.select(
        id_col,
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    ).select(id_col, "n_sh", F.xxhash64("shingle").alias("sh"))
    a = base.select(F.col(id_col).alias("d1"), F.col("n_sh").alias("n1"), "sh")
    b = base.select(F.col(id_col).alias("d2"), F.col("n_sh").alias("n2"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
    )
    out = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double")
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_signatures(shingle_sets: DataFrame, id_col: str = "doc_id", num_perm: int = 8) -> DataFrame:
    """k deterministic min-hashes per doc: perm i = min over
    shingles of md5('<i>:'||shingle). String-min over lowercase hex
    is a total order identical in any engine."""
    cols = [
        F.expr(f"array_min(transform(shingles, s -> md5(concat('{i}:', s))))").alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return shingle_sets.select(id_col, *cols)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", num_perm: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature and join docs sharing any band value."""
    n_bands = num_perm // rows_per_band
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(id_col, F.explode(bands).alias("band"))
    a = banded.select(F.col(id_col).alias("d1"), "band")
    b = banded.select(F.col(id_col).alias("d2"), "band")
    return a.join(b, "band").filter(F.col("d1") < F.col("d2")).select("d1", "d2").distinct()


def simhash_bits(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_bits: int = 16) -> DataFrame:
    """SimHash-style signature: bit j votes +1/−1 per token
    depending on the j-th nibble of md5(token); bit set iff the sum
    is positive. Deterministic; identical SQL exists in any engine
    with md5 + substr."""
    d = docs.select(id_col, T.tokens(F.col(text_col)).alias("toks"))
    bit_exprs = []
    for j in range(1, n_bits + 1):
        vote = (
            f"aggregate(toks, 0, (acc, t) -> acc + "
            f"(CASE WHEN substr(md5(t), {j}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END))"
        )
        bit_exprs.append(f"(CASE WHEN ({vote}) > 0 THEN '1' ELSE '0' END)")
    sig = F.expr("concat(" + ", ".join(bit_exprs) + ")")
    return d.select(id_col, sig.alias("simhash"))
