"""Skew-mitigating join (salting) — the explicit scale path for
joins whose key distribution is pathological (few keys × huge
rows-per-key), e.g. joining an event fact to a per-event-type dim:
5 distinct keys means at most 5 reducers do ALL the work, however
many executors exist.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles the
sort-merge case at runtime and is ON in this engine's sessions
(see session.py); this operator is for the shapes AQE can't touch —
a skewed shuffled hash join it didn't pick, streaming joins, or a
key so hot a single key exceeds one executor. Mechanics: the fact
side gets a deterministic salt in [0, n) (hash of its own row, not
rand() — reruns and retries must salt identically), the dim side is
replicated n×, and the join key becomes (key, salt): one hot key
now spreads over n reducers at the cost of n× the (small) dim side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``keys``, spread over
    ``n_salt`` × more reducers. Result is identical to
    ``fact.join(dim, keys, how)`` (oracle-checked in the
    ``salted_skew_join`` driver query).

    ``how`` must be fact-preserving ("inner" / "left"): replicating
    the dim side would duplicate dim-preserved unmatched rows under
    right/full joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports fact-preserving joins only (inner/left)")
    if n_salt < 1:
        # pmod(x, 0) is NULL under non-ANSI mode — the join would
        # silently return zero rows instead of failing
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt)).cast("int")
    f = fact.withColumn(SALT_COL, salt)
    d = dim.withColumn(SALT_COL, F.explode(F.expr(f"sequence(0, {n_salt - 1})"))).withColumn(
        SALT_COL, F.col(SALT_COL).cast("int")
    )
    return f.join(d, [*keys, SALT_COL], how).drop(SALT_COL)
