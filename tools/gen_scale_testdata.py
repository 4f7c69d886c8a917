"""Generate a scaled-up replica of /root/testdata/sf0.1 for scale
validation (default sf1 = 10 replicas into .testdata/sf1).

The driver's seed-42 generator is not shipped, so sf1 is built by
REPLICATING sf0.1 with disjoint key spaces — the scaling properties
the bench cares about are preserved by construction:

- dims (region, nation) stay fixed, as in TPC-H;
- every entity/fact key gets a per-replica offset (parity-preserving,
  so odd/even doc_id splits keep their meaning), giving 10x rows with
  10x key cardinality and the SAME per-key group sizes — the correct
  shape for windowed/grouped scaling (more groups, not deeper ones);
- document text gets a per-replica token suffix, so each replica's
  shingle space is DISJOINT: planted near-dup pairs replicate per
  replica and LSH candidate counts scale linearly. Naive duplication
  would make every doc a 10-way exact dup and blow candidate pairs up
  quadratically — a dup-storm benchmark, not a scale benchmark;
- embeddings get a per-replica seeded coordinate permutation + sign
  flip (an orthogonal transform: norms and within-replica pairwise
  angles are exactly preserved, across-replica vectors decorrelate,
  so SRP/IVF candidate structure also scales linearly).

Usage: python tools/gen_scale_testdata.py [n_replicas] [out_dir]
       (defaults: 10 /root/repo/.testdata/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# large, even, parity-preserving key offsets (well past any sf0.1 key)
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _offset_columns(tbl: pa.Table, cols: list[str], r: int) -> pa.Table:
    for c in cols:
        i = tbl.schema.get_field_index(c)
        arr = tbl.column(i)
        shifted = pa.chunked_array(
            [pa.compute.add(chunk, r * OFF).cast(arr.type) for chunk in arr.chunks]
        )
        tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
    return tbl


def _mutate_documents(tbl: pa.Table, r: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    suffix = f"_r{r}"
    new_texts = [
        None if t is None else " ".join(tok + suffix for tok in t.split()) for t in texts
    ]
    n_chars = [None if t is None else len(t) for t in new_texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), tbl.schema.field("text"), pa.array(new_texts)
    )
    i = tbl.schema.get_field_index("n_chars")
    return tbl.set_column(i, tbl.schema.field(i), pa.array(n_chars, type=pa.int64()))


def _mutate_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    vecs = tbl.column("embedding").to_pylist()
    dim = len(next(v for v in vecs if v))
    rng = np.random.default_rng(42 + r)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    new = [
        None if v is None else (np.asarray(v, dtype=np.float32)[perm] * signs).tolist()
        for v in vecs
    ]
    i = tbl.schema.get_field_index("embedding")
    return tbl.set_column(i, tbl.schema.field(i), pa.array(new, type=tbl.schema.field(i).type))


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata/sf1"
    os.makedirs(out, exist_ok=True)

    for t in DIMS:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl, f"{out}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (dim, copied)")

    for t, keys in KEY_COLS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(n_rep):
            tbl = _offset_columns(base, keys, r)
            if r > 0 and t == "documents":
                tbl = _mutate_documents(tbl, r)
            if r > 0 and t == "embeddings":
                tbl = _mutate_embeddings(tbl, r)
            reps.append(tbl)
        full = pa.concat_tables(reps)
        pq.write_table(full, f"{out}/{t}.parquet", row_group_size=200_000)
        print(f"{t}: {base.num_rows} -> {full.num_rows} rows")


if __name__ == "__main__":
    main()
