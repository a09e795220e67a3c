"""MEASUREMENT-ONLY scale-up of the driver testdata (guide §1).

Builds a sfN-proxy directory by replicating /root/testdata/sf0.1 K
times with disjoint key spaces, so optimizations can be measured at
the driver's escalated scale (BENCH_r05 ran sf=1.0) instead of only
at sf0.1. The proxy is NOT the driver's generator output — absolute
numbers differ — but candidate-volume structure matches where it
matters (simhash pigeonhole buckets are width-bound, so any 50k-doc
corpus reproduces the sf1.0 hot-bucket blowup; each replica block
reproduces sf0.1's internal near-dup structure for MinHash/Jaccard).

Key handling per table:
- events: event_id/user_id offset per replica (conv count scales 10x,
  turns/conv constant — matches the derivation's per-user windows).
- documents: doc_id offset; every TOKEN gets a per-replica suffix for
  k>0, so replicas are fully dissimilar (no artificial cross-replica
  near-dup explosion) while each block keeps sf0.1's similarity
  structure.
- embeddings: vec_id offset; vectors perturbed by a deterministic
  per-replica epsilon (keeps the space near-isotropic, avoids 10
  exact copies of every vector collapsing ANN candidate sets).
- lineitem/orders/customer/part/supplier: all keys offset jointly so
  join fan-outs are preserved; nation/region stay fixed (they are
  sf-independent in TPC-H).

Usage: python tools/make_bench_sf.py [K] [out_dir]
       (defaults: K=10, out_dir=/tmp/sfproxy_{K}x)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    "events": {"event_id": 100_000, "user_id": 10_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 10_000},
    "customer": {"c_custkey": 100_000},
    "part": {"p_partkey": 100_000} ,
    "supplier": {"s_suppkey": 10_000},
    "embeddings": {"vec_id": 100_000},
    "documents": {"doc_id": 100_000},
}
FIXED = ("nation", "region")


def _suffix_tokens(arr: pa.ChunkedArray, k: int) -> pa.Array:
    """Append ' r<k>' marker to every token: split on space, add the
    marker to each word via replace on the separator + bounds."""
    # "a b c" -> "a#k b#k c#k": replace " " with "#k " then append "#k"
    marker = f"·{k}"  # middle dot keeps tokens letter-adjacent
    s = pc.replace_substring(arr, " ", marker + " ")
    return pc.binary_join_element_wise(s, pa.scalar(marker), "")


def replicate(table: str, k_total: int, out_dir: str) -> None:
    src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    if table in FIXED:
        pq.write_table(src, os.path.join(out_dir, f"{table}.parquet"))
        return
    parts = []
    for k in range(k_total):
        t = src
        for col, off in OFFSETS.get(table, {}).items():
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pc.add(t.column(col), k * off))
        if table == "documents" and k > 0:
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, "text", _suffix_tokens(t.column("text"), k))
        if table == "embeddings" and k > 0:
            idx = t.schema.get_field_index("embedding")
            emb = t.column("embedding").combine_chunks()
            flat = emb.values.to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(1234 + k)
            pert = flat + rng.normal(0, 0.05 * (np.abs(flat).mean() + 1e-9), flat.shape)
            new = pa.ListArray.from_arrays(emb.offsets, pa.array(pert, type=emb.values.type))
            t = t.set_column(idx, "embedding", new)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, f"{table}.parquet"))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfproxy_{k}x"
    os.makedirs(out_dir, exist_ok=True)
    for table in list(OFFSETS) + list(FIXED):
        replicate(table, k, out_dir)
        print(f"wrote {table} x{k}", file=sys.stderr)
    open(os.path.join(out_dir, "_DONE"), "w").close()
    print(out_dir)


if __name__ == "__main__":
    main()
