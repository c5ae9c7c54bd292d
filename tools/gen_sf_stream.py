#!/usr/bin/env python3
"""Streaming variant of gen_sf.py for the sf100 decade (1000 replicas of
sf0.1 ~= 600M lineitem / 100M events / 5M docs).  Semantics are identical
to gen_sf.py (disjoint key offsets per replica, every-3rd-word doc tag,
np.roll + seeded sign-flip embedding rotation) but the writer streams one
replica per parquet row group through a ParquetWriter instead of
concatenating all replicas in memory (gen_sf.py at 1000 replicas would
hold ~60 GB of arrow for lineitem alone), and the documents tag rewrite is
one vectorized pc.replace_substring over a precomputed placeholder
template instead of a per-word Python loop (the loop is ~10B ops at 1000
replicas).

Usage: python3 tools/gen_sf_stream.py [outdir=/tmp/sf100] [replicas=1000]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

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
FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}

PLACEHOLDER = "\x00TAG\x00"


def pow10_above(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def emb_replica(emb: np.ndarray, k: int) -> pa.Array:
    """Replica-k embedding rotation, identical to gen_sf.py."""
    rolled = np.roll(emb, k % emb.shape[1], axis=1)
    if k >= emb.shape[1]:
        signs = np.where(
            np.random.default_rng(k).random(emb.shape[1]) < 0.5,
            np.float32(-1), np.float32(1))
        rolled = rolled * signs
    n, d = rolled.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(rolled.ravel()))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    os.makedirs(out, exist_ok=True)

    src = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet"))
           for t in KEY_COLS}
    fam_max = {}
    for t, cols in KEY_COLS.items():
        for c in cols:
            m = pc.max(src[t][c]).as_py()
            fam = FAMILY[c]
            fam_max[fam] = max(fam_max.get(fam, 0), m)
    fam_off = {f: pow10_above(m) for f, m in fam_max.items()}
    print("key-family offsets:", fam_off, flush=True)

    for t in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(SRC, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))

    # Precompute the doc-tag template once: every 3rd word replaced by a
    # placeholder; per-replica output is one C-level substring replace.
    doc_template = None
    if "documents" in src:
        texts = src["documents"]["text"].to_pylist()
        assert not any(PLACEHOLDER in s for s in texts)
        doc_template = pa.array(
            [" ".join(PLACEHOLDER if i % 3 == 0 else w
                      for i, w in enumerate(s.split()))
             for s in texts], type=pa.string())
    emb = None
    if "embeddings" in src:
        emb = np.array(src["embeddings"]["embedding"].to_pylist(),
                       dtype=np.float32)

    for t, tbl in src.items():
        path = os.path.join(out, f"{t}.parquet")
        with pq.ParquetWriter(path, tbl.schema) as writer:
            for k in range(replicas):
                cols = {}
                for field in tbl.schema:
                    col = tbl[field.name]
                    if field.name in KEY_COLS[t]:
                        off = k * fam_off[FAMILY[field.name]]
                        col = pc.cast(
                            pc.add(col, pa.scalar(off, field.type)),
                            field.type)
                    elif (t == "documents" and field.name == "text"
                          and k > 0):
                        col = pc.cast(pc.replace_substring(
                            doc_template, pattern=PLACEHOLDER,
                            replacement=f"r{k}"), field.type)
                    elif (t == "embeddings" and field.name == "embedding"
                          and k > 0):
                        col = pc.cast(
                            pa.chunked_array([emb_replica(emb, k)]),
                            field.type)
                    cols[field.name] = col
                writer.write_table(pa.table(cols, schema=tbl.schema))
        print(f"{t}: {tbl.num_rows} x {replicas} -> done", flush=True)


if __name__ == "__main__":
    main()
