#!/usr/bin/env python3
"""Build an sf1-scale corpus (10x sf0.1) for the out-of-gate scale sweep
(VERDICT r9 items 2-3). Every table is replicated with DISJOINT key ranges
so referential integrity holds per replica and the data distribution per
replica is exactly sf0.1's:

- fact/dim keys (custkey, suppkey, partkey, orderkey, event_id, user_id,
  doc_id, vec_id) get `k * offset` added in replica k, in BOTH the primary
  key column and every foreign-key column, with `offset` a power of ten
  above the table's max key — joins resolve within a replica and never
  across. nation/region stay as-is (each replica's rows reference the same
  25 nations, as a 10x corpus would in production).
- documents replica k>0: every 3rd word is replaced by a replica tag
  (scale_probe.py's trick) — every 3-gram window contains a replaced
  position, so cross-replica 3-gram Jaccard is 0 and near-dup pair counts
  grow LINEARLY in replicas instead of combinatorially.
- embeddings replica k>0: dimensions rotated by k (np.roll). Rotation is
  orthogonal, so within-replica inner products (and thus every cosine the
  queries compare) are preserved EXACTLY, while cross-replica cosines of
  unrelated 32-dim vectors land near 0 — below every query threshold —
  keeping LSH bucket sizes and dup-pair counts linear too.
- timestamps, values, and all non-key columns are byte-identical to the
  source replica, and pyarrow carries the source schema through verbatim
  (events keeps TIMESTAMP(NANOS) — Tables.scala's nanosAsLong contract).

Usage: python3 tools/gen_sf.py [outdir=/tmp/sf1] [replicas=10]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns that carry each key family (PK first table listed owns it)
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
# key family = column suffix that must share one offset across tables
FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}


def pow10_above(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    src = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet"))
           for t in KEY_COLS}
    # one offset per key family, from the max over every column carrying it
    fam_max = {}
    for t, cols in KEY_COLS.items():
        for c in cols:
            m = pc.max(src[t][c]).as_py()
            fam = FAMILY[c]
            fam_max[fam] = max(fam_max.get(fam, 0), m)
    fam_off = {f: pow10_above(m) for f, m in fam_max.items()}
    print("key-family offsets:", fam_off)

    for t in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(SRC, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))

    doc_texts = None
    if "documents" in src:
        doc_texts = src["documents"]["text"].to_pylist()
    emb = None
    if "embeddings" in src:
        emb = np.array(src["embeddings"]["embedding"].to_pylist(),
                       dtype=np.float32)

    for t, tbl in src.items():
        # Streaming + resumable (r18, for the sf100 decade): the old
        # concat-then-write held every replica in memory at once — 1000
        # replicas of lineitem is ~60 GB of arrow, an OOM on a box that is
        # also running a sweep. Each replica now goes out as its own row
        # group through ParquetWriter (peak memory = one replica), the
        # write lands on a .tmp path renamed only on completion, and a
        # table whose final file already exists is skipped so a restart
        # resumes where it died.
        final = os.path.join(out, f"{t}.parquet")
        if os.path.exists(final):
            print(f"{t}: exists — resume skip")
            continue
        writer = pq.ParquetWriter(final + ".tmp", tbl.schema)
        n_out = 0
        for k in range(replicas):
            cols = {}
            for field in tbl.schema:
                col = tbl[field.name]
                if field.name in KEY_COLS[t]:
                    off = k * fam_off[FAMILY[field.name]]
                    col = pc.cast(pc.add(col, pa.scalar(off, field.type)),
                                  field.type)
                elif t == "documents" and field.name == "text" and k > 0:
                    tag = f"r{k}"
                    col = pa.array(
                        [" ".join(tag if i % 3 == 0 else w
                                  for i, w in enumerate(s.split()))
                         for s in doc_texts], type=field.type)
                elif t == "embeddings" and field.name == "embedding" and k > 0:
                    # roll is orthogonal but has period dim (=32): at k>=32
                    # the roll alone repeats and replicas k and k-32 would be
                    # exact embedding copies (quadratic dup-pair blowup at
                    # sf10's 100 replicas). Compose with a seeded +-1 sign
                    # flip per 32-replica block — also orthogonal, so
                    # within-replica cosines stay exact, while cross-replica
                    # cosines of the flipped halves cancel toward 0. k<32
                    # keeps the original roll-only output byte-identical.
                    rolled = np.roll(emb, k % emb.shape[1], axis=1)
                    if k >= emb.shape[1]:
                        signs = np.where(
                            np.random.default_rng(k).random(emb.shape[1]) < 0.5,
                            np.float32(-1), np.float32(1))
                        rolled = rolled * signs
                    col = pa.array(rolled.tolist(), type=field.type)
                cols[field.name] = col
            part = pa.table(cols, schema=tbl.schema)
            writer.write_table(part)
            n_out += part.num_rows
        writer.close()
        os.replace(final + ".tmp", final)
        print(f"{t}: {tbl.num_rows} -> {n_out}")


if __name__ == "__main__":
    main()
