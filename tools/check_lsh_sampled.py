#!/usr/bin/env python3
"""sf100-scale DuckDB check for q110_ann_lsh_scaled (registered 8x8 form).

Why this variant exists: the registered point pins bitsPerBand = 8 for
oracle portability, which is sized for the sf1 decade — at sf100's 2M
vectors the 256-bucket bands hold ~7.8k vectors each, so the full
candidate enumeration is ~6e10 joined rows. check_lsh_scaled.py's full
re-enumeration (exact at sf10's ~6e8 candidates) would run ~day-scale
here. This checker splits exactness into two halves, each tractable:

1. PRECISION, over the ENTIRE Spark dump (~750M pairs, linear in output):
   every dumped pair is re-joined to the raw embeddings and re-scored —
   cosine must be BITWISE equal to the dumped value, >= threshold,
   vec_a < vec_b, collide in >= 1 band under the literal planes, and the
   pair set must be duplicate-free. Any fabricated, mis-scored, or
   repeated pair fails loudly.
2. RECALL, multiset-exact on a deterministic SAMPLE of (band, bucket)
   cells: a pair is ASSIGNED to its first colliding band's cell (the
   same rule both engines use for unique emission), the sample picks
   hash(cell) % mod == 0 cells, and within the sampled universe the
   Spark pairs must equal the independently re-enumerated DuckDB pairs
   EXACTLY (EXCEPT ALL both ways). A missing pair whose first-band cell
   is sampled fails; mod controls the sampled fraction of the quadratic
   work (mod=32 ~ 3% of candidates).

Together: 100% of emitted pairs proven correct, and emission proven
complete on the sampled cells — the same split a 1000-node cluster would
use to audit a trillion-candidate run. The plane literals come verbatim
from the stored q110 oracle SQL (oracle_sql.json), so the checked planes
are the ones the engine compiled.

Usage: check_lsh_sampled.py <sfDir> <dumpDir> [mod=32]
Env: GRAFT_LSH_THRESH (default 0.35), GRAFT_DUCK_MEM, GRAFT_DUCK_TMP.
"""
import json
import os
import sys

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v100emb"
mod = int(sys.argv[3]) if len(sys.argv) > 3 else 32
NAME = "q110_ann_lsh_scaled"
THRESH = float(os.environ.get("GRAFT_LSH_THRESH", "0.35"))
BANDS = 8

sql = json.load(open(f"{dump}/oracle_sql.json"))[NAME]
pre, rest = sql.split(",\nbanded AS", 1)
marker = "AS band_idx,\n         unnest("
start = rest.index(marker) + len(marker)
end = rest.index(") AS bucket")
band_list = rest[start:end]

first_band_only = "\n    ".join(
    f"AND NOT (x.band_idx >= {j + 1} AND x.codes[{j + 1}] = y.codes[{j + 1}])"
    for j in range(BANDS - 1))

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '40GB')}'")
tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
con.execute(
    "CREATE VIEW embeddings AS "
    f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")

# one materialization of (vec_id, emb, nrm, codes) shared by both halves
# `pre` carries its own WITH prefix (it is the stored SQL's head)
con.execute(f"""CREATE TEMP TABLE codes AS
{pre}
SELECT vec_id, emb, nrm, {band_list} AS codes FROM e""")

spark_glob = f"{dump}/{NAME}/*.parquet"

# GRAFT_RECALL_ONLY=1: skip the precision half — for WIDENING the recall
# sample (a larger mod run) on a dump whose precision half already passed
# in a recorded run; the output states the skip so the log can't be read
# as a fresh full-split PASS.
recall_only = os.environ.get("GRAFT_RECALL_ONLY") == "1"

# ---- half 1: precision over the full dump ----------------------------
if recall_only:
    print(f"SKIP {NAME} precision half (GRAFT_RECALL_ONLY=1 — valid only "
          f"alongside a recorded precision PASS for this same dump)")
else:
    n, bad_cos, bad_thr, bad_ord, bad_nocollide = con.execute(f"""
WITH spark AS (SELECT * FROM read_parquet('{spark_glob}')),
j AS (
  SELECT s.vec_a, s.vec_b, s.cosine,
    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS rec,
    list_position(list_transform(range({BANDS}),
      i -> a.codes[i + 1] = b.codes[i + 1]), true) AS fb
  FROM spark s
  JOIN codes a ON a.vec_id = s.vec_a
  JOIN codes b ON b.vec_id = s.vec_b)
SELECT COUNT(*),
  SUM(CASE WHEN rec = cosine THEN 0 ELSE 1 END),
  SUM(CASE WHEN cosine >= {THRESH} THEN 0 ELSE 1 END),
  SUM(CASE WHEN vec_a < vec_b THEN 0 ELSE 1 END),
  SUM(CASE WHEN fb IS NULL THEN 1 ELSE 0 END)
FROM j""").fetchone()
    dups = con.execute(f"""
SELECT COUNT(*) - COUNT(DISTINCT (vec_a, vec_b))
FROM read_parquet('{spark_glob}')""").fetchone()[0]
    spark_total = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
    if (n != spark_total or bad_cos or bad_thr or bad_ord
            or bad_nocollide or dups):
        print(f"FAIL {NAME}: precision half — joined={n}/{spark_total} "
              f"bad_cos={bad_cos} bad_thr={bad_thr} bad_ord={bad_ord} "
              f"no_collision={bad_nocollide} dups={dups}")
        sys.exit(1)
    print(f"PASS {NAME} precision ({spark_total} pairs: cosine "
          f"bitwise-exact, >= {THRESH}, ordered, unique, collide >= 1 band)")

# ---- half 2: multiset-exact recall on sampled first-band cells -------
duck_rows, spark_rows, diff_rows = con.execute(f"""
WITH banded AS (
  SELECT vec_id, emb, nrm, codes, unnest(range({BANDS})) AS band_idx
  FROM codes),
keyed AS (
  SELECT * FROM (SELECT *, codes[band_idx + 1] AS bucket FROM banded)
  WHERE hash(band_idx * 256 + bucket) % {mod} = 0),
duck AS (
  SELECT * FROM (
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
      list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm) AS cosine
    FROM keyed x JOIN keyed y
      ON x.band_idx = y.band_idx AND x.bucket = y.bucket
     AND x.vec_id < y.vec_id
    WHERE TRUE
      {first_band_only})
  WHERE cosine >= {THRESH}),
spark AS (
  SELECT vec_a, vec_b, cosine FROM (
    SELECT s.vec_a, s.vec_b, s.cosine,
      list_position(list_transform(range({BANDS}),
        i -> a.codes[i + 1] = b.codes[i + 1]), true) AS fb,
      a.codes AS acodes
    FROM read_parquet('{spark_glob}') s
    JOIN codes a ON a.vec_id = s.vec_a
    JOIN codes b ON b.vec_id = s.vec_b)
  WHERE hash((fb - 1) * 256 + acodes[fb]) % {mod} = 0),
diff AS (
  (SELECT * FROM duck EXCEPT ALL SELECT * FROM spark)
  UNION ALL
  (SELECT * FROM spark EXCEPT ALL SELECT * FROM duck))
SELECT (SELECT COUNT(*) FROM duck), (SELECT COUNT(*) FROM spark),
       (SELECT COUNT(*) FROM diff)""").fetchone()
n_cells = con.execute(f"""
SELECT COUNT(*) FROM (
  SELECT DISTINCT band_idx, bucket FROM (
    SELECT unnest(range({BANDS})) AS band_idx, b AS bucket
    FROM (SELECT unnest(range(256)) AS b))
  WHERE hash(band_idx * 256 + bucket) % {mod} = 0)""").fetchone()[0]
if duck_rows == 0:
    # An empty sampled universe satisfies diff==0 vacuously (a mis-matched
    # sampling hash or an over-large mod would "pass" while checking
    # nothing) — refuse to certify recall on it.
    print(f"FAIL {NAME}: recall half vacuous — sampled universe is empty "
          f"(cells={n_cells} mod={mod} duck=0); lower mod or check the "
          f"sampling hash")
    sys.exit(1)
if diff_rows == 0 and duck_rows == spark_rows:
    # Cells are md5/hash-sampled, so per-cell exactness is exchangeable:
    # observing 0 defective cells among k sampled bounds the defective-cell
    # fraction p by the rule of three, p <= 3/k at 95% confidence.
    bound = min(1.0, 3.0 / n_cells)
    print(f"PASS {NAME} recall-sample (cells={n_cells}/{BANDS * 256} "
          f"mod={mod}: duck={duck_rows} spark={spark_rows} exact)")
    print(f"  coverage: 0 defective cells in {n_cells} hash-sampled -> "
          f"defective-cell fraction <= {bound:.3%} at 95% confidence "
          f"(rule of three; exchangeable under hash sampling)")
    sys.exit(0)
print(f"FAIL {NAME}: recall half — cells={n_cells} duck={duck_rows} "
      f"spark={spark_rows} diff={diff_rows}")
sys.exit(1)
