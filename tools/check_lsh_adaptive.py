#!/usr/bin/env python3
"""Cross-engine check for `lshPairs` at an ARBITRARY (bands, bits,
threshold) setting — the DuckDB side of the out-of-gate decade points
where the corpus-adaptive production rule departs from the registry's
pinned (8, 8) (e.g. sf100: 2M vectors -> 4 bands x 15 bits at the dedup
threshold 0.6; the pinned point's bucket populations would percolate).

The Rademacher hyperplanes are regenerated here from the same splitmix64
sequence `functions.Mix.splitmix` uses (plane p, dim d: bit 0 of
splitmix(p*64+d) -> +1/-1), so both engines evaluate literally identical
plane coefficients without needing a stored oracle to parse. Candidate
dedup uses the first-colliding-band rule (uniqueness by construction, no
DISTINCT materialization — linear memory); the rule is hash-verified
against the independent DISTINCT formulation at the gate SFs
(tools/sweep.sh) and at sf1/sf10 (tools/check_lsh_scaled.py).

Usage: check_lsh_adaptive.py <sfDir> <sparkDumpDir> <bands> <bits> <threshold>
  where <sparkDumpDir> holds the parquet written by
  `runMain graft.tools.DumpLshPairs <sfDir> <sparkDumpDir> <bands> <bits> <threshold>`.
"""
import os
import sys

import duckdb

sf_dir, dump = sys.argv[1], sys.argv[2]
BANDS, BITS = int(sys.argv[3]), int(sys.argv[4])
THRESH = sys.argv[5]  # keep the user's literal text so SQL sees it verbatim

MASK = (1 << 64) - 1


def splitmix(z0: int) -> int:
    x = (z0 * 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


def plane(p: int):
    return [1.0 if splitmix(p * 64 + d) & 1 else -1.0 for d in range(64)]


def arr(a):
    # Scala Double.toString and this formatting both round-trip +-1.0 exactly
    return "[" + ", ".join(f"{v:.1f}" for v in a) + "]"


def band_sql(b: int) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product(emb, {arr(plane(b * BITS + i))}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(BITS))


band_list = "[" + ", ".join(band_sql(b) for b in range(BANDS)) + "]"
first_band_only = "\n    ".join(
    f"AND NOT (x.band_idx >= {j + 1} AND x.codes[{j + 1}] = y.codes[{j + 1}])"
    for j in range(BANDS - 1))

check = f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings),
codes AS (SELECT vec_id, emb, nrm, {band_list} AS codes FROM e),
banded AS (SELECT vec_id, emb, nrm, codes, unnest(range({BANDS})) AS band_idx FROM codes),
keyed AS (SELECT *, codes[band_idx + 1] AS bucket FROM banded),
pairs AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
    list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm) AS cosine
  FROM keyed x JOIN keyed y
    ON x.band_idx = y.band_idx AND x.bucket = y.bucket
   AND x.vec_id < y.vec_id
  WHERE TRUE
    {first_band_only}),
duck AS (SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {THRESH}),
spark AS (SELECT vec_a, vec_b, cosine FROM read_parquet('{dump}/*.parquet')),
diff AS (
  (SELECT * FROM duck EXCEPT ALL SELECT * FROM spark)
  UNION ALL
  (SELECT * FROM spark EXCEPT ALL SELECT * FROM duck))
SELECT (SELECT COUNT(*) FROM duck), (SELECT COUNT(*) FROM spark),
       (SELECT COUNT(*) FROM diff)"""

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
con.execute(
    "CREATE VIEW embeddings AS "
    f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
duck_rows, spark_rows, diff_rows = con.execute(check).fetchone()
name = f"lshPairs({BANDS},{BITS})@{THRESH}"
if diff_rows == 0 and duck_rows == spark_rows:
    print(f"PASS {name} ({spark_rows} rows exact)")
    sys.exit(0)
print(f"FAIL {name}: duck={duck_rows} spark={spark_rows} diff={diff_rows}")
sys.exit(1)
