#!/usr/bin/env python3
"""Out-of-gate DuckDB check for q110_ann_lsh_scaled at sf>=10.

The registry oracle (SimilaritySearch.lshPairsOracleCte) is the maximally
independent formulation: band the vectors, self-join per band, DISTINCT the
candidate pairs, then score. That DISTINCT materializes the full candidate
multiset (~600M rows at sf10's 200k vectors) and exceeds DuckDB's
memory+spill on this box (90 GB RAM cap + 56 GB disk both exhausted).

This check keeps the inputs fully independent -- raw embeddings + the same
literal Rademacher planes extracted verbatim from the stored oracle SQL --
but replaces candidate dedup with the first-colliding-band rule (a pair is
emitted only in its lowest matching band), which makes uniqueness hold by
construction and the whole pipeline stream in linear memory. The rule's
equivalence to DISTINCT is not assumed: the registry point hash-matches the
DISTINCT formulation at sf0.001/0.01/0.1/1 (tools/sweep.sh), and the Spark
side uses the same rule, so this is the scalable cross-engine restatement
of an already-verified identity.

Usage: check_lsh_scaled.py <sfDir> <dumpDir>   # e.g. /tmp/sf10 /tmp/v10wide
Reads <dumpDir>/oracle_sql.json for the plane literals and
<dumpDir>/q110_ann_lsh_scaled/*.parquet for the Spark result; prints
PASS/FAIL in selfcheck.log format.
"""
import json
import os
import shutil
import sys

import duckdb

from duckcompare import multiset_compare

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v10wide"
NAME = "q110_ann_lsh_scaled"
THRESH = 0.35
BANDS = 8

sql = json.load(open(f"{dump}/oracle_sql.json"))[NAME]

# Carve the stored oracle into (embedding CTE prefix) and (band-code list):
# everything before ",\nbanded AS" defines `e` (vec_id, emb, nrm) from the
# raw table; the list literal between "unnest(" and ") AS bucket" holds the
# eight per-band code expressions with the hyperplanes as double literals.
pre, rest = sql.split(",\nbanded AS", 1)
marker = "AS band_idx,\n         unnest("
start = rest.index(marker) + len(marker)
end = rest.index(") AS bucket")
band_list = rest[start:end]

first_band_only = "\n    ".join(
    f"AND NOT (x.band_idx >= {j + 1} AND x.codes[{j + 1}] = y.codes[{j + 1}])"
    for j in range(BANDS - 1))

# The streamed pair pipeline materializes only the >=THRESH survivors
# into a temp table; the multiset equality itself goes through the shared
# compare (tools/duckcompare.py, VERDICT r17 item 5).
derive = f"""CREATE TEMP TABLE duck_pairs AS {pre},
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
    {first_band_only})
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {THRESH}"""

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
con.execute(
    "CREATE VIEW embeddings AS "
    f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")

# Pre-flight spill estimate (VERDICT r13 item 2): the exact candidate
# count comes from (band, bucket) occupancy — a cheap aggregation, no
# join. If the implied spill exceeds free space on the temp volume,
# refuse up front (pointing at check_lsh_sampled.py, the decade built for
# exactly this regime) instead of crashing hours into the join.
occ = f"""{pre},
codes AS (SELECT vec_id, {band_list} AS codes FROM e),
banded AS (SELECT codes[band_idx + 1] AS bucket, band_idx
           FROM codes, (SELECT unnest(range({BANDS})) AS band_idx))
SELECT COALESCE(SUM(c * (c - 1) / 2), 0) FROM (
  SELECT band_idx, bucket, COUNT(*) AS c FROM banded GROUP BY 1, 2)"""
cand = con.execute(occ).fetchone()[0]
need_gb = cand * 64 * 2 / 1e9
# GRAFT_FAKE_FREE_GB: test hook — exercise the refusal branch without
# actually filling the disk.
free_gb = float(os.environ.get("GRAFT_FAKE_FREE_GB",
                               shutil.disk_usage(tmp).free / 1e9))
print(f"[preflight] candidates={cand} est_spill={need_gb:.1f}GB "
      f"free({tmp})={free_gb:.1f}GB", flush=True)
if need_gb > free_gb * 0.8:
    print(f"FAIL {NAME}: full re-enumeration needs ~{need_gb:.0f} GB spill "
          f"but {tmp} has {free_gb:.0f} GB free — set GRAFT_DUCK_TMP to a "
          f"larger volume, or use check_lsh_sampled.py (precision over the "
          f"full dump + sampled-cell recall) at this scale")
    sys.exit(1)

con.execute(derive)
duck_rows, spark_rows, diff_rows = multiset_compare(
    con, "SELECT * FROM duck_pairs", f"{dump}/{NAME}/*.parquet")
if diff_rows == 0 and duck_rows == spark_rows:
    print(f"PASS {NAME} (streamed first-band check: {spark_rows} rows exact)")
    sys.exit(0)
print(f"FAIL {NAME}: duck={duck_rows} spark={spark_rows} "
      f"diff={'counts differ' if diff_rows is None else diff_rows}")
sys.exit(1)
