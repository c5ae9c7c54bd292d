#!/usr/bin/env python3
"""In-DuckDB variant of the oracle self-check for HUGE results (sf>=100):
identical verdict semantics to tools/selfcheck.py (schema as sorted column
names, exact row multiset, NULL==NULL) but the compare runs inside DuckDB
as EXCEPT ALL in both directions instead of a pandas materialization —
pandas holds both frames in python memory, which caps the driver-mimic
compare at a few tens of millions of rows, while DuckDB streams the
anti-joins with spill.

Verdict lines are printed in selfcheck.py's format so the resumable
wide-sweep loops can mix both tools in one log.

Usage: selfcheck_duck.py <sfDir> <outDir> [onlyCommaList]
"""
import json
import os
import sys

import duckdb

from duckcompare import multiset_compare

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DUCK_MEM = os.environ.get("GRAFT_DUCK_MEM", "48GB")
DUCK_TMP = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(DUCK_TMP, exist_ok=True)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{DUCK_MEM}'")
    con.execute(f"SET temp_directory='{DUCK_TMP}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    try:
        scols = [d[0] for d in con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') "
            "LIMIT 0").description]
    except Exception as e:
        fails.append((name, f"no spark result: {e}"))
        continue
    try:
        con.execute(f"CREATE TEMP TABLE duck AS {sql}")
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    dcols = [d[0] for d in con.execute("SELECT * FROM duck LIMIT 0").description]
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema mismatch: spark={sorted(scols)} "
                            f"duck={sorted(dcols)}"))
        continue
    try:
        # Shared compare (tools/duckcompare.py, VERDICT r17 item 5): the
        # rowcount short-circuit, the chunked K-slice multiset equality
        # (one EXCEPT ALL over sf10's 60M-row master spilled past 28 GB;
        # slicing keeps 1/K the live state), and the UNION-coerced slice
        # hashing (fdf81fa's q42 DECIMAL-vs-DOUBLE live catch) all live in
        # ONE helper every checker imports.
        def _progress(k, K, running_diff):
            print(f"  [{name}] slice {k}/{K}: cumulative diff {running_diff}",
                  file=sys.stderr, flush=True)

        d_rows, s_rows, diff = multiset_compare(
            con, "SELECT * FROM duck", f"{out_dir}/{name}/*.parquet",
            cols=sorted(scols), progress=_progress)
        if diff is None:
            fails.append((name,
                          f"rowcount mismatch: spark={s_rows} duck={d_rows}"))
            con.close()
            continue
    except Exception as e:
        fails.append((name, f"compare error: {e}"))
        continue
    if diff != 0:
        fails.append((name, f"multiset mismatch: {diff} differing rows"))
    else:
        passes.append(name)
    con.close()

for n in passes:
    print(f"PASS {n}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
