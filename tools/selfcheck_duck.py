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
    cols = ", ".join(f'"{c}"' for c in sorted(scols))
    try:
        # Rowcount first — cheap (no hash state), and it sizes the compare.
        d_rows = con.execute("SELECT COUNT(*) FROM duck").fetchone()[0]
        s_rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchone()[0]
        # Chunked multiset compare (r17): one EXCEPT ALL over the sf10
        # master table (60M wide rows, both sides hashed at once) spilled
        # past 28 GB on a 42 GB-free disk — ENOSPC trajectory. Hashing the
        # full sorted row into K slices and comparing slice-by-slice is the
        # SAME multiset equality (hash is a function of the row: equal rows
        # land in equal slices) with 1/K the live state; the duck temp
        # table and the parquet dump are each scanned K times (cheap,
        # sequential). K=1 (small results) keeps the original single pass.
        # Short-circuit (ADVICE r17): counts already computed above — a
        # count mismatch decides the verdict NOW; burning the multi-hour
        # K-slice compare first proved nothing extra at sf10.
        if s_rows != d_rows:
            fails.append((name,
                          f"rowcount mismatch: spark={s_rows} duck={d_rows}"))
            con.close()
            continue
        chunk_rows = int(os.environ.get("GRAFT_DUCK_CHUNK_ROWS", "5000000"))
        K = max(1, (max(d_rows, s_rows) + chunk_rows - 1) // chunk_rows)
        diff = 0
        if K > 1:
            # Slice on COERCED types: EXCEPT ALL unifies types before
            # comparing, but a hash computed on each side's NATIVE types
            # would route equal-after-coercion rows to different slices
            # (live catch: q42's DECIMAL tier literals vs the dump's
            # DOUBLE — 17.6M phantom diffs at sf10 while the unchunked
            # compare was exactly equal). UNION ALL against the other
            # side's empty set forces both temp tables to the same
            # inferred common types, so equal rows hash identically.
            con.execute(f"""CREATE TEMP TABLE s_cast AS
              SELECT {cols} FROM read_parquet('{out_dir}/{name}/*.parquet')
              UNION ALL
              SELECT {cols} FROM duck WHERE 1 = 0""")
            con.execute(f"""CREATE TEMP TABLE d_cast AS
              SELECT {cols} FROM duck
              UNION ALL
              SELECT {cols} FROM
                read_parquet('{out_dir}/{name}/*.parquet') WHERE 1 = 0""")
        for k in range(K):
            if K > 1:
                s_src = f"SELECT * FROM s_cast WHERE hash({cols}) % {K} = {k}"
                d_src = f"SELECT * FROM d_cast WHERE hash({cols}) % {K} = {k}"
            else:
                s_src = (f"SELECT {cols} FROM "
                         f"read_parquet('{out_dir}/{name}/*.parquet')")
                d_src = f"SELECT {cols} FROM duck"
            diff += con.execute(f"""
              WITH s AS ({s_src}), d AS ({d_src}),
              x AS ((SELECT * FROM d EXCEPT ALL SELECT * FROM s)
                    UNION ALL
                    (SELECT * FROM s EXCEPT ALL SELECT * FROM d))
              SELECT COUNT(*) FROM x""").fetchone()[0]
            if K > 1:
                print(f"  [{name}] slice {k + 1}/{K}: cumulative diff {diff}",
                      file=sys.stderr, flush=True)
        if K > 1:
            con.execute("DROP TABLE s_cast")
            con.execute("DROP TABLE d_cast")
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
