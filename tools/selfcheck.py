#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same testdata parquet and
compare (columns sorted by name, rows sorted, exact values)."""
import json, math, os, sys
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

# DuckDB defaults to 80% of PHYSICAL RAM with no spill dir; at sf>=10 the
# master-join oracle alone reached 67 GB anon RSS and got OOM-killed while
# Spark JVMs were co-resident. Cap it (GRAFT_DUCK_MEM, default 24GB) and
# point spills at a temp dir so big oracle queries degrade to disk instead
# of taking down the process.
DUCK_MEM = os.environ.get("GRAFT_DUCK_MEM", "24GB")
DUCK_TMP = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(DUCK_TMP, exist_ok=True)

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Declared-adjudicator routing (VERDICT r16 item 5): queries whose DuckDB
# oracle is structurally infeasible at scale (q111's recursive reachability
# CTE is quadratic in component size) are routed to their designed exact
# checker BY DECLARATION — the caller (tools/sweep.sh) names them here and
# runs the adjudicator as a first-class step, instead of recovering from an
# oracle OOM after the fact.
declared_skip = set(filter(None,
    os.environ.get("GRAFT_SELFCHECK_SKIP", "").split(",")))
fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    if name in declared_skip:
        skips.append(name)
        continue
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{DUCK_MEM}'")
    con.execute(f"SET temp_directory='{DUCK_TMP}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
    except Exception as e:
        fails.append((name, f"no spark result: {e}")); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
    if sc != dc:
        fails.append((name, f"schema mismatch: spark={sc} duck={dc}")); continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"rowcount mismatch: spark={len(spark_df)} duck={len(duck_df)}")); continue
    a = spark_df[sc].sort_values(sc, na_position="last").reset_index(drop=True)
    b = duck_df[sc].sort_values(sc, na_position="last").reset_index(drop=True)
    bad = None
    for col in sc:
        av, bv = a[col], b[col]
        # vectorized exact-equality with NULL==NULL (same semantics as the
        # old per-value loop, which was minutes on multi-million-row results)
        an, bn = av.isna(), bv.isna()
        try:
            eq = (av == bv) | (an & bn)
        except Exception:
            eq = pd.Series([(x is None or pd.isna(x)) and (y is None or pd.isna(y))
                            or (x == y) for x, y in zip(av.tolist(), bv.tolist())])
        if not bool(eq.all()):
            i = int((~eq).idxmax())
            bad = (col, i, av.iloc[i], bv.iloc[i]); break
    if bad:
        fails.append((name, f"value mismatch col={bad[0]} row={bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
    else:
        passes.append(name)

for n in passes: print(f"PASS {n}")
for n in skips: print(f"SKIP {n} (declared adjudicator — caller must run it)")
for n, why in fails: print(f"FAIL {n}: {why}")
tail = f" ({len(skips)} routed to declared adjudicator)" if skips else ""
print(f"\n{len(passes)} pass / {len(fails)} fail{tail}")
sys.exit(1 if fails else 0)
