#!/usr/bin/env python3
"""Out-of-gate DuckDB check for q48_dedup_clusters + q60_dedup_survivors
at sf>=10.

Their shared edge relation is the EXACT all-pairs 3-gram Jaccard >= 0.5
ground truth (declared-anchor q31's stream): at sf10 that is 1.218 BILLION
joined rows into one hash aggregation keyed by (doc_a, doc_b) — DuckDB
died on it at every memory/spill budget this box can offer (24GB, 90GB +
56GB disk, 100GB: "Failed to allocate block"). Spark's jaccardPairs runs
the identical aggregation DISTRIBUTED, which is the point of the engine.

This check makes the oracle side exact-but-bounded the same way a cluster
would: partition the OUTPUT KEY SPACE. The join+aggregate runs K times,
each pass keeping only joined rows whose pair lands in hash chunk k — the
same 1.218B rows stream K times (CPU, not memory), each pass holds 1/K of
the aggregation state, and the union over chunks is exactly the full
GROUP BY (partitioned aggregation). Everything downstream reuses the
pieces validated elsewhere: min-label propagation with pointer jumping for
components (same unique fixpoint as the oracle's reachability CTE —
tools/check_clusters_scaled.py, validated at sf1) and the q60 quality/
survivor SQL taken VERBATIM from the stored oracle, so the survivor rule
itself is not restated.

Usage: check_jaccard_scaled.py <sfDir> <dumpDir> [chunks=10]
Reads <dumpDir>/oracle_sql.json for the verbatim CTE text and
<dumpDir>/{q48_dedup_clusters,q60_dedup_survivors}/*.parquet.
"""
import json
import os
import re
import sys

import duckdb

from duckcompare import multiset_compare

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v10wide"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

oracle = json.load(open(f"{dump}/oracle_sql.json"))
q48 = oracle["q48_dedup_clusters"]
q60 = oracle["q60_dedup_survivors"]
q31 = oracle["q31_dedup_ngram_jaccard"]
q92 = oracle["q92_crosssource_dups"]

# Verbatim shingle CTEs (toks/sh/ex/rare/exr) from the stored q48 oracle;
# everything from pairs_all onward is replaced by the chunked aggregation.
prefix = q48.split(",\npairs_all AS", 1)[0]
prefix = prefix.replace("WITH RECURSIVE ", "", 1)
# Verbatim q60 tail from `qual AS` onward — references `labeled`, which we
# provide as a temp table below.
q60_tail = "WITH " + q60[q60.index("qual AS ("):]
# r17 (VERDICT r16 item 4): the chunked relation is ALSO the exact oracle
# for the q31 pair anchor and q92's cross-source rollup — their stored
# oracles run the same 1.2B-row-at-sf10 pairs_all aggregation that dies in
# one DuckDB pass. q31's threshold is parsed from its stored SQL (the
# chunked relation is kept down to it); q92's tail from `lab AS` onward is
# reused verbatim against a temp `pairs` table at its own 0.5 cut.
m = re.search(r">= ([0-9.]+)\)\s*SELECT doc_a, doc_b, common, jaccard", q31)
assert m, "q31 oracle shape changed — threshold literal not found"
T31 = m.group(1)
assert float(T31) <= 0.5, f"q31 threshold {T31} above the q48 edge cut"
q92_tail = "WITH " + q92[q92.index("lab AS ("):]

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_spill")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
con.execute(
    "CREATE VIEW documents AS "
    f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")

con.execute(f"CREATE TEMP TABLE exr AS WITH {prefix} SELECT * FROM exr")
n_exr = con.execute("SELECT COUNT(*) FROM exr").fetchone()[0]

con.execute("""CREATE TEMP TABLE pairs_full
  (doc_a BIGINT, doc_b BIGINT, common BIGINT, na BIGINT, nb BIGINT)""")
for k in range(K):
    con.execute(f"""INSERT INTO pairs_full
      SELECT doc_a, doc_b, common, na, nb FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na,
               b.n_sh AS nb, COUNT(*) AS common
        FROM exr a JOIN exr b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE hash(a.doc_id, b.doc_id) % {K} = {k}
        GROUP BY 1, 2, 3, 4)
      WHERE CAST(common AS DOUBLE) / (na + nb - common) >= {T31}""")
    print(f"  chunk {k + 1}/{K}: pairs so far "
          f"{con.execute('SELECT COUNT(*) FROM pairs_full').fetchone()[0]}",
          flush=True)

# q48/q60 edge set: the >= 0.5 cut of the full relation
con.execute("""CREATE TEMP TABLE pair_edges AS
  SELECT doc_a, doc_b FROM pairs_full
  WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5""")
con.execute("""CREATE TEMP TABLE edges AS
  SELECT doc_a AS src, doc_b AS dst FROM pair_edges
  UNION SELECT doc_b, doc_a FROM pair_edges""")
con.execute("""CREATE TEMP TABLE labels AS
  SELECT DISTINCT src AS v, src AS rep FROM edges""")
rounds = 0
while True:
    rounds += 1
    con.execute("""CREATE TEMP TABLE next_labels AS
      SELECT v, MIN(rep) AS rep FROM (
        SELECT v, rep FROM labels
        UNION ALL
        SELECT e.src AS v, l.rep FROM edges e JOIN labels l ON e.dst = l.v
        UNION ALL
        SELECT l1.v, l2.rep FROM labels l1 JOIN labels l2 ON l1.rep = l2.v
      ) GROUP BY v""")
    changed = con.execute("""SELECT COUNT(*) FROM next_labels n
      JOIN labels o ON n.v = o.v WHERE n.rep < o.rep""").fetchone()[0]
    con.execute("DROP TABLE labels")
    con.execute("ALTER TABLE next_labels RENAME TO labels")
    if changed == 0:
        break
    if rounds > 64:
        print("FAIL q48_dedup_clusters: label propagation did not converge")
        sys.exit(1)
con.execute("""CREATE TEMP TABLE labeled AS
  SELECT v AS doc_id, rep AS cluster_rep FROM labels""")

fails = 0


def compare(name: str, duck_sql: str) -> None:
    # shared multiset equality (tools/duckcompare.py, VERDICT r17 item 5)
    global fails
    duck_rows, spark_rows, diff_rows = multiset_compare(
        con, duck_sql, f"{dump}/{name}/*.parquet")
    if diff_rows == 0 and duck_rows == spark_rows:
        print(f"PASS {name} (chunked-agg check: {spark_rows} rows exact, "
              f"{rounds} label rounds, {n_exr} shingle rows)")
    else:
        print(f"FAIL {name}: duck={duck_rows} spark={spark_rows} "
              f"diff={'counts differ' if diff_rows is None else diff_rows}")
        fails += 1


compare("q48_dedup_clusters", """
  SELECT doc_id, cluster_rep,
    CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
  FROM labeled""")
compare("q60_dedup_survivors", q60_tail)
# r17: the two pair-relation anchors, from the same chunked ground truth.
# The jaccard double is computed with the IDENTICAL expression the stored
# oracle uses, over identical integers — bitwise-equal results.
compare("q31_dedup_ngram_jaccard", f"""
  SELECT doc_a, doc_b, common,
    CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
  FROM pairs_full
  WHERE CAST(common AS DOUBLE) / (na + nb - common) >= {T31}""")
con.execute("""CREATE TEMP TABLE pairs AS
  SELECT doc_a, doc_b, common,
    CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
  FROM pairs_full
  WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5""")
compare("q92_crosssource_dups", q92_tail)
sys.exit(1 if fails else 0)
