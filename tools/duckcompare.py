#!/usr/bin/env python3
"""THE shared exact multiset compare for every DuckDB-side checker
(VERDICT r17 item 5): one code path for "does this DuckDB relation equal
this parquet dump", so the type-coercion subtlety fixed live at sf10
(fdf81fa) cannot be reintroduced by the next checker.

The subtlety: EXCEPT ALL unifies types across its two inputs before
comparing, but the CHUNKED variant hash-slices each side separately — a
hash computed on each side's NATIVE types routes equal-after-coercion
rows to different slices (live catch: q42's DECIMAL tier literals vs the
dump's DOUBLE produced 17.6M phantom diffs at sf10 while the unchunked
compare was exactly equal). Both sides therefore materialize through a
UNION ALL against the other side's empty set — forcing the same inferred
common types — BEFORE slicing, and the slice hash is computed on those
coerced values. `python3 tools/duckcompare.py` runs the self-test, which
pins exactly that regression (a DECIMAL-literal relation vs a DOUBLE
dump, chunking forced) plus a true-diff and a count-short-circuit case;
tools/gate.sh runs it on every certification.

Semantics (identical to the driver's compare):
  - columns compared BY NAME in the caller-given order (default: the
    duck relation's own order) — both sides are projected to that list,
    so physical column order in the dump is irrelevant;
  - exact row multiset, NULL == NULL (EXCEPT ALL semantics);
  - rowcounts first; a count mismatch short-circuits (diff_rows=None)
    before any compare work (ADVICE r17).
"""
import os
import sys


def multiset_compare(con, duck_sql, spark_glob, cols=None,
                     chunk_rows=None, progress=None):
    """Exact multiset equality of (duck_sql) vs read_parquet(spark_glob).

    Returns (duck_rows, spark_rows, diff_rows); diff_rows is None when the
    rowcounts already disagree (compare skipped). Slices through
    UNION-coerced temp tables when either side exceeds chunk_rows
    (default GRAFT_DUCK_CHUNK_ROWS or 5M).
    """
    if chunk_rows is None:
        chunk_rows = int(os.environ.get("GRAFT_DUCK_CHUNK_ROWS", "5000000"))
    con.execute(f"CREATE OR REPLACE TEMP VIEW _dc_duck AS {duck_sql}")
    if cols is None:
        cols = [d[0] for d in con.execute(
            "SELECT * FROM _dc_duck LIMIT 0").description]
    collist = ", ".join(f'"{c}"' for c in cols)
    spark_src = f"SELECT {collist} FROM read_parquet('{spark_glob}')"
    duck_src = f"SELECT {collist} FROM _dc_duck"
    d_rows = con.execute("SELECT COUNT(*) FROM _dc_duck").fetchone()[0]
    s_rows = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
    if d_rows != s_rows:
        con.execute("DROP VIEW IF EXISTS _dc_duck")
        return d_rows, s_rows, None
    K = max(1, (max(d_rows, s_rows) + chunk_rows - 1) // chunk_rows)
    if K > 1:
        # Coerce BOTH sides to the UNION-unified common types before the
        # slice hash (module docstring) — this is the load-bearing step.
        # The types come from one LIMIT-0 DESCRIBE of the union; explicit
        # CASTs to that common type are then pushed into each scan, so the
        # slices are plain filtered scans with NO materialized coerced
        # copy of either side (an sf100 600M-row result would need
        # ~100+ GB of temp-table spill for two coerced copies; the K
        # filtered scans need none).
        utypes = con.execute(f"""DESCRIBE
          SELECT * FROM ({spark_src} LIMIT 0)
          UNION ALL SELECT * FROM ({duck_src} LIMIT 0)""").fetchall()
        castlist = ", ".join(
            f'CAST("{r[0]}" AS {r[1]}) AS "{r[0]}"' for r in utypes)
        spark_src = f"SELECT {castlist} FROM read_parquet('{spark_glob}')"
        duck_src = f"SELECT {castlist} FROM _dc_duck"
    diff = 0
    try:
        for k in range(K):
            if K > 1:
                s = f"SELECT * FROM ({spark_src}) WHERE hash({collist}) % {K} = {k}"
                d = f"SELECT * FROM ({duck_src}) WHERE hash({collist}) % {K} = {k}"
            else:
                s, d = spark_src, duck_src
            diff += con.execute(f"""
              WITH s AS ({s}), d AS ({d}),
              x AS ((SELECT * FROM d EXCEPT ALL SELECT * FROM s)
                    UNION ALL
                    (SELECT * FROM s EXCEPT ALL SELECT * FROM d))
              SELECT COUNT(*) FROM x""").fetchone()[0]
            if progress and K > 1:
                progress(k + 1, K, diff)
    finally:
        con.execute("DROP VIEW IF EXISTS _dc_duck")
    return d_rows, s_rows, diff


def _selftest():
    import duckdb

    tmp = "/tmp/duckcompare_selftest"
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    n = 10
    # dump side: DOUBLE column, as a Spark parquet dump would carry it
    con.execute(f"""COPY (
      SELECT range AS id, CAST(range AS DOUBLE) / 4 AS v
      FROM range({n})) TO '{tmp}/dump.parquet' (FORMAT PARQUET)""")

    # 1. REGRESSION (fdf81fa): duck side builds v from DECIMAL literals
    #    (x/4 as DECIMAL arithmetic), equal after coercion. chunk_rows=2
    #    forces K>1 hash slicing — the native-type hash would scatter
    #    equal rows across different slices and report phantom diffs.
    duck_sql = (f"SELECT range AS id, range * 0.25 AS v FROM range({n})")
    d, s, diff = multiset_compare(
        con, duck_sql, f"{tmp}/dump.parquet", chunk_rows=2)
    assert (d, s, diff) == (n, n, 0), \
        f"DECIMAL-vs-DOUBLE chunked compare regressed: {(d, s, diff)}"

    # 2. unchunked path agrees
    d, s, diff = multiset_compare(
        con, duck_sql, f"{tmp}/dump.parquet", chunk_rows=10 ** 9)
    assert (d, s, diff) == (n, n, 0), f"unchunked compare broke: {(d, s, diff)}"

    # 3. a true value diff is reported through the chunked path
    bad = f"SELECT range AS id, CASE WHEN range = 3 THEN 9.9 ELSE range * 0.25 END AS v FROM range({n})"
    d, s, diff = multiset_compare(con, bad, f"{tmp}/dump.parquet", chunk_rows=2)
    assert diff == 2, f"true diff not reported: {(d, s, diff)}"

    # 4. count mismatch short-circuits (diff None, no compare)
    d, s, diff = multiset_compare(
        con, f"SELECT range AS id, range * 0.25 AS v FROM range({n - 1})",
        f"{tmp}/dump.parquet", chunk_rows=2)
    assert (d, s, diff) == (n - 1, n, None), f"short-circuit broke: {(d, s, diff)}"

    # 5. column order independence: dump (id, v) vs duck (v, id)
    d, s, diff = multiset_compare(
        con, f"SELECT range * 0.25 AS v, range AS id FROM range({n})",
        f"{tmp}/dump.parquet", cols=["id", "v"], chunk_rows=2)
    assert (d, s, diff) == (n, n, 0), f"column-order compare broke: {(d, s, diff)}"

    print("PASS duckcompare selftest (5 cases)")


if __name__ == "__main__":
    _selftest()
