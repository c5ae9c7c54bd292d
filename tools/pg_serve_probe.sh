#!/usr/bin/env bash
# Real-Postgres serving round-trip (r14 "missing #2", as far as the sandbox
# allows). The box ships PostgreSQL 15 but no JDBC driver (zero egress), so
# the probe splits the serving path at the wire: graft.tools.
# PostgresServeProbe emits the CREATE TABLE DDL rendered by Spark's own
# PostgresDialect plus the master table as CSV + parquet; this script runs
# a REAL unix-socket Postgres (no network), creates the table from that
# DDL, COPYs the rows in and back out, and DuckDB multiset-compares the
# round-trip against the engine's parquet ground truth. What this proves:
# the Postgres-dialect DDL is valid and every value the engine computes
# survives a real Postgres 15 store/retrieve byte-exactly (timestamps,
# doubles, booleans, NULLs). What it doesn't: the JDBC wire protocol —
# that half is proven against embedded Derby (JdbcSinkSpec) with the
# reference's exact batch/overwrite semantics.
# Usage: tools/pg_serve_probe.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/pg_serve}"
PGDIR=/tmp/pgprobe
PSQL="psql -h $PGDIR -U graft -d postgres -v ON_ERROR_STOP=1 -q"

bash tools/run.sh graft.tools.PostgresServeProbe "$SF" "$OUT" | grep "\[pg-probe\]"
chmod -R a+rX "$OUT"   # psql runs as nobody and \copy reads client-side

# Postgres refuses root: init + run the server as nobody on a unix socket
# only (listen_addresses='') — no TCP, no network.
if ! su nobody -s /bin/bash -c "cd /tmp && $PSQL -c 'SELECT 1'" >/dev/null 2>&1; then
  rm -rf "$PGDIR"; mkdir -p "$PGDIR"; chown nobody:nogroup "$PGDIR"
  su nobody -s /bin/bash -c "cd /tmp &&
    initdb -D $PGDIR/data -A trust -U graft > $PGDIR/initdb.log 2>&1 &&
    pg_ctl -D $PGDIR/data -o \"-c listen_addresses='' -c unix_socket_directories=$PGDIR\" \
      -l $PGDIR/pg.log start && sleep 2"
fi
su nobody -s /bin/bash -c "cd /tmp && $PSQL -c \"SELECT 'postgres ' || version()\"" | head -2

CSV=$(ls "$OUT"/csv/part-*.csv | head -1)
su nobody -s /bin/bash -c "cd /tmp &&
  $PSQL -c 'DROP TABLE IF EXISTS master_serve' &&
  $PSQL -f '$OUT/ddl.sql' &&
  $PSQL -c \"\\copy master_serve FROM '$CSV' WITH (FORMAT csv, NULL '\\N')\" &&
  $PSQL -c \"\\copy master_serve TO '$PGDIR/roundtrip.csv' WITH (FORMAT csv, NULL '\\N', HEADER true)\" &&
  $PSQL -c 'SELECT COUNT(*) AS pg_rows FROM master_serve'"

python3 - "$OUT" "$PGDIR/roundtrip.csv" <<'EOF'
import sys
import duckdb
out, rt = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# column names + types from the engine's parquet ground truth, so the CSV
# readback is typed identically (no inference drift)
schema = con.execute(f"DESCRIBE SELECT * FROM "
                     f"read_parquet('{out}/parquet/*.parquet')").fetchall()
colspec = ", ".join(f"'{name}': '{typ}'" for name, typ, *_ in schema)
cl = ", ".join(f'"{name}"' for name, *_ in sorted(schema))
d_rows, p_rows, diff = con.execute(f"""
  WITH p AS (SELECT {cl} FROM read_parquet('{out}/parquet/*.parquet')),
  r AS (SELECT {cl} FROM read_csv('{rt}', header=true, nullstr='\\N',
        columns={{{colspec}}})),
  x AS ((SELECT * FROM p EXCEPT ALL SELECT * FROM r)
        UNION ALL (SELECT * FROM r EXCEPT ALL SELECT * FROM p))
  SELECT (SELECT COUNT(*) FROM p), (SELECT COUNT(*) FROM r),
         (SELECT COUNT(*) FROM x)""").fetchone()
ok = d_rows == p_rows and diff == 0
print(f"{'PASS' if ok else 'FAIL'} pg_serve_roundtrip: parquet={d_rows} "
      f"postgres={p_rows} diff_rows={diff}")
sys.exit(0 if ok else 1)
EOF
