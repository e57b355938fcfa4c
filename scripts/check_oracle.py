#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate: run each
oracle_sql.json query against the sf tables, compare row-multisets
(columns sorted by name, values rounded via the SQL itself) with the
Spark parquet dumps from graft.Verify."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify-out"

con = duckdb.connect()
for t in ["documents", "embeddings", "events", "lineitem", "orders",
          "customer", "supplier", "part", "nation", "region"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    tbl = pq.read_table(files[0])
    scols = tbl.column_names
    srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
    try:
        res = con.sql(oracle[name])
        dcols = res.columns
        drows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    if sorted(scols) != sorted(dcols):
        print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}"); fails += 1; continue
    a, b = canon(srows, scols), canon(drows, dcols)
    if a != b:
        fails += 1
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
        diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
        print(f"  spark-only: {diff_a}")
        print(f"  duck-only:  {diff_b}")
    else:
        print(f"OK   {name}: {len(a)} rows")

rows_only = [d.split('/')[-1] for d in glob.glob(f"{out}/*") if '.' not in d.split('/')[-1]]
no_oracle = sorted(set(rows_only) - set(oracle))
for name in no_oracle:
    files = glob.glob(f"{out}/{name}/*.parquet")
    nrows = pq.read_table(files[0]).num_rows if files else -1
    print(f"ROWS {name}: {nrows} rows (no oracle)")

sys.exit(1 if fails else 0)
