#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare row-count/columns/values against the
Spark-written parquet in the verify output dir."""
import duckdb, json, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name:22s} MISSING spark output"); fails.append(name); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name:22s} ORACLE ERROR: {e}"); fails.append(name); continue
    got = con.execute(f"SELECT * FROM '{spark_files[0]}'").fetchdf()
    # sort columns by name (driver behavior), compare values
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    status = []
    if list(exp.columns) != list(got.columns):
        status.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
    if len(exp) != len(got):
        status.append(f"rows exp={len(exp)} got={len(got)}")
    if not status:
        # row-order-insensitive compare via sorted stringification
        es = sorted(map(tuple, exp.astype(str).values.tolist()))
        gs = sorted(map(tuple, got.astype(str).values.tolist()))
        if es != gs:
            diff = [(a, b) for a, b in zip(es, gs) if a != b][:3]
            status.append(f"values differ, first diffs: {diff}")
        # also check exact row order (driver may be order-sensitive)
        eo = list(map(tuple, exp.astype(str).values.tolist()))
        go = list(map(tuple, got.astype(str).values.tolist()))
        if es == gs and eo != go:
            status.append("SET-EQUAL but row order differs")
    if status:
        print(f"{name:22s} FAIL: {'; '.join(status)}"); fails.append(name)
    else:
        print(f"{name:22s} OK ({len(got)} rows)")

rows_only = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
for name in sorted(rows_only):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = con.execute(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] if files else -1
    print(f"{name:22s} rows-only: {n} rows")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
