#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (sorted rows, sorted columns)
against the Spark output parquet written by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats rounded for display only
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
    want = canon(con.sql(sql).df())
    if got.shape != want.shape:
        print(f"FAIL {name}: shape {got.shape} vs oracle {want.shape}")
        n_fail += 1
        continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
        n_fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({got.shape[0]} rows)")
        n_pass += 1
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
        # show first diff
        neq = (got != want) & ~(got.isna() & want.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print("  spark:", got.loc[i].to_dict())
            print("  duck :", want.loc[i].to_dict())
        n_fail += 1

# rows-only queries (in spark output but no oracle)
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"INFO {name}: rows-only check, {n} rows")

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
