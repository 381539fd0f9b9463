#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]

Runs DuckDB over the same parquet tables the Spark Verify dump used,
executes each oracle_sql.json entry, and compares against the Spark
parquet output: schema (sorted column names), row count, and a hash of
all values with columns sorted by name and rows sorted by all columns.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.10g").encode()
    return hashlib.sha256(body).hexdigest()[:16]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        print(f"MISSING  {name}: no spark output")
        fails += 1
        continue
    try:
        oracle = norm(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"ORAFAIL  {name}: {str(e)[:200]}")
        fails += 1
        continue
    got = norm(con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchdf())
    schema_ok = list(got.columns) == list(oracle.columns)
    rows_ok = len(got) == len(oracle)
    hash_ok = schema_ok and rows_ok and h(got) == h(oracle)
    if hash_ok:
        print(f"OK       {name}: {len(got)} rows")
    else:
        fails += 1
        print(f"MISMATCH {name}: schema_ok={schema_ok} rows {len(got)}vs{len(oracle)}")
        if not schema_ok:
            print(f"   spark:  {list(got.columns)}\n   oracle: {list(oracle.columns)}")
        elif rows_ok:
            for c in got.columns:
                if not got[c].equals(oracle[c]):
                    diff = (got[c] != oracle[c])
                    i = diff[diff].index[0] if diff.any() else None
                    print(f"   col {c}: first diff at row {i}: "
                          f"spark={got[c][i]!r} oracle={oracle[c][i]!r}")
# queries without oracle: rows-only check
queried = set(json.load(open(f"{OUT}/oracle_sql.json")))
for d in sorted(glob.glob(f"{OUT}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in queried:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
        print(f"{'OK ' if n > 0 else 'EMPTY'}      {name} (no oracle): {n} rows")
        if n == 0:
            fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
