#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each testdata parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares the
result against the Spark parquet dump in <verifyOutDir>/<name>/ —
column-name-sorted, row-sorted, exact value equality (with a bit-level check
for floats). Exit code 1 if any query mismatches.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to comparable python objects
    def canon(v):
        if isinstance(v, (np.floating, float)):
            return float(v)
        if isinstance(v, (np.integer, int)):
            return int(v)
        if isinstance(v, (list, np.ndarray)):
            return tuple(canon(x) for x in v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return None
        return v
    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), kind="mergesort",
                           na_position="first").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        s, o = normalize(spark), normalize(oracle)
        if list(s.columns) != list(o.columns):
            print(f"[FAIL] {name}: columns differ spark={list(s.columns)} oracle={list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"[FAIL] {name}: rows differ spark={len(s)} oracle={len(o)}")
            failures += 1
            continue
        if s.equals(o):
            print(f"[ OK ] {name}: {len(s)} rows x {len(s.columns)} cols")
        else:
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())}/{len(s)} rows differ; first diffs:")
            idx = s.index[bad][:5]
            for i in idx:
                for c in s.columns:
                    if neq.at[i, c]:
                        print(f"    row {i} col {c}: spark={s.at[i,c]!r} oracle={o.at[i,c]!r}")
            failures += 1
    print(f"--- {failures} failure(s)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
