#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by value, and compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            print(f"OK?  {name}: rows-only check, {len(got)} rows"
                  + ("  (EMPTY!)" if len(got) == 0 else ""))
            continue
        want = canon(con.execute(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # exact compare after per-column normalization (timestamps → str)
        g, w = got.astype(str), want.astype(str)
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first:")
            print("  spark :", g[neq].head(2).to_dict("records"))
            print("  duckdb:", w[neq].head(2).to_dict("records"))
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
