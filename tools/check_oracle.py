#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result written by graft.Verify,
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
(with views named after the testdata tables), sorts columns by name and
rows by all columns, and reports exact-match / mismatch per query.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to dodge dtype differences (int32 vs int64 etc.)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that crashed in Verify writes no dir — that's a failure,
    # not a skip
    for missing in sorted(set(oracle) - set(names)):
        print(f"[FAIL] {missing}: no output written by Verify")
        failures += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); failures += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"[skip] {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); failures += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures += 1
        elif len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}")
            failures += 1
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"[FAIL] {name}: {int(diff.sum())} differing rows, e.g.")
            for i in idx:
                print(f"   got: {g.loc[i].to_dict()}\n   exp: {e.loc[i].to_dict()}")
            failures += 1
        else:
            print(f"[ ok ] {name}: {len(g)} rows match")
    print(f"== {len(names)} checked, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
