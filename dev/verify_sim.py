#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 dev/verify_sim.py <outDir> [sfDir]

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares after sorting columns by name (like the driver) and
rows by all columns. Dev-only tool; the shipped library is pure Scala.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize missing values before any stringify: float NaN renders
    # 'nan' while object None renders 'None', which would false-FAIL on
    # mixed-dtype columns.
    df = df.astype(object).where(pd.notna(df), None)
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str))
    return df


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        eq = got.astype(str).equals(exp.astype(str))
        if eq:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            diff = (got.astype(str) != exp.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print(f"  spark: {got.loc[i].to_dict()}")
                print(f"  duck : {exp.loc[i].to_dict()}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
