#!/usr/bin/env python3
"""Dev-only differential check mimicking the driver's correctness gate:
read each Spark result parquet written by `graft.Verify`, run the paired
oracle SQL in DuckDB over the same sf tables, and compare (columns sorted
by name, rows sorted by all columns, exact equality incl. doubles).

Usage: python3 tools/check_parity.py [sfDir] [verifyOutDir]
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = normalize(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            duck_df = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.astype(float), b.astype(float)
                neq = ~((af == bf) | (af.isna() & bf.isna()))
                if neq.any():
                    d = (af - bf).abs().max()
                    bad.append(f"{c} (maxdiff={d!r}, n={int(neq.sum())})")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    neq = a.astype(str) != b.astype(str)
                    i = neq.idxmax()
                    bad.append(f"{c} (n={int(neq.sum())}, first row {i}: {a[i]!r} vs {b[i]!r})")
        if bad:
            print(f"FAIL {name}: value mismatch: {'; '.join(bad)}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"== {len(oracle) - n_fail}/{len(oracle)} queries match ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
