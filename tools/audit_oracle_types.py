#!/usr/bin/env python3
"""Fast oracle-SQL type audit (no Spark run needed): binds every oracle
SQL in a `graft.Verify` dump (or a raw oracle_sql.json) against the sf
tables in DuckDB and flags any result column whose declared type Spark
cannot emit from parquet — HUGEINT / UHUGEINT / DECIMAL / UINTEGER /
UBIGINT. These are the types DuckDB silently widens to (SUM(BIGINT) ->
HUGEINT, bare decimal literal -> DECIMAL) and they break the driver's
type-sensitive hash even when values match (round-6 postmortem).

Usage: python3 tools/audit_oracle_types.py [sfDir] [oracle_sql.json]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT",
          "USMALLINT", "UTINYINT")


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    oracle = json.load(open(path))
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            hits = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                    if str(t).upper().startswith(BANNED)]
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        if hits:
            print(f"BAD  {name}: {', '.join(hits)}")
            n_bad += 1
    print(f"== {len(oracle) - n_bad}/{len(oracle)} oracles type-clean ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
