#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

For each query in <verify_out_dir>/oracle_sql.json:
  - read our result parquet from <verify_out_dir>/<name>/
  - run the oracle SQL in DuckDB against views named after fixture tables
  - sort columns by name, sort rows, compare cell-by-cell (exact; doubles
    compared bitwise after both engines' own rounding).
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    return list(df.columns), rows


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ours_cols, ours = canon(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            )
            oracle_cols, theirs = canon(con, sql)
            if ours_cols != oracle_cols:
                print(f"FAIL {name}: columns {ours_cols} vs {oracle_cols}")
                n_fail += 1
            elif ours == theirs:
                print(f"PASS {name} ({len(ours)} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
                only_ours = [r for r in ours if r not in set(theirs)][:3]
                only_theirs = [r for r in theirs if r not in set(ours)][:3]
                print(f"  cols: {ours_cols}")
                print(f"  only-ours:   {only_ours}")
                print(f"  only-oracle: {only_theirs}")
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
