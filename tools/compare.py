#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracleSql (from oracle_sql.json) in DuckDB with views
named after the parquet tables, sort columns by name, and compare
row-by-row. Exact equality, like the driver's hash compare.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            ora_rel = con.sql(oracle[name])
            ora_cols = sorted(ora_rel.columns)
            ora_rows = con.sql(f"SELECT {', '.join(ora_cols)} FROM ora_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"FAIL {name}: columns spark={spark_cols} oracle={ora_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(ora_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(ora_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, ora_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(spark_rows)} rows differ; first at {i}:")
            print(f"  cols:   {spark_cols}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
