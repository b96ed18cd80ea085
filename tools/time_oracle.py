#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the cross-engine anchor for BASELINE.md.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir>

Runs every query in <verifyOutDir>/oracle_sql.json against DuckDB views
over the sf dir's parquet tables (exactly the driver's oracle setup) and
reports per-query, per-family, and total wall-clock. fetchall() forces
materialization so lazy relations can't under-report.

Pair the total with the Spark side's wall-clock for the same surface
(graft.Verify at the same sfDir) for a like-for-like engine comparison
on identical relations and identical result sets.
"""
import json
import sys
import time
from collections import defaultdict

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    limit_s = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    timings, errors = {}, {}
    t_suite = time.monotonic()
    for name in sorted(oracle):
        t0 = time.monotonic()
        watchdog = None
        if limit_s > 0:
            import threading
            watchdog = threading.Timer(limit_s, con.interrupt)
            watchdog.start()
        try:
            rows = con.sql(oracle[name]).fetchall()
            timings[name] = (time.monotonic() - t0, len(rows))
            print(f"  q {name} {timings[name][0]:.2f}s", flush=True)
        except Exception as e:
            errors[name] = str(e)[:200]
            print(f"  q {name} FAIL after {time.monotonic()-t0:.1f}s: {errors[name][:80]}", flush=True)
        finally:
            if watchdog:
                watchdog.cancel()
    suite_s = time.monotonic() - t_suite
    fams = defaultdict(float)
    for name, (s, _) in timings.items():
        fams[family(name)] += s
    for name, (s, n) in sorted(timings.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"  slow: {name} {s:.2f}s ({n} rows)")
    for fam, s in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"  family {fam}: {s:.2f}s")
    for name, e in errors.items():
        print(f"  ERROR {name}: {e}")
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(suite_s, 2),
                      "unit": "sec", "n_ok": len(timings), "n_err": len(errors),
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
