#!/usr/bin/env python3
"""Per-query variance band from >= 2 same-HEAD Bench records.

Usage: python3 tools/variance_band.py out.json run1.json run2.json [...]

Reads each record's "queries" map, emits one JSON with, per query:
min/max seconds across runs and the max/min ratio, plus suite totals.
The committed band sits next to bench/canonical_1x.json so a trend
claim can be checked against the measured same-HEAD spread instead of
being asserted (VERDICT r14 #3: best-of-2 did not bound codec/GC suite
contention; totals spread +-5%, single queries up to 7.5x).
"""
import json
import sys


def main():
    out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    assert len(runs) >= 2, "need >= 2 run records"
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])
    band = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs]
        lo, hi = min(vals), max(vals)
        band[n] = {"min_sec": round(lo, 4), "max_sec": round(hi, 4),
                   "ratio": round(hi / lo, 3) if lo > 0 else None}
    totals = [r["total_sec"] for r in runs]
    rec = {
        "n_runs": len(runs),
        "totals_sec": [round(t, 2) for t in totals],
        "total_spread_pct": round(100 * (max(totals) - min(totals)) / min(totals), 2),
        "outliers_ratio_ge_2": {n: b for n, b in band.items() if b["ratio"] and b["ratio"] >= 2},
        "queries": band,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in ("n_runs", "totals_sec", "total_spread_pct")}))
    print("outliers >=2x:", ", ".join(sorted(rec["outliers_ratio_ge_2"])) or "none")


if __name__ == "__main__":
    main()
