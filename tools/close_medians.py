#!/usr/bin/env python3
"""Build BENCH_SELF_r{N}_close_medians.json from the three close runs."""
import json, sys

round_no = int(sys.argv[1])
runs = [json.load(open(f"BENCH_SELF_r{round_no}_close_run{i}.json")) for i in (1, 2, 3)]
names = sorted(set().union(*[r["queries"].keys() for r in runs]))
medians = {}
for q in names:
    vals = sorted(v for v in (r["queries"].get(q) for r in runs) if v is not None)
    if vals:
        medians[q] = round(vals[len(vals) // 2], 6)
out = {
    "metric": f"round{round_no}_close_medians",
    "unit": "sec",
    "sf": runs[0]["sf"],
    "n_runs": 3,
    "total_of_medians": round(sum(medians.values()), 3),
    "run_totals": [round(r["value"], 3) for r in runs],
    "calibration_per_run": [r["calibration"] for r in runs],
    "outliers_per_run": [r.get("outliers", {}) for r in runs],
    "queries": medians,
}
path = f"BENCH_SELF_r{round_no}_close_medians.json"
json.dump(out, open(path, "w"), indent=1)
print(f"{path}: {len(medians)} queries, total_of_medians={out['total_of_medians']}, run_totals={out['run_totals']}")
