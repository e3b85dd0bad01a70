#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison (round 18).

Implements the documented method (NOTES_r17.md "Bench method note"):
for two capture files A (older) and B (newer), each carrying
"calibration":{scan_sec_pre, shuffle_sec_pre, scan_sec_post, shuffle_sec_post},
compute per-probe drift = post_B / post_A (POST values — the pre probes
still carry JVM settling; see NOTES_r17), normalize every shared query's
ratio by the scan drift (the conservative default: most of the surface
is scan-bound at sf0.1), and flag any query whose NORMALIZED ratio
exceeds the threshold (default 1.3) as a plan-change suspect requiring
solo attribution.

Usage: normalized_diff.py OLD.json NEW.json [threshold]
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)

def calib_post(d):
    """Median POST probe values: single-capture files carry
    "calibration"; medians files carry "calibration_per_run"."""
    if "calibration" in d:
        runs = [d["calibration"]]
    else:
        runs = d["calibration_per_run"]
    def med(key):
        v = sorted(r[key] for r in runs)
        return v[len(v) // 2]
    return med("scan_sec_post"), med("shuffle_sec_post")

old, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
(o_scan, o_shuf), (n_scan, n_shuf) = calib_post(old), calib_post(new)
drift_scan = n_scan / o_scan
drift_shuf = n_shuf / o_shuf
qo = {k: v for k, v in old["queries"].items() if v is not None}
qn = {k: v for k, v in new["queries"].items() if v is not None}
shared = sorted(set(qo) & set(qn))
rows = []
for q in shared:
    raw = qn[q] / qo[q] if qo[q] > 0 else float("nan")
    rows.append((q, qo[q], qn[q], raw, raw / drift_scan))
rows.sort(key=lambda r: -r[4])
ratios = sorted(r[4] for r in rows)
med = ratios[len(ratios) // 2]
tot_o, tot_n = sum(qo[q] for q in shared), sum(qn[q] for q in shared)
print(f"shared queries: {len(shared)}")
print(f"calibration drift (POST, new/old): scan {drift_scan:.3f}  shuffle {drift_shuf:.3f}")
print(f"total (shared): {tot_o:.1f}s -> {tot_n:.1f}s  raw {tot_n/tot_o:.3f}x  "
      f"scan-normalized {tot_n/tot_o/drift_scan:.3f}x")
print(f"median normalized per-query ratio: {med:.3f}")
suspects = [r for r in rows if r[4] > thr and r[2] - r[1] > 0.1]
print(f"\nnormalized ratio > {thr} (and >0.1s absolute delta): {len(suspects)}")
for q, o, n, raw, norm in suspects:
    print(f"  {q:32s} {o:7.3f}s -> {n:7.3f}s  raw {raw:5.2f}x  norm {norm:5.2f}x")
print("\ntop 10 normalized improvements:")
for q, o, n, raw, norm in rows[-10:][::-1]:
    print(f"  {q:32s} {o:7.3f}s -> {n:7.3f}s  raw {raw:5.2f}x  norm {norm:5.2f}x")
