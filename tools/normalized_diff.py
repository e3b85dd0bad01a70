#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison (round 19).

Implements the documented method (NOTES_r17.md "Bench method note"):
for two capture files A (older) and B (newer), each carrying
"calibration":{scan_sec_pre, shuffle_sec_pre, scan_sec_post, shuffle_sec_post},
compute per-probe drift = post_B / post_A (POST values — the pre probes
still carry JVM settling; see NOTES_r17), normalize every shared query's
ratio by BOTH probe drifts (scan and shuffle — r18's probes disagreed by
35%, so a single normalizer can misread a shuffle-bound query by that
much), and flag plan-change suspects requiring solo attribution.

Round-19 criterion fixes (VERDICT r18 "What's wrong" #2):
  - the absolute-delta floor is NORMALIZED (new − old·scan_drift > 0.1 s),
    not raw — the raw floor structurally hid three 1.3–1.45× small-query
    readings in r18 because the box itself had sped up;
  - a shared query with a zero/negative old median is reported separately
    and never enters ratios (it used to become NaN and poison the sort
    and the median).

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
degenerate = [q for q in shared if qo[q] <= 0]
rows = []
for q in shared:
    if qo[q] <= 0:
        continue
    raw = qn[q] / qo[q]
    rows.append((q, qo[q], qn[q], raw, raw / drift_scan, raw / drift_shuf))
rows.sort(key=lambda r: -r[4])
ratios = sorted(r[4] for r in rows)
med = ratios[len(ratios) // 2]
tot_o = sum(qo[q] for q in shared if qo[q] > 0)
tot_n = sum(qn[q] for q in shared if qo[q] > 0)
print(f"shared queries: {len(shared)}"
      + (f"  (skipped {len(degenerate)} with old median <= 0: {degenerate})"
         if degenerate else ""))
print(f"calibration drift (POST, new/old): scan {drift_scan:.3f}  shuffle {drift_shuf:.3f}")
print(f"total (shared): {tot_o:.1f}s -> {tot_n:.1f}s  raw {tot_n/tot_o:.3f}x  "
      f"scan-normalized {tot_n/tot_o/drift_scan:.3f}x  "
      f"shuffle-normalized {tot_n/tot_o/drift_shuf:.3f}x")
print(f"median scan-normalized per-query ratio: {med:.3f}")
# suspect = scan-normalized ratio over threshold AND a normalized absolute
# delta over 0.1 s (what the query grew beyond the box's own drift)
suspects = [r for r in rows if r[4] > thr and r[2] - r[1] * drift_scan > 0.1]
print(f"\nscan-normalized ratio > {thr} (and >0.1s normalized delta): {len(suspects)}")
for q, o, n, raw, ns, nh in suspects:
    print(f"  {q:32s} {o:7.3f}s -> {n:7.3f}s  raw {raw:5.2f}x  "
          f"norm_scan {ns:5.2f}x  norm_shuf {nh:5.2f}x")
print("\ntop 10 normalized improvements:")
for q, o, n, raw, ns, nh in rows[-10:][::-1]:
    print(f"  {q:32s} {o:7.3f}s -> {n:7.3f}s  raw {raw:5.2f}x  "
          f"norm_scan {ns:5.2f}x  norm_shuf {nh:5.2f}x")
