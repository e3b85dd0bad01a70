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

Round-20 additions (VERDICT r19 "Next round" #2 + ADVICE r19):
  - FAMILY AGGREGATE rows: the per-query 1.3x/0.1s criterion structurally
    misses distributed creep (r19's actual pattern: 20 serve-family
    queries each +10-20%, ~+2-3 s aggregate, zero per-query suspects).
    Queries are grouped by prefix family and each family's normalized
    TOTAL ratio is reported; families over the family threshold
    (scan-normalized > 1.05 AND normalized delta > 0.5 s) are flagged —
    calibrated so the r19 serve-family creep (q_stream/q_hybrid/
    q_dedup_index at 1.06-1.08x scan-normalized, +0.5-1.3 s each) WOULD
    have flagged. Read a flag against the shuffle-normalized column too:
    the probes disagree by a few percent, so a 1.05-1.08x scan-norm
    family at ~1.0x shuffle-norm may be drift — the flag demands
    attribution (family-level solo or a code-delta check), not a revert.
  - degenerate captures (every shared query old<=0, or no shared
    queries) report cleanly instead of crashing on an empty median.

Usage: normalized_diff.py OLD.json NEW.json [threshold]
"""
import json, sys

# Longest-match family prefixes (the repo's query-name taxonomy); anything
# unmatched falls back to its first two underscore tokens.
FAMILIES = sorted(
    ["q_dedup_index", "q_span_dedup", "q_stream", "q_bm25", "q_hybrid",
     "q_knn", "q_topic", "q_tokenize", "q_media", "q_embed", "q_minhash",
     "q_simhash", "q_winnow", "q_perplexity", "q_bpe", "q_jaccard",
     "q_dedup", "q_neardup", "q_concordance", "q_clean", "q_dup_clusters"],
    key=len, reverse=True)

def family(q):
    for f in FAMILIES:
        if q == f or q.startswith(f + "_"):
            return f
    return "_".join(q.split("_")[:2])

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
print(f"shared queries: {len(shared)}"
      + (f"  (skipped {len(degenerate)} with old median <= 0: {degenerate})"
         if degenerate else ""))
print(f"calibration drift (POST, new/old): scan {drift_scan:.3f}  shuffle {drift_shuf:.3f}")
if not rows:
    # degenerate capture: nothing comparable — report and exit cleanly
    # (ADVICE r19: the empty median/total used to crash the tool)
    print("no comparable queries (empty shared set or every old median <= 0)")
    sys.exit(0)
ratios = sorted(r[4] for r in rows)
med = ratios[len(ratios) // 2]
tot_o = sum(r[1] for r in rows)
tot_n = sum(r[2] for r in rows)
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

# family aggregates: total old/new per prefix family — the lens that sees
# 20 queries x 10% where the per-query criterion sees nothing
fams = {}
for q, o, n, raw, ns, nh in rows:
    f = fams.setdefault(family(q), [0, 0.0, 0.0])
    f[0] += 1
    f[1] += o
    f[2] += n
fam_rows = sorted(
    ((f, c, o, n, n / o, n / o / drift_scan, n / o / drift_shuf)
     for f, (c, o, n) in fams.items()),
    key=lambda r: -r[5])
fam_suspects = [r for r in fam_rows
                if r[5] > 1.05 and r[3] - r[2] * drift_scan > 0.5]
print(f"\nfamily aggregates ({len(fam_rows)} families; "
      f"flagged = norm_scan > 1.05 and >0.5s normalized delta):")
for f, c, o, n, raw, ns, nh in fam_rows:
    flag = "  <-- FAMILY SUSPECT" if (f, c, o, n, raw, ns, nh) in fam_suspects else ""
    print(f"  {f:20s} n={c:3d} {o:8.3f}s -> {n:8.3f}s  raw {raw:5.2f}x  "
          f"norm_scan {ns:5.2f}x  norm_shuf {nh:5.2f}x{flag}")

print("\ntop 10 normalized improvements:")
for q, o, n, raw, ns, nh in rows[-10:][::-1]:
    print(f"  {q:32s} {o:7.3f}s -> {n:7.3f}s  raw {raw:5.2f}x  "
          f"norm_scan {ns:5.2f}x  norm_shuf {nh:5.2f}x")
