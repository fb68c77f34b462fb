#!/usr/bin/env python3
"""Drift-normalized regression table between two quiet bench records.

    tools/drift_table.py <prev_record.json> <new_record.json> [top_n]

Uses the new record's structured `calibration` block (written by
tools/bench_quiet.sh): drift_coefficient = prev-commit calibration
subset re-benched NOW / the same subset in the PREVIOUS record. A
query's normalized ratio is (new / (prev * coefficient)) — the
code-attributable movement with box drift divided out. Ratios near 1.0
are drift; sustained >1.3 after normalization deserve a look.
"""
import json
import sys

prev_f, new_f = sys.argv[1], sys.argv[2]
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
prev = json.load(open(prev_f))
new = json.load(open(new_f))
cal = new.get("calibration", {})
coef = cal.get("drift_coefficient")
if coef is None:
    sys.exit("new record has no calibration.drift_coefficient "
             "(cut it with tools/bench_quiet.sh <out> <prev_commit> <prev_record>)")

rows = []
for q, nv in new["queries"].items():
    pv = prev["queries"].get(q)
    if pv is None or pv < 0.05:  # sub-50ms: pure noise
        continue
    rows.append((q, pv, nv, nv / (pv * coef)))

rows.sort(key=lambda r: -r[3])
print(f"drift_coefficient = {coef} "
      f"(prev-commit subset now {cal.get('prev_now_total')}s "
      f"vs prev record {cal.get('prev_record_total')}s)")
print(f"totals: prev {prev['value']}s -> new {new['value']}s "
      f"(normalized {new['value'] / (prev['value'] * coef):.3f}x)")
print(f"\n| query | prev s | new s | normalized ratio |")
print("|---|---|---|---|")
for q, pv, nv, r in rows[:top_n]:
    print(f"| {q} | {pv:.3f} | {nv:.3f} | {r:.2f}x |")
over = [q for q, _, _, r in rows if r > 1.3]
print(f"\n{len(over)} queries exceed 1.3x normalized: {over[:10]}")
