#!/usr/bin/env python3
"""Drift-normalized regression table between two quiet bench records.

    tools/drift_table.py <prev_record.json> <new_record.json> [top_n]
    tools/drift_table.py <prev_record.json> <new_record.json> [top_n] \
        --fit q1,q2,...

Uses the new record's structured `calibration` block (written by
tools/bench_quiet.sh). Since round 16 the block carries a TWO-parameter
box-drift model fitted on same-code A/B points:

    t_now ~ drift_intercept + drift_slope * t_prev

(round-15 verdict directive 1: this round's box shift was a FIXED
per-query overhead — heavies 0.90x, shorts 1.5x+ — which no single
scalar can normalize). A query's normalized ratio is

    new / (intercept + slope * prev)

i.e. observed vs the time the model predicts for UNCHANGED code on
today's box. Ratios near 1.0 are drift; sustained >1.3 after
normalization deserve a look. Falls back to the round-15 scalar
drift_coefficient when the record predates the model.

--fit q1,q2,...: fit (intercept, slope) directly from the two RECORD
files over the given subset instead of the calibration block. This
assumes the subset's code was FLAT between the records (it is NOT a
same-code A/B), so it is only for replaying historical record pairs —
e.g. the r14->r15 pure-box-shift sanity check — never for judging a
new round's code.
"""
import json
import sys

# exact-match flag parsing (round-16 ADVICE: a prefix match swallowed
# unrelated args starting with "--fit", and a trailing bare --fit
# indexed past argv)
args = []
fit_subset = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--fit":
        if i + 1 >= len(argv):
            sys.exit("--fit needs a comma-separated query list")
        fit_subset = argv[i + 1].split(",")
        i += 2
    elif a.startswith("--fit="):
        fit_subset = a.split("=", 1)[1].split(",")
        i += 1
    elif a.startswith("--"):
        sys.exit(f"unknown flag {a}")
    else:
        args.append(a)
        i += 1
if len(args) < 2:
    sys.exit("usage: drift_table.py <prev_record.json> <new_record.json> "
             "[top_n] [--fit q1,q2,...]")

prev_f, new_f = args[0], args[1]
top_n = int(args[2]) if len(args) > 2 else 15
prev = json.load(open(prev_f))
new = json.load(open(new_f))
cal = new.get("calibration", {})


def lsq(points):
    n = len(points)
    mx = sum(x for x, _ in points) / n
    my = sum(y for _, y in points) / n
    var = sum((x - mx) ** 2 for x, _ in points)
    cov = sum((x - mx) * (y - my) for x, y in points)
    b = cov / var if var > 0 else 1.0
    return my - b * mx, b


cal_pts = []  # same-code (or assumed-flat) points used to fit/envelope
if fit_subset:
    cal_pts = [(prev["queries"][q], new["queries"][q]) for q in fit_subset
               if q in prev["queries"] and q in new["queries"]]
    if len(cal_pts) < 3:
        sys.exit(f"--fit subset has only {len(cal_pts)} usable points")
    a, b = lsq(cal_pts)
    src = f"--fit over {len(cal_pts)} record points (ASSUMES flat code)"
elif "drift_slope" in cal:
    a, b = cal["drift_intercept"], cal["drift_slope"]
    src = (f"same-code calibration block ({len(cal.get('queries', []))} "
           "points, prev commit re-benched now)")
    pnow = cal.get("prev_now_queries", {})
    cal_pts = [(prev["queries"][q], pnow[q]) for q in pnow
               if q in prev["queries"]]
elif "drift_coefficient" in cal:
    a, b = 0.0, cal["drift_coefficient"]
    src = "LEGACY scalar drift_coefficient (pre-round-16 record)"
else:
    sys.exit("new record has no calibration block "
             "(cut it with tools/bench_quiet.sh <out> <prev_commit> "
             "<prev_record>) and no --fit subset was given")

# Box-drift ENVELOPE: the calibration points are same-code, so their
# residuals around the fit measure how far an individual healthy query
# can sit from the affine model by pure box (r15's shift had a 0.1-0.7s
# per-query overhead SPREAD that one intercept cannot absorb). A query
# is flagged only when it exceeds BOTH the 1.3x normalized-ratio rule
# (with the envelope's own worst ratio + 0.05 as the floor) and the
# envelope's worst absolute excess — on the r14->r15 pure-box replay
# this flags exactly q111 (the round-15 watch item) instead of 172.
env_ratio, env_abs = 1.0, 0.0
if cal_pts:
    env_ratio = max(y / (a + b * x) for x, y in cal_pts if a + b * x > 0)
    env_abs = max(y - (a + b * x) for x, y in cal_pts)

rows = []
for q, nv in new["queries"].items():
    pv = prev["queries"].get(q)
    if pv is None or pv < 0.05:  # sub-50ms: pure noise
        continue
    expected = a + b * pv
    rows.append((q, pv, nv, nv / expected if expected > 0 else float("inf")))

rows.sort(key=lambda r: -r[3])
print(f"drift model: t_now ~ {a:.4f} + {b:.4f} * t_prev   [{src}]")
if "prev_now_total" in cal:
    print(f"  (calibration: prev-commit subset now {cal['prev_now_total']}s "
          f"vs prev record {cal.get('prev_record_total')}s)")
exp_total = sum(a + b * pv for _, pv, _, _ in rows)
new_total = sum(nv for _, _, nv, _ in rows)
print(f"totals over compared queries: prev {sum(pv for _, pv, _, _ in rows):.1f}s"
      f" -> new {new_total:.1f}s (model-expected {exp_total:.1f}s,"
      f" normalized {new_total / exp_total:.3f}x)")
print("\n| query | prev s | new s | normalized ratio |")
print("|---|---|---|---|")
for q, pv, nv, r in rows[:top_n]:
    print(f"| {q} | {pv:.3f} | {nv:.3f} | {r:.2f}x |")
over = [q for q, _, _, r in rows if r > 1.3]
print(f"\n{len(over)} queries exceed 1.3x normalized: {over[:10]}")
thr = max(1.3, env_ratio + 0.05)
flagged = [(q, r) for q, pv, nv, r in rows
           if r > thr and nv - (a + b * pv) > env_abs]
print(f"envelope (same-code residuals): worst ratio {env_ratio:.3f}, "
      f"worst abs excess {env_abs:.3f}s")
print(f"{len(flagged)} queries FLAGGED beyond the box envelope "
      f"(ratio > {thr:.2f} AND excess > {env_abs:.3f}s): "
      f"{[(q, round(r, 2)) for q, r in flagged[:10]]}")
