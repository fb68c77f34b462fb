#!/bin/bash
# Standardized quiet bench record cut (round-14 verdict directive 1).
#
#   tools/bench_quiet.sh <out.json> [prev_commit]
#
# Produces the per-query-MIN-of-4 quiet record AND, when prev_commit is
# given, a STRUCTURED calibration block: the pinned 14-query subset is
# re-benched on the previous round's commit in a side worktree,
# INTERLEAVED with the same subset at HEAD (head,prev,head,prev), so
# box drift between records is a machine-readable MODEL instead of
# ad-hoc prose. tools/drift_table.py consumes the block.
#
# Methodology (the standing definition as of round 16):
#   - the record is cut at a CLEAN src/main tree and stamps `commit`
#     (round-15 directive 3: no post-cut perf-relevant commits).
#   - each full pass = Bench with SPARK_GRAFT_BENCH_RUNS=1 (one timed
#     run per query), 4 passes; the record value per query is the MIN
#     across passes; `passes` carries the 4 pass totals.
#   - calibration subset = 11 heavy queries (the round-13/14 prose A/B
#     set) + 3 SHORT queries anchoring the intercept; each calibration
#     pass = Bench with SPARK_GRAFT_BENCH_RUNS=3 (per-query MEDIAN of
#     3; the value used is the MIN of the two pass medians), 2 passes
#     per side, interleaved.
#   - drift model: least-squares t_now ~ drift_intercept +
#     drift_slope * t_prev_record over the 14 same-code points
#     (round-15 directive 1 — a scalar ratio cannot carry an additive
#     box shift). drift_coefficient (the scalar) is kept for
#     continuity.
#
# Round-17 verdict directive 2 — the TAIL-COMMIT rule, mechanized.
# A record is valid for a tree iff its stamped commit is the tree's
# last src/main-touching commit, OR the record carries an
# `adjudications` block covering every later src/main commit. Two
# subcommands serve that rule:
#
#   tools/bench_quiet.sh --adjudicate <record.json> <to_commit> <q1,q2,..>
#     Re-measures ONLY the named queries at <to_commit> (side
#     worktree, same 4-pass/min methodology as record rows), patches
#     them into the record, and stamps an adjudications entry with
#     the covered src/main commit list, the affected set, and the
#     old/new values. The caller proves the affected-set claim (grep
#     for the touched code's consumers) — the stamp makes it
#     auditable instead of prose.
#
#   tools/bench_quiet.sh --check <record.json>
#     PASSes iff the record's commit is HEAD's last src/main commit
#     or every later src/main commit is covered by adjudications.
set -euo pipefail

REPO_EARLY="$(cd "$(dirname "$0")/.." && pwd)"

if [ "${1:-}" = "--check" ]; then
  RECORD="${2:?usage: tools/bench_quiet.sh --check <record.json>}"
  python3 - "$RECORD" "$(git -C "$REPO_EARLY" log -1 --format=%H -- src/main build.sbt)" \
      "$(git -C "$REPO_EARLY" log --format=%H -- src/main build.sbt | tr '\n' ',')" <<'PYEOF'
import json, sys
rec = json.load(open(sys.argv[1]))
head_last = sys.argv[2]
all_commits = [c for c in sys.argv[3].split(",") if c]
rc = rec["commit"]
covered = {c for adj in rec.get("adjudications", []) for c in adj["commits"]}
if rc not in all_commits:
    print(f"[check] FAIL: record commit {rc[:9]} is not an ancestor "
          "src/main commit of HEAD"); sys.exit(1)
later = all_commits[:all_commits.index(rc)]  # newest-first listing
missing = [c for c in later if c not in covered]
if missing:
    print("[check] FAIL: src/main commits after the record commit lack "
          "adjudication coverage: " + ", ".join(c[:9] for c in missing))
    sys.exit(1)
print(f"[check] PASS: record commit {rc[:9]}"
      + (f" + {len(covered)} adjudicated commit(s)" if covered else
         " is the last src/main commit"))
PYEOF
  exit $?
fi

if [ "${1:-}" = "--adjudicate" ]; then
  RECORD="${2:?usage: tools/bench_quiet.sh --adjudicate <record.json> <to_commit> <q1,q2,..>}"
  TO_COMMIT="$(git -C "$(cd "$(dirname "$0")/.." && pwd)" rev-parse "${3:?to_commit required}")"
  AFFECTED="${4:?comma-separated affected query list, or \"none\" for a coverage-only stamp}"
  SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
  CPUS="${SPARK_GRAFT_CPUS:-32}"
  if [ -n "$(git -C "$REPO_EARLY" status --porcelain -- src/main build.sbt)" ]; then
    echo "[adjudicate] REFUSING: src/main has uncommitted changes" >&2
    exit 1
  fi
  # AFFECTED="none" stamps COVERAGE for commits whose diff provably
  # touches no bench query's plan (the caller proves it by grep) —
  # no re-measure, just the auditable commit list in the record
  if [ "$AFFECTED" = "none" ]; then
    RANGE_COMMITS="$(git -C "$REPO_EARLY" log --format=%H \
      "$(python3 -c "import json,sys;print(json.load(open('$RECORD'))['commit'])")".."$TO_COMMIT" \
      -- src/main build.sbt | tr '\n' ',')"
    python3 - "$RECORD" "$TO_COMMIT" "$RANGE_COMMITS" <<'PYEOF2'
import json, sys, time
record_path, to_commit, range_csv = sys.argv[1:4]
commits = [c for c in range_csv.split(",") if c]
rec = json.load(open(record_path))
rec.setdefault("adjudications", []).append({
    "to_commit": to_commit,
    "commits": commits,
    "affected": [],
    "old": {}, "new": {},
    "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "methodology": ("no-op coverage stamp: the range's diff touches no "
                    "bench query's plan (caller-proven affected set is "
                    "empty); no rows re-measured"),
})
json.dump(rec, open(record_path, "w"))
print(f"[adjudicate] stamped {record_path}: empty affected set, "
      f"covers {len(commits)} commit(s)")
PYEOF2
    exit 0
  fi
  ADJ_DIR="/tmp/graft_quiet_adj"
  rm -rf "$ADJ_DIR"
  git -C "$REPO_EARLY" worktree prune
  git -C "$REPO_EARLY" worktree add --detach "$ADJ_DIR" "$TO_COMMIT" >&2
  echo "[adjudicate] building $TO_COMMIT" >&2
  (cd "$ADJ_DIR" && sbt -batch compile >/dev/null 2>&1)
  # RUNS=3 (per-query median), not the record's RUNS=1: a record row
  # is a single run inside a FULL-suite pass whose 270 preceding
  # queries have the JVM hot, while a scoped pass runs the affected
  # queries cold — the median of 3 in-JVM runs discards the cold
  # first run and restores hot-core conditions (measured: q220 cold
  # single-run 2.09s vs hot ~1.2s, the full-pass value)
  for i in 1 2 3 4; do
    echo "[adjudicate] pass $i/4: $AFFECTED" >&2
    (cd "$ADJ_DIR" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
      SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_TRANSFER=0 \
      sbt -batch "runMain graft.Bench $AFFECTED" >/dev/null 2>&1)
    cp "$ADJ_DIR/target/bench.json" "/tmp/adj_pass_$i.json"
  done
  RANGE_COMMITS="$(git -C "$REPO_EARLY" log --format=%H \
    "$(python3 -c "import json,sys;print(json.load(open('$RECORD'))['commit'])")".."$TO_COMMIT" \
    -- src/main build.sbt | tr '\n' ',')"
  python3 - "$RECORD" "$TO_COMMIT" "$AFFECTED" "$RANGE_COMMITS" <<'PYEOF'
import json, sys, time
record_path, to_commit, affected_csv, range_csv = sys.argv[1:5]
affected = affected_csv.split(",")
commits = [c for c in range_csv.split(",") if c]
rec = json.load(open(record_path))
passes = [json.load(open(f"/tmp/adj_pass_{i}.json")) for i in (1, 2, 3, 4)]
new = {q: round(min(p["queries"][q] for p in passes), 3) for q in affected}
old = {q: rec["queries"][q] for q in affected}
rec["queries"].update(new)
rec["value"] = round(sum(rec["queries"].values()), 3)
rec.setdefault("adjudications", []).append({
    "to_commit": to_commit,
    "commits": commits,
    "affected": affected,
    "old": old,
    "new": new,
    "passes": [{q: round(p["queries"][q], 3) for q in affected}
               for p in passes],
    "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "methodology": ("scoped re-measure at to_commit: per-query MIN "
                    "across four passes of SPARK_GRAFT_BENCH_RUNS=3 "
                    "medians (the in-JVM median discards the cold "
                    "first run, restoring the full-pass hot-core "
                    "conditions record rows are measured under)"),
})
json.dump(rec, open(record_path, "w"))
print(f"[adjudicate] patched {record_path}: " +
      ", ".join(f"{q} {old[q]}->{new[q]}s" for q in affected) +
      f"; covers {len(commits)} commit(s); new total {rec['value']}s")
PYEOF
  git -C "$REPO_EARLY" worktree remove --force "$ADJ_DIR" || true
  exit 0
fi

OUT="${1:?usage: tools/bench_quiet.sh <out.json> [prev_commit] [prev_record.json]}"
PREV_COMMIT="${2:-}"
PREV_RECORD="${3:-}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# 11 heavy + 3 SHORT queries (round-15 verdict directive 1): a single
# scalar coefficient cannot carry an ADDITIVE box shift (r15: heavies
# 0.90x, shorts 1.5x+) -- the short points anchor the intercept of the
# two-parameter fit t_now ~ a + b*t_prev.
CAL_QUERIES="q256_ols_influence,q195_spearman,q85_kmeans_lloyd,q247_jackknife_ratio,q150_blocked_er,q129_winnow_candidates,q253_kcore,q147_equidepth_histogram,q55_langid_ngram,q146_cluster_canonical,q158_mad_outliers,q36_metadata_strip,q34_jq_project,q15_having"

run_bench() { # repo_dir runs filter -> writes target/bench.json in repo_dir
  local dir="$1" runs="$2" filter="${3:-}"
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_RUNS="$runs" SPARK_GRAFT_BENCH_TRANSFER="${4:-1}" \
    sbt -batch "runMain graft.Bench $filter" >/dev/null 2>&1)
}

# Round-15 verdict directive 3: the record must be cut AT the round's
# final perf-relevant commit -- refuse to run over uncommitted source,
# and stamp the commit into the record so staleness is checkable.
if [ -n "$(git -C "$REPO" status --porcelain -- src/main build.sbt)" ]; then
  echo "[quiet] REFUSING to cut a record: src/main has uncommitted changes -- commit first" >&2
  exit 1
fi
# stamp the last PERF-RELEVANT commit (doc-only commits after the code
# freeze don't change what was measured)
HEAD_COMMIT="$(git -C "$REPO" log -1 --format=%H -- src/main build.sbt)"

echo "[quiet] building HEAD" >&2
(cd "$REPO" && sbt -batch compile >/dev/null 2>&1)

PREV_DIR=""
if [ -n "$PREV_COMMIT" ]; then
  PREV_DIR="/tmp/graft_quiet_prev"
  rm -rf "$PREV_DIR"
  git -C "$REPO" worktree prune
  git -C "$REPO" worktree add --detach "$PREV_DIR" "$PREV_COMMIT" >&2
  echo "[quiet] building prev ($PREV_COMMIT)" >&2
  (cd "$PREV_DIR" && sbt -batch compile >/dev/null 2>&1)
fi

# ---- full passes with calibration passes INTERLEAVED BETWEEN them ----
# The calibration coefficient must measure the SAME box window as the
# full passes it normalizes: the first r15 cuts ran calibration as a
# prologue, and a 10-20% hour-scale window shift between the prologue
# and the full passes produced a coefficient that normalized nothing.
# Order: cal1(head,prev), full1, full2, cal2(head,prev), full3, full4.
# ALTERNATE which side runs first between calibration passes
# (round-18 lesson: on an oscillating box, a fixed head-first order
# phase-correlates one side with the slow sub-windows — q195 read a
# consistent 1.34x across two head-first pairs and inverted to 0.85x
# once prev-first pairs were added)
cal_pass() { # n
  if [ -n "$PREV_COMMIT" ]; then
    if [ $(( $1 % 2 )) -eq 1 ]; then
      echo "[quiet] calibration pass $1: HEAD" >&2
      run_bench "$REPO" 3 "$CAL_QUERIES" 0
      cp "$REPO/target/bench.json" "/tmp/cal_head_$1.json"
      echo "[quiet] calibration pass $1: prev" >&2
      run_bench "$PREV_DIR" 3 "$CAL_QUERIES" 0
      cp "$PREV_DIR/target/bench.json" "/tmp/cal_prev_$1.json"
    else
      echo "[quiet] calibration pass $1: prev (alternated order)" >&2
      run_bench "$PREV_DIR" 3 "$CAL_QUERIES" 0
      cp "$PREV_DIR/target/bench.json" "/tmp/cal_prev_$1.json"
      echo "[quiet] calibration pass $1: HEAD" >&2
      run_bench "$REPO" 3 "$CAL_QUERIES" 0
      cp "$REPO/target/bench.json" "/tmp/cal_head_$1.json"
    fi
  fi
}
full_pass() { # n
  echo "[quiet] full pass $1/4" >&2
  run_bench "$REPO" 1 "" 1
  cp "$REPO/target/bench.json" "/tmp/quiet_pass_$1.json"
}
cal_pass 1
full_pass 1
full_pass 2
cal_pass 2
full_pass 3
full_pass 4

python3 - "$OUT" "$PREV_COMMIT" "$PREV_RECORD" "$CAL_QUERIES" "$HEAD_COMMIT" <<'EOF' >&2
import json, sys

out, prev_commit, prev_record, cal_qs, head_commit = sys.argv[1:6]
cal_list = cal_qs.split(",")

passes = [json.load(open(f"/tmp/quiet_pass_{i}.json")) for i in (1, 2, 3, 4)]
names = sorted(passes[0]["queries"])
qmin = {q: round(min(p["queries"][q] for p in passes), 3) for q in names}
pass_totals = [round(sum(p["queries"].values()), 3) for p in passes]

rec = {
    "metric": "bench_quiet_min",
    "commit": head_commit,
    "value": round(sum(qmin.values()), 3),
    "unit": "sec",
    "sf": passes[0]["sf"],
    "n_queries": len(names),
    "passes": pass_totals,
    "methodology": ("per-query MIN across four full-suite passes "
                    "(SPARK_GRAFT_BENCH_RUNS=1 each) via tools/bench_quiet.sh"),
    "queries": qmin,
}
for k in ("grouped", "archive", "render", "hatch", "httpsink", "xlsx", "multisink", "transfer"):
    if k in passes[0]:
        # archive reports zip_sec+tgz_sec instead of a single sec
        def cost(p, k=k):
            b = p[k]
            return b.get("sec", b.get("zip_sec", 0) + b.get("tgz_sec", 0))
        rec[k] = min(passes, key=cost)[k]

if prev_commit:
    heads = [json.load(open(f"/tmp/cal_head_{i}.json")) for i in (1, 2)]
    prevs = [json.load(open(f"/tmp/cal_prev_{i}.json")) for i in (1, 2)]
    hmin = {q: min(h["queries"][q] for h in heads) for q in cal_list}
    pmin = {q: min(p["queries"][q] for p in prevs) for q in cal_list}
    cal = {
        "prev_commit": prev_commit,
        "queries": cal_list,
        "head_pass_totals": [round(sum(h["queries"].values()), 3) for h in heads],
        "prev_pass_totals": [round(sum(p["queries"].values()), 3) for p in prevs],
        "head_now_total": round(sum(hmin.values()), 3),
        "prev_now_total": round(sum(pmin.values()), 3),
        "head_now_queries": {q: round(hmin[q], 3) for q in cal_list},
        "prev_now_queries": {q: round(pmin[q], 3) for q in cal_list},
    }
    if prev_record:
        pr = json.load(open(prev_record))
        pts = [(pr["queries"][q], pmin[q]) for q in cal_list
               if q in pr["queries"]]
        prt = round(sum(x for x, _ in pts), 3)
        cal["prev_record_total"] = prt
        cal["drift_coefficient"] = round(cal["prev_now_total"] / prt, 4)
        # two-parameter drift model (round-15 verdict directive 1):
        # least-squares t_now ~ a + b*t_prev over the 14 calibration
        # points -- same-code A/B, so the fit is pure box. The scalar
        # coefficient is kept for continuity but under-fits additive
        # shifts (r15: fixed +0.1-0.7s/query made shorts look 1.9x).
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        var = sum((x - mx) ** 2 for x, _ in pts)
        cov = sum((x - mx) * (y - my) for x, y in pts)
        b = cov / var if var > 0 else 1.0
        a = my - b * mx
        cal["drift_slope"] = round(b, 4)
        cal["drift_intercept"] = round(a, 4)
    rec["calibration"] = cal

json.dump(rec, open(out, "w"))
print(f"[quiet] wrote {out}: total={rec['value']}s"
      + (f" drift={rec['calibration'].get('drift_coefficient')}" if prev_commit and prev_record else ""))
EOF

if [ -n "$PREV_DIR" ]; then
  git -C "$REPO" worktree remove --force "$PREV_DIR" || true
fi
