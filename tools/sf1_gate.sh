#!/bin/bash
# One-command sf1 (10x) oracle gate — the standing rule from the
# round-13 verdict: every query whose operator or oracle changed in a
# round re-proves against the 10x corpus (scale-dependent parity
# flips and row-loss bugs are invisible at the driver's sf0.01 gate;
# the round-13 full run found seven real defects).
#
# Usage:
#   tools/sf1_gate.sh              # full 278-query gate (~25 min)
#   tools/sf1_gate.sh q1,q2,...    # diff-scoped
#
# The sf1 corpus rebuilds automatically when missing or older than
# the driver's sf0.1 testdata (the driver regenerates testdata per
# round). The three nation-graph oracles (q126/q186/q252) OOM DuckDB
# unstaged at sf1, so the full gate routes them through the staged
# runner; a diff-scoped run that names them does too.
set -euo pipefail
cd "$(dirname "$0")/.."
ONLY="${1:-}"
GRAPH_QS="q126_triangle_count q186_label_propagation q252_hits"

sbt -batch compile >/dev/null

if [ ! -d target/sf1 ] || \
   [ /root/testdata/sf0.1/documents.parquet -nt target/sf1/documents.parquet ]; then
  echo "== rebuilding target/sf1 (10x of sf0.1)"
  ADD_OPENS=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
           java.nio java.util java.util.concurrent java.util.concurrent.atomic \
           sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
  done
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx48g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.ScaleUp /root/testdata/sf0.1 "$PWD/target/sf1" 10
fi

OUT="${SF1_GATE_OUT:-/tmp/verify_sf1_gate}"
echo "== Verify -> $OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-24}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
  sbt -batch "runMain graft.Verify $PWD/target/sf1 $OUT ${ONLY:+$ONLY}" \
  | grep -E "\[verify\]|error\]" || true

# split the query set: graph queries go through the staged runner
if [ -n "$ONLY" ]; then
  REQUESTED="${ONLY//,/ }"
else
  REQUESTED=$(python3 -c "
import json
print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
fi
PLAIN=""; GRAPH=""
for q in $REQUESTED; do
  case " $GRAPH_QS " in
    *" $q "*) GRAPH="$GRAPH,$q" ;;
    *) PLAIN="$PLAIN,$q" ;;
  esac
done
PLAIN="${PLAIN#,}"; GRAPH="${GRAPH#,}"

RC=0
if [ -n "$PLAIN" ]; then
  echo "== check.py ($(echo "$PLAIN" | tr ',' '\n' | wc -l) queries)"
  CHECK_MEM="${CHECK_MEM:-60GB}" CHECK_TMP="${CHECK_TMP:-/tmp/ducktmp}" \
    python3 tools/check.py "$PWD/target/sf1" "$OUT" "$PLAIN" || RC=1
fi
if [ -n "$GRAPH" ]; then
  echo "== staged graph oracles ($GRAPH)"
  # the runner exits nonzero on any FAIL; || RC=1 records it without
  # aborting the gate mid-report (set -e + pipefail otherwise would)
  CHECK_MEM="${CHECK_MEM:-60GB}" \
    python3 tools/graph_oracles_sf1.py "$PWD/target/sf1" "$OUT" \
    $(echo "$GRAPH" | tr ',' ' ') | tee /tmp/sf1_graph_gate.log || RC=1
  grep -q "FAIL" /tmp/sf1_graph_gate.log && RC=1
fi
exit $RC
