#!/bin/bash
# Scale-regression gate (r13 verdict task 3): measure sf0.1 -> sf1
# exponents on the enrolled rows and fail on any exponent above its
# committed ceiling + margin (tools/exponent_ceilings.json).
#
# One command, opt-in (not part of sbt test): run from the repo root
# after any change that touches a pair generator, a join key, or a
# memo build. ~6-8 min wall clock at REPS=1 (default; set
# SPARK_GRAFT_GATE_REPS=2 for a min-over-2 reading when a breach needs
# confirming — single-pass noise on this box can reach ±0.18 exponent,
# which is why the margin exists).
#
# Requires the GenSf sf1 set at /tmp/graft_sf1 (or $1):
#   env SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.GenSf /root/testdata/sf0.1 /tmp/graft_sf1 10"
set -euo pipefail
cd "$(dirname "$0")/.."
SF1=${1:-/tmp/graft_sf1}
REPS=${SPARK_GRAFT_GATE_REPS:-1}
if [ ! -d "$SF1" ]; then
  echo "[gate] sf1 rehearsal set missing at $SF1 — regenerate with:" >&2
  echo "  env SPARK_GRAFT_CPUS=16 sbt 'runMain graft.tools.GenSf /root/testdata/sf0.1 $SF1 10'" >&2
  exit 2
fi
ONLY=$(python3 -c "
import json
q = json.load(open('tools/exponent_ceilings.json'))['queries']
print(','.join(sorted(n for n in q if not n.startswith('memo_build:'))))")
LO=/tmp/gate_sf01.json
HI=/tmp/gate_sf1.json
rm -f "$LO" "$HI"
# r14 ADVICE: keep each pass's sbt output in a log and surface its tail
# on failure — under `set -e` a compile error or sf1 OOM used to abort
# the gate with no diagnostics at all.
run_pass() { # $1 = log file; rest = env assignments
  local log=$1; shift
  if ! env "$@" sbt -batch "runMain graft.Bench" >"$log" 2>&1; then
    echo "[gate] PASS FAILED — tail of $log:" >&2
    tail -n 25 "$log" >&2
    exit 1
  fi
}
echo "[gate] pass 1/2: sf0.1 ($(echo "$ONLY" | tr ',' '\n' | wc -l) rows, REPS=$REPS)"
run_pass /tmp/gate_sf01.log SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_REPS="$REPS" \
    SPARK_GRAFT_BENCH_OUT="$LO"
echo "[gate] pass 2/2: sf1"
run_pass /tmp/gate_sf1.log SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_REPS="$REPS" \
    SPARK_GRAFT_BENCH_OUT="$HI"
python3 tools/scale_exponents.py "$LO" "$HI" --gate tools/exponent_ceilings.json
