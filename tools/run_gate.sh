#!/usr/bin/env bash
# One-command local gate: tests + correctness (DuckDB oracle) + bench smoke.
# Usage: tools/run_gate.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"

echo "== sbt test =="
sbt test 2>&1 | grep -E "Tests: |All tests" || { echo "TESTS FAILED"; exit 1; }

echo "== Verify @$SF =="
sbt "runMain graft.Verify $SF target/verify_out" > /tmp/graft_verify.log 2>&1
grep "\[verify\]" /tmp/graft_verify.log || true
python3 tools/check_oracle.py "$SF" target/verify_out

echo "== Bench smoke @sf0.001 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"'

echo "== Per-query regression vs last recorded canonical =="
# BENCH_LAST.json is rewritten by each full sf0.1 bench run; compare the
# working copy against the last committed canonical and flag >2x moves.
# Both sides must be FULL canonicals (n >= 200 queries): a scratch
# single-query artifact must never masquerade as the baseline (VERDICT
# r13 item 3), and a >2x regression FAILS the gate (ADVICE r13 item 1 —
# a stale working copy is a reason to re-bench, not to ship a regression).
if git show HEAD:BENCH_LAST.json > /tmp/bench_prev.json 2>/dev/null \
   && [ -f BENCH_LAST.json ]; then
  for f in BENCH_LAST.json /tmp/bench_prev.json; do
    n=$(python3 -c "import json,sys; print(len(json.load(open(sys.argv[1])).get('queries',{})))" "$f")
    if [ "$n" -lt 200 ]; then
      echo "refusing regression compare: $f has only $n queries (need >= 200 — not a full canonical)"
      exit 1
    fi
  done
  python3 tools/bench_regression.py BENCH_LAST.json /tmp/bench_prev.json
else
  echo "skipped (no committed BENCH_LAST.json to compare against)"
fi
