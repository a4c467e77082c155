#!/usr/bin/env bash
# Pre-commit / pre-snapshot guard (r12 lesson: the round's final commit
# shipped a loader change without re-running the suite and broke one
# plan-shape assertion — "sbt test green" is the bar, so enforce it).
#
# Usage:
#   scripts/preflight.sh                 # full gate: compile + full suite
#   scripts/preflight.sh graft.FooSpec   # fast gate: compile + named suites
#
# Rule of thumb: run the fast gate (suites touching your diff) before
# every commit; run the FULL gate before any end-of-round snapshot or
# any commit that touches loaders/plans shared across queries.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "$#" -gt 0 ]; then
  suites="$*"
  echo "== preflight (fast): compile + testOnly $suites"
  sbt -batch "Test/compile" "testOnly $suites"
else
  echo "== preflight (full): compile + full suite"
  sbt -batch "Test/compile" test
fi
echo "== preflight OK"
