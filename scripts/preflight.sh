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

# Both gates verify tests actually RAN (r13 ADVICE: `testOnly` with a
# misspelled suite matches zero tests and sbt exits 0 — the exact
# failure mode this script exists to prevent). ScalaTest prints one
# "Total number of tests run: N" summary per test run; require N > 0.
out="$(mktemp)"
trap 'rm -f "$out"' EXIT

if [ "$#" -gt 0 ]; then
  suites="$*"
  echo "== preflight (fast): compile + testOnly $suites"
  sbt -batch "Test/compile" "testOnly $suites" | tee "$out"
else
  echo "== preflight (full): compile + full suite"
  sbt -batch "Test/compile" test | tee "$out"
fi

# `|| true`: when the summary line is absent entirely (testOnly matched
# zero suites and ScalaTest never ran), grep exits 1 and, under `set -e`,
# would abort this assignment before the diagnostic below could print
# (r14 ADVICE) — the gate must fail closed WITH its message
total=$( { grep -oE 'Total number of tests run: [0-9]+' "$out" || true; } \
  | awk '{s += $NF} END {print s + 0}')
if [ "$total" -eq 0 ]; then
  echo "== preflight FAILED: 0 tests executed (suite name typo? nothing matched)" >&2
  exit 1
fi
echo "== preflight OK ($total tests ran)"
