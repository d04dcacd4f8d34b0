#!/usr/bin/env bash
# Three-scale-factor correctness gate (r16 verdict #8): run graft.Verify +
# the DuckDB comparator at sf0.001, sf0.01, and sf0.1 in one command — the
# strongest correctness evidence the project produces (scale-dependent
# rounding/tie divergence has no place to hide). Run from the repo root at
# close of round; every SF must end "0 bad".
#
# r17 advice hardening: the gate runs Verify with the narrowing env vars
# UNSET and asserts Verify's own "dumped N/N" summary, so a leftover
# iteration filter or a partially-failed dump can never read as a pass
# over a shrunken query set.
#
# Usage: tools/gate3sf.sh   (expects target/scala-2.13/*.jar — run
#        `sbt package` first)
set -u
cd "$(dirname "$0")/.."
JAR_CP="target/scala-2.13/*:/opt/spark/jars/*"
fail=0
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/gate3sf_$sf"
  echo "=== $sf ==="
  vlog="$(env -u SPARK_GRAFT_ONLY -u SPARK_GRAFT_VERIFY_ONLY \
    java -cp "$JAR_CP" graft.Verify "/root/testdata/$sf" "$out" 2>&1)"
  vrc=$?
  echo "$vlog" | grep '\[verify\]' || true
  # Verify self-reports "dumped N/M query results (registry R, ...)";
  # assert N == M == R and a zero exit, else the dump was narrowed or
  # partially failed and the comparator below would run on a subset.
  summary="$(echo "$vlog" | grep -o 'dumped [0-9]*/[0-9]* query results (registry [0-9]*' | tail -1)"
  n="$(echo "$summary" | sed -E 's|dumped ([0-9]*)/.*|\1|')"
  m="$(echo "$summary" | sed -E 's|dumped [0-9]*/([0-9]*) .*|\1|')"
  r="$(echo "$summary" | sed -E 's|.*registry ([0-9]*)|\1|')"
  if [ "$vrc" -ne 0 ] || [ -z "$n" ] || [ "$n" != "$m" ] || [ "$n" != "$r" ]; then
    echo "GATE FAILED at $sf: verify dump incomplete (rc=$vrc, $summary)"
    fail=1
    continue
  fi
  res="$(python3 tools/compare.py "/root/testdata/$sf" "$out")"
  echo "$res" | grep -Ev '^(OK|PIN) ' | tail -6
  # r19: every no-oracle query must match its committed golden pin
  # (tools/golden_pins.json) — "rows-only" now means UNPINNED and fails
  # the gate, so a new no-oracle query forces a deliberate pin_golden run
  # and a semantic drift in a pinned one reads as bad, not as a pass.
  echo "$res" | grep -q ' 0 rows-only, 0 bad,' \
    || { echo "GATE FAILED at $sf"; fail=1; }
done
exit $fail
