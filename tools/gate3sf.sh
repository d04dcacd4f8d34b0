#!/usr/bin/env bash
# Three-scale-factor correctness gate (r16 verdict #8): run graft.Verify +
# the DuckDB comparator at sf0.001, sf0.01, and sf0.1 in one command — the
# strongest correctness evidence the project produces (scale-dependent
# rounding/tie divergence has no place to hide). Run from the repo root at
# close of round; every SF must end "0 bad".
#
# Usage: tools/gate3sf.sh   (expects target/scala-2.13/*.jar — run
#        `sbt package` first; SPARK_GRAFT_ONLY narrows for iteration)
set -u
cd "$(dirname "$0")/.."
JAR_CP="target/scala-2.13/*:/opt/spark/jars/*"
fail=0
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/gate3sf_$sf"
  echo "=== $sf ==="
  java -cp "$JAR_CP" graft.Verify "/root/testdata/$sf" "$out" 2>&1 \
    | grep '\[verify\]' || true
  res="$(python3 tools/compare.py "/root/testdata/$sf" "$out")"
  echo "$res" | grep -Ev '^OK ' | tail -6
  echo "$res" | grep -q ' 0 bad,' || { echo "GATE FAILED at $sf"; fail=1; }
done
exit $fail
