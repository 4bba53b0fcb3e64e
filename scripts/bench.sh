#!/usr/bin/env bash
# Run the benchmark and guarantee the machine-readable record is the
# FINAL stdout line, whatever sbt prints: all sbt/Spark output goes to
# stderr, then the bench's own bench_out.json (written by graft.Bench
# before it exits) is cat'ed as the only stdout content.
#
# Usage: scripts/bench.sh   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
#        SPARK_GRAFT_BENCH_ROUNDS, SPARK_GRAFT_BENCH_ONLY/SKIP,
#        SPARK_DRIVER_MEM, SPARK_GRAFT_BENCH_OUT)
set -u
cd "$(dirname "$0")/.."
out="${SPARK_GRAFT_BENCH_OUT:-bench_out.json}"
rm -f "$out"
sbt -batch "runMain graft.Bench" 1>&2
rc=$?
if [ -f "$out" ]; then
  # Full per-query record first, then the SHORT headline line LAST —
  # the driver tail-parses the final stdout line and its window can't
  # hold the ~100-entry full line.
  cat "$out"
  [ -f "$out.short" ] && cat "$out.short"
else
  echo '{"metric":"total","value":null,"error":"bench produced no '"$out"'"}'
  rc=1
fi
exit $rc
