#!/usr/bin/env bash
# Run the benchmark and guarantee the machine-readable record is the
# FINAL stdout line, whatever sbt prints: all sbt/Spark output goes to
# stderr, then the bench's own bench_out.json (written by graft.Bench
# before it exits) is cat'ed as the only stdout content.
#
# Usage: scripts/bench.sh   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
#        SPARK_GRAFT_BENCH_ROUNDS, SPARK_GRAFT_BENCH_ONLY/SKIP,
#        SPARK_DRIVER_MEM, SPARK_GRAFT_BENCH_OUT,
#        SPARK_GRAFT_BENCH_REQUIRE_QUIET, SPARK_GRAFT_BENCH_MAX_LOAD)
#
# Quiet-box guard (r12 VERDICT #4: a committed strike carried a uniform
# ~1.15x box-pressure drift that cost a round of analysis): graft.Bench
# ALWAYS stamps loadavg + foreign-JVM counts into the JSON ("load":
# {...,"quiet":bool}); with SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 this
# script additionally REFUSES to strike when another java process is
# running or 1-min loadavg exceeds SPARK_GRAFT_BENCH_MAX_LOAD
# (default 4.0) — for the final committed artifacts, not exploratory
# runs.
set -u
cd "$(dirname "$0")/.."
out="${SPARK_GRAFT_BENCH_OUT:-bench_out.json}"

if [ "${SPARK_GRAFT_BENCH_REQUIRE_QUIET:-0}" = "1" ]; then
  max_load="${SPARK_GRAFT_BENCH_MAX_LOAD:-4.0}"
  load1="$(cut -d' ' -f1 /proc/loadavg 2>/dev/null || echo -1)"
  jvms="$(pgrep -c -f java 2>/dev/null || echo 0)"
  busy="$(awk -v l="$load1" -v m="$max_load" 'BEGIN{print (l>m)?1:0}')"
  if [ "$jvms" -gt 0 ] || [ "$busy" = "1" ]; then
    echo "[bench] REFUSING to strike: box not quiet (loadavg1=$load1, java procs=$jvms, max_load=$max_load)" >&2
    echo '{"metric":"total","value":null,"error":"quiet-box guard: loadavg1='"$load1"' java_procs='"$jvms"'"}'
    exit 1
  fi
fi

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
