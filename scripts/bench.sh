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

# The stale file is removed BEFORE the guard so a refusal can never
# leave a previous strike's artifact in place for an unconditional
# downstream `cp` to promote (the r14 chain bug: BENCH_LOCAL.json
# ended up a byte-copy of the x10 BENCH_sf1.json).
rm -f "$out" "$out.short"

if [ "${SPARK_GRAFT_BENCH_REQUIRE_QUIET:-0}" = "1" ]; then
  max_load="${SPARK_GRAFT_BENCH_MAX_LOAD:-4.0}"
  # Bounded wait-until-quiet loop (r14 VERDICT task 1c): poll every
  # 15 s up to SPARK_GRAFT_BENCH_WAIT_QUIET seconds (default 0 = one
  # immediate check) so a guarded strike at the end of a loaded round
  # RUNS instead of being skipped.
  wait_budget="${SPARK_GRAFT_BENCH_WAIT_QUIET:-0}"
  waited=0
  while :; do
    load1="$(cut -d' ' -f1 /proc/loadavg 2>/dev/null || echo -1)"
    # pgrep -c prints "0" AND exits 1 on no match — an `|| echo 0`
    # fallback would yield "0\n0" and break the numeric test.
    jvms="$(pgrep -c -f java 2>/dev/null | head -1)"
    jvms="${jvms:-0}"
    busy="$(awk -v l="$load1" -v m="$max_load" 'BEGIN{print (l>m)?1:0}')"
    if [ "$jvms" -eq 0 ] && [ "$busy" != "1" ]; then break; fi
    if [ "$waited" -ge "$wait_budget" ]; then
      echo "[bench] REFUSING to strike: box not quiet after ${waited}s (loadavg1=$load1, java procs=$jvms, max_load=$max_load)" >&2
      # Write the refusal INTO the artifact so any downstream cp
      # promotes an explicit refusal record, never stale numbers.
      echo '{"metric":"total","value":null,"error":"quiet-box guard: loadavg1='"$load1"' java_procs='"$jvms"' waited='"$waited"'s"}' | tee "$out"
      exit 1
    fi
    echo "[bench] waiting for quiet box (loadavg1=$load1, java procs=$jvms; ${waited}/${wait_budget}s)" >&2
    sleep 15
    waited=$((waited + 15))
  done
  # Hand the guard's passing reading to graft.Bench: its own start
  # sample lands after the sbt/JVM launch spike, so a borderline box
  # would stamp quiet:false despite the guard having seen it idle.
  export SPARK_GRAFT_BENCH_GUARD_LOAD="$load1"
fi
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
