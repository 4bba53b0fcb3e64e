#!/usr/bin/env bash
# Round-13 end-of-round measurement chain — ONE sequential quiet-box
# run (the §9.11/§9.12 artifact-coherence rule): fresh full Verify,
# the IVF centroid-SIZING sweep (r12 weak row: sqrt-n vs n/512 vs
# n/256 at sf0.1/x10/x64), the SQ8 pool recall curve, the x64
# dedup/ANN family (struck TWICE for cross-strike envelopes, now incl.
# the persisted-code SQ8 rows and the clean+serve closure), the x10
# full suite, and the final quiet-guarded full-suite sf0.1 strike that
# bench_out.json points at.
#
# Assumes target/scale_x10 and target/scale_x64 exist
# (graft.ScaleUp /root/testdata/sf0.1 target/scale_xN N).
set -ux
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=24g
log() { echo "=== [$(date +%H:%M:%S)] $*" >&2; }

log "0. fresh full Verify at sf0.01"
rm -rf /tmp/verify_r13_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r13_final" 1>&2
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_r13_final | tail -3

if [ "${SKIP_SWEEPS:-0}" != "1" ]; then
  log "1. IVF pair-route centroid-sizing sweep (sf0.1 + x10, then x64 in its own invocation)"
  SPARK_GRAFT_IVF_RECALL_OUT=BENCH_embed_ivf.json \
    sbt -batch "runMain graft.EmbedIvfRecall /root/testdata/sf0.1 target/scale_x10" 1>&2
  SPARK_GRAFT_IVF_RECALL_OUT=BENCH_embed_ivf_x64.json \
    sbt -batch "runMain graft.EmbedIvfRecall target/scale_x64" 1>&2 \
    || log "x64 sizing sweep failed (artifact keeps sf0.1/x10)"

  log "2. SQ8 pool recall curve (sf0.1 + x64)"
  SPARK_GRAFT_SQ8_OUT=BENCH_sq8.json \
    sbt -batch "runMain graft.Sq8PoolSweep /root/testdata/sf0.1 target/scale_x64" 1>&2 \
    || log "sq8 sweep failed"
else
  log "1-2. sweeps skipped (SKIP_SWEEPS=1 — already struck standalone this round)"
fi

X64_FAMILY="d_exact_dedup,ann_pq,ann_ivf_pq,d_minhash_lsh,d_incr_neardup,d_incr_indexed,d_embed_incr_indexed,d_simhash,d_simhash_pairs,d_embed_lsh_pairs,d_embed_lsh_multiprobe,d_neardup_clusters,d_embed_clusters,d_cluster_keep_best,v_quantize,ann_bruteforce,ann_ivf,ann_lsh,ann_sq8,ann_ivf_sq8,ann_ivf_retrain,ann_ivf_fitstats,t_span_dedup,pipe_corpus_clean,pipe_incr_clean,pipe_incr_clean_embed,pipe_incr_evolve,pipe_incr_evolve_embed,pipe_incr_evolve_serve,pipe_incr_clean_serve"
log "3a. x64 dedup/ANN family strike 1"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike1.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup.json
log "3b. x64 family strike 2 (cross-strike envelope)"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike2.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup_strike2.json

log "4. x10 full suite (skip contract: O(n^2)-class verifiers)"
SPARK_GRAFT_SF_DIR=target/scale_x10 \
  SPARK_GRAFT_BENCH_SKIP="d_ngram_jaccard,d_embed_neardup,d_embed_neardup_ivf" \
  scripts/bench.sh > /tmp/x10_full.json 2>/dev/null || true
cp bench_out.json BENCH_sf1.json

log "5. FINAL full-suite sf0.1 strike (quiet-guarded; bench_out.json = this one)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 \
  scripts/bench.sh > /tmp/sf01_full.json 2>/dev/null || true
cp bench_out.json BENCH_LOCAL.json

log "chain done"
