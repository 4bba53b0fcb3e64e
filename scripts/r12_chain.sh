#!/usr/bin/env bash
# Round-12 end-of-round measurement chain — ONE sequential quiet-box
# run (the §9.11/§9.12 artifact-coherence rule): fresh full Verify,
# seeded ×64 near-dup corpus, embedding knee + IVF-route recall,
# evolve/append write-path probe, ×64 dedup family (struck TWICE for
# cross-strike envelopes), ×10 full suite, and the final full-suite
# sf0.1 strike that bench_out.json points at.
set -ux
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=24g
log() { echo "=== [$(date +%H:%M:%S)] $*" >&2; }

log "0. fresh full Verify at sf0.01"
rm -rf /tmp/verify_r12_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r12_final" 1>&2
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_r12_final | tail -3

log "1. seed the x64 near-dup corpus"
sbt -batch "runMain graft.NearDupSeed target/scale_x64 target/knee_neardup_x64" 1>&2

log "2. embedding sign-band knee (all dirs incl. seeded x64)"
SPARK_GRAFT_KNEE_TRUTH_MAX=260000 \
  sbt -batch "runMain graft.EmbedBandKnee /root/testdata/sf0.1 target/knee_neardup target/scale_x10 target/scale_x64 target/knee_neardup_x64" 1>&2

log "3a. IVF pair-route recall at sf0.1 + x10"
SPARK_GRAFT_IVF_RECALL_OUT=BENCH_embed_ivf.json \
  sbt -batch "runMain graft.EmbedIvfRecall /root/testdata/sf0.1 target/scale_x10" 1>&2
log "3b. IVF pair-route recall at x64 (own invocation: survives a blowup)"
SPARK_GRAFT_IVF_RECALL_OUT=BENCH_embed_ivf_x64.json \
  sbt -batch "runMain graft.EmbedIvfRecall target/scale_x64" 1>&2 || log "x64 recall run failed (artifact keeps sf0.1/x10)"

log "4. evolve K-curve + append write path at x64 (embed append shave check)"
SPARK_GRAFT_SF_DIR=target/scale_x64 \
  sbt -batch "runMain graft.queries.EvolveProbe" 1>&2

X64_FAMILY="d_exact_dedup,d_minhash_lsh,d_incr_neardup,d_incr_indexed,d_embed_incr_indexed,d_simhash,d_simhash_pairs,d_embed_lsh_pairs,d_embed_lsh_multiprobe,d_neardup_clusters,d_embed_clusters,d_cluster_keep_best,v_quantize,ann_bruteforce,ann_ivf,ann_lsh,ann_ivf_retrain,ann_ivf_fitstats,t_span_dedup,pipe_corpus_clean,pipe_incr_clean,pipe_incr_clean_embed,pipe_incr_evolve,pipe_incr_evolve_embed,pipe_incr_evolve_serve"
log "5a. x64 dedup/ANN family strike 1"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike1.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup.json
log "5b. x64 family strike 2 (cross-strike envelope)"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike2.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup_strike2.json

log "6. x10 full suite (skip contract: O(n^2)-class verifiers)"
SPARK_GRAFT_SF_DIR=target/scale_x10 \
  SPARK_GRAFT_BENCH_SKIP="d_ngram_jaccard,d_embed_neardup,d_embed_neardup_ivf" \
  scripts/bench.sh > /tmp/x10_full.json 2>/dev/null || true
cp bench_out.json BENCH_sf1.json

log "7. FINAL full-suite sf0.1 strike (bench_out.json = this one)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  scripts/bench.sh > /tmp/sf01_full.json 2>/dev/null || true
cp bench_out.json BENCH_LOCAL.json

log "chain done"
