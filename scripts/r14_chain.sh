#!/usr/bin/env bash
# Round-14 end-of-round measurement chain — ONE sequential quiet-box
# run (the §9.11/§9.12 artifact-coherence rule). This round changed
# the embed band path (graft_bands codegen kernel), the PQ layer
# (packed words, residual + wide geometries, kernel-based training),
# and the as-of join — so the chain re-strikes: fresh full Verify +
# DuckDB selfcheck (CORRECTNESS_self.json — the r13 driver artifact
# came back empty, this one is un-losable), the full ScalaTest suite,
# the evolve/embed-index probes whose stage budgets moved with the
# kernel, the x64 dedup/ANN family twice (cross-strike envelopes, now
# incl. ann_ivf_pqr/ann_pq_w8), the x10 full suite, and the final
# quiet-guarded sf0.1 strike bench_out.json points at.
#
# NOT re-struck (unchanged paths, fresh artifacts already committed
# this round): Sq8PoolSweep (BENCH_sq8.json struck after the wide-PQ
# landing), EmbedIvfRecall, EmbedBandKnee (band keys are bit-equal to
# r13's; the knee records counts/recall, not kernel cost),
# CleanServeProbe (CLEAN_SERVE_BUDGET.json struck this round).
#
# Assumes target/scale_x10 and target/scale_x64 exist
# (graft.ScaleUp /root/testdata/sf0.1 target/scale_xN N).
set -ux
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=24g
log() { echo "=== [$(date +%H:%M:%S)] $*" >&2; }

log "0. fresh full Verify at sf0.01 + self-struck correctness artifact"
rm -rf /tmp/verify_r14_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r14_final" 1>&2
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_r14_final \
  CORRECTNESS_self.json | tail -3

log "1. full ScalaTest suite"
sbt -batch test 1>&2 || log "SUITE FAILED — inspect before committing artifacts"

log "2. evolve K-curve + append write path at x64 (band kernel landed)"
SPARK_GRAFT_SF_DIR=target/scale_x64 \
  sbt -batch "runMain graft.queries.EvolveProbe" 2>/dev/null \
  | grep '"metric":"incr_evolve_scaling"' > INCR_EVOLVE_SCALING.json \
  || log "EvolveProbe failed (artifact untouched)"

log "3. embed index probe + autocompact smoke at sf0.1 and x64"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_AUTOCOMPACT_SMOKE=1 \
  sbt -batch "runMain graft.queries.EmbedIndexProbe" 2>/dev/null \
  | grep '^{"' > /tmp/embed_probe_sf01.jsonl || true
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_AUTOCOMPACT_SMOKE=1 \
  sbt -batch "runMain graft.queries.EmbedIndexProbe" 2>/dev/null \
  | grep '^{"' > /tmp/embed_probe_x64.jsonl || true
python3 scripts/assemble_embed_scaling.py /tmp/embed_probe_sf01.jsonl \
  /tmp/embed_probe_x64.jsonl > EMBED_INDEX_SCALING.json \
  || log "embed scaling assembly failed (artifact untouched)"

X64_FAMILY="d_exact_dedup,ann_pq,ann_ivf_pq,ann_ivf_pqr,ann_pq_w8,d_minhash_lsh,d_incr_neardup,d_incr_indexed,d_embed_incr_indexed,d_simhash,d_simhash_pairs,d_embed_lsh_pairs,d_embed_lsh_multiprobe,d_neardup_clusters,d_embed_clusters,d_cluster_keep_best,v_quantize,ann_bruteforce,ann_ivf,ann_lsh,ann_sq8,ann_ivf_sq8,ann_ivf_retrain,ann_ivf_fitstats,t_span_dedup,pipe_corpus_clean,pipe_incr_clean,pipe_incr_clean_embed,pipe_incr_evolve,pipe_incr_evolve_embed,pipe_incr_evolve_serve,pipe_incr_clean_serve"
log "4a. x64 dedup/ANN family strike 1"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike1.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup.json
log "4b. x64 family strike 2 (cross-strike envelope)"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike2.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup_strike2.json

log "5. x10 full suite (skip contract: O(n^2)-class verifiers)"
SPARK_GRAFT_SF_DIR=target/scale_x10 \
  SPARK_GRAFT_BENCH_SKIP="d_ngram_jaccard,d_embed_neardup,d_embed_neardup_ivf" \
  scripts/bench.sh > /tmp/x10_full.json 2>/dev/null || true
cp bench_out.json BENCH_sf1.json

log "6. FINAL full-suite sf0.1 strike (quiet-guarded; bench_out.json = this one)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 \
  scripts/bench.sh > /tmp/sf01_full.json 2>/dev/null || true
cp bench_out.json BENCH_LOCAL.json

log "chain done"
