#!/usr/bin/env bash
# Round-12 FINAL measurement chain — re-struck after the round's last
# code change (the PersistedIndex lifecycle hoist + append fusion) so
# every committed artifact reflects the shipped code (the §9.11/§9.12
# artifact-coherence rule). One sequential quiet-box run; same
# protocol as scripts/r12_chain.sh, plus: EvolveProbe's stdout JSON is
# captured into INCR_EVOLVE_SCALING.json and EmbedIndexProbe's two
# JSON lines per scale are captured for EMBED_INDEX_SCALING.json
# assembly (the prior chain lost both to stderr and hand-recovered).
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

log "3. IVF pair-route recall (one invocation, incremental per-dir writes keep finished rows on a blowup)"
SPARK_GRAFT_IVF_RECALL_OUT=BENCH_embed_ivf.json \
  sbt -batch "runMain graft.EmbedIvfRecall /root/testdata/sf0.1 target/scale_x10 target/scale_x64" 1>&2 \
  || log "IVF recall run failed (artifact keeps finished dirs)"

log "4. evolve K-curve + append write path at x64"
SPARK_GRAFT_SF_DIR=target/scale_x64 \
  sbt -batch "runMain graft.queries.EvolveProbe" 2>/dev/null \
  | grep '"metric":"incr_evolve_scaling"' > INCR_EVOLVE_SCALING.json \
  || log "EvolveProbe failed (artifact untouched)"

log "5. embed index probe + autocompact smoke at sf0.1 and x64"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_AUTOCOMPACT_SMOKE=1 \
  sbt -batch "runMain graft.queries.EmbedIndexProbe" 2>/dev/null \
  | grep '^{"' > /tmp/embed_probe_sf01.jsonl || true
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_AUTOCOMPACT_SMOKE=1 \
  sbt -batch "runMain graft.queries.EmbedIndexProbe" 2>/dev/null \
  | grep '^{"' > /tmp/embed_probe_x64.jsonl || true

X64_FAMILY="d_exact_dedup,d_minhash_lsh,d_incr_neardup,d_incr_indexed,d_embed_incr_indexed,d_simhash,d_simhash_pairs,d_embed_lsh_pairs,d_embed_lsh_multiprobe,d_neardup_clusters,d_embed_clusters,d_cluster_keep_best,v_quantize,ann_bruteforce,ann_ivf,ann_lsh,ann_ivf_retrain,ann_ivf_fitstats,t_span_dedup,pipe_corpus_clean,pipe_incr_clean,pipe_incr_clean_embed,pipe_incr_evolve,pipe_incr_evolve_embed,pipe_incr_evolve_serve"
log "6a. x64 dedup/ANN family strike 1"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike1.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup.json
log "6b. x64 family strike 2 (cross-strike envelope)"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  scripts/bench.sh > /tmp/x64_strike2.json 2>/dev/null || true
cp bench_out.json BENCH_x64_dedup_strike2.json

log "7. x10 full suite (skip contract: O(n^2)-class verifiers)"
SPARK_GRAFT_SF_DIR=target/scale_x10 \
  SPARK_GRAFT_BENCH_SKIP="d_ngram_jaccard,d_embed_neardup,d_embed_neardup_ivf" \
  scripts/bench.sh > /tmp/x10_full.json 2>/dev/null || true
cp bench_out.json BENCH_sf1.json

log "8. FINAL full-suite sf0.1 strike (bench_out.json = this one)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  scripts/bench.sh > /tmp/sf01_full.json 2>/dev/null || true
cp bench_out.json BENCH_LOCAL.json

log "chain done"
