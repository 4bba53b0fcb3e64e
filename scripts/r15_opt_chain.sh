#!/usr/bin/env bash
# Round-15 OPTIMIZATION-round measurement chain — one sequential
# quiet-box run closing the round (adapted from the staged
# r16_chain.sh template; the baseline BENCH_opt_r15_before.json was
# struck at round start on the regenerated corpus, so every artifact
# here is an after-number against it).
#
# Assumes target/scale_x10 and target/scale_x64 exist
# (graft.ScaleUp /root/testdata/sf0.1 target/scale_xN N).
set -ux
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=24g
log() { echo "=== [$(date +%H:%M:%S)] $*" >&2; }

log "0. fresh full Verify at sf0.01 + self-struck correctness artifact"
rm -rf /tmp/verify_r15opt_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r15opt_final" 1>&2
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_r15opt_final \
  CORRECTNESS_self.json | tail -3

log "1. full ScalaTest suite"
sbt -batch test 1>&2 || log "SUITE FAILED — inspect before committing artifacts"

log "2. clean_serve stage budget (now itemizes derive_sec)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.queries.CleanServeProbe" 2>/dev/null \
  | grep '"metric":"clean_serve_budget"' > /tmp/csb.json \
  && [ -s /tmp/csb.json ] && cp /tmp/csb.json CLEAN_SERVE_BUDGET.json \
  || log "CleanServeProbe failed (artifact untouched)"

X64_FAMILY="d_exact_dedup,ann_pq,ann_ivf_pq,ann_ivf_pqr,ann_pq_w8,ann_ivf_pq_w8,ann_pq_opq,d_minhash_lsh,d_incr_neardup,d_incr_indexed,d_embed_incr_indexed,d_simhash,d_simhash_pairs,d_embed_lsh_pairs,d_embed_lsh_multiprobe,d_neardup_clusters,d_embed_clusters,d_cluster_keep_best,v_quantize,ann_bruteforce,ann_ivf,ann_lsh,ann_sq8,ann_ivf_sq8,ann_ivf_retrain,ann_ivf_fitstats,t_span_dedup,pipe_corpus_clean,pipe_incr_clean,pipe_incr_clean_embed,pipe_incr_evolve,pipe_incr_evolve_embed,pipe_incr_evolve_serve,pipe_incr_clean_serve"

log "3. x64 dedup/ANN family strike (quiet-guarded, bounded wait)"
SPARK_GRAFT_SF_DIR=target/scale_x64 SPARK_GRAFT_BENCH_ONLY="$X64_FAMILY" \
  SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 SPARK_GRAFT_BENCH_WAIT_QUIET=600 \
  scripts/bench.sh > /tmp/x64_strike1.json 2>/dev/null || true
scripts/promote_artifact.sh scale_x64 BENCH_x64_dedup.json || true

log "4. x10 full suite (skip contract: O(n^2)-class verifiers)"
SPARK_GRAFT_SF_DIR=target/scale_x10 \
  SPARK_GRAFT_BENCH_SKIP=d_ngram_jaccard,d_embed_neardup,d_embed_neardup_ivf \
  SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 SPARK_GRAFT_BENCH_WAIT_QUIET=600 \
  scripts/bench.sh > /tmp/x10.json 2>/dev/null || true
scripts/promote_artifact.sh scale_x10 BENCH_sf1.json || true

log "5. final quiet-guarded sf0.1 full strike"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 SPARK_GRAFT_BENCH_WAIT_QUIET=900 \
  scripts/bench.sh > /tmp/sf01.json 2>/dev/null || true
scripts/promote_artifact.sh testdata/sf0.1 BENCH_LOCAL.json || true

log "chain complete — review artifacts, then commit"
