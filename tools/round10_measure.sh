#!/bin/bash
# Round-10 evidence chain. Generation (ScaleUp x100 full schema ->
# target/sf10full; x1000/x2000 embeddings -> target/emb2m, emb4m) runs
# once up front; benches run on the committed HEAD binary with the
# driver-parity session size (SPARK_GRAFT_CPUS=32 — the first chain
# attempt silently ran local[4], the GraftSession default, and every
# timing was parallelism-bound garbage; the plan sidecar's
# `hashpartitioning(..., 4)` was the tell).
set -e
cd /root/repo
log() { echo "[round10] $(date +%H:%M:%S) $*"; }
export SPARK_GRAFT_CPUS=32

for gen in "target/sf10full 100 " "target/sf100 1000 documents" \
           "target/emb2m 1000 embeddings" "target/emb4m 2000 embeddings"; do
  set -- $gen
  if [ ! -d "$1" ]; then
    log "gen $1 (factor $2 ${3:-all})"
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $1 $2 $3" \
      > "/tmp/r10_gen_$(basename $1).log" 2>&1
  fi
done

log "bench sf10full (85 queries = all minus contract-quadratic q33/q44)"
[ -f bench_sf10full_r10.json ] || \
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$PWD/target/sf10full \
  SPARK_GRAFT_BENCH_SKIP=q33_cosine_topk,q44_cosine_topk_blocked \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_r10.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r10_bench_sf10full.log 2>&1

log "bench q27 alone at sf100 (3-run median, same corpus as r9's q81=300.72s)"
[ -f bench_sf100_q27_r10.json ] || \
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$PWD/target/sf100 \
  SPARK_GRAFT_BENCH_ONLY=q27_ngram_jaccard SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_q27_r10.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r10_bench_q27.log 2>&1

log "bench q70+q84 at 2M vectors (3-run median, duplicate-free generator)"
[ -f bench_emb2m_r10.json ] || \
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$PWD/target/emb2m \
  SPARK_GRAFT_BENCH_ONLY=q70_embedding_neardup,q84_semantic_purge \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_OUT=bench_emb2m_r10.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r10_bench_emb2m.log 2>&1

log "bench q70+q84 at 4M vectors (3-run median)"
[ -f bench_emb4m_r10.json ] || \
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$PWD/target/emb4m \
  SPARK_GRAFT_BENCH_ONLY=q70_embedding_neardup,q84_semantic_purge \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_OUT=bench_emb4m_r10.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r10_bench_emb4m.log 2>&1

log "local 3-run bench for the certificate re-mint (87 queries)"
[ -f bench_local_r10.json ] || \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r10.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r10_bench_local.log 2>&1

log "DONE"
