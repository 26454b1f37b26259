#!/bin/bash
# Round-13 evidence chain 5 (final) — FROZEN binary target/r13bin6:
# BM25 default reverted to the r12 explode plan (both optimization cuts
# measured and rejected), TF-IDF default = plain join with the hotTerms
# routing knob, Bench warmup touches every table (kills the cold-first-
# family artifact that mis-read the chain-1 ladders).
#   1-2. Definitive q95/q96 decade points (3-run warm medians).
#   3.   Full-suite sf10full continuity ladder (the r9-r12 pattern;
#        q33/q44 skipped — contract-quadratic exact baselines whose
#        scale paths are q34/q71/q78).
set -eu
cd /root/repo
log() { echo "[r13m5] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin6:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/3 q95+q96 sf10full (3-run warm medians, final code)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q95q96_final_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13m5_sf10.err | tail -1

log "2/3 q95+q96 sf100 (3-run warm medians, final code)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_q95q96_final_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13m5_sf100.err | tail -1

log "3/3 full-suite sf10full continuity ladder"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full \
  SPARK_GRAFT_BENCH_SKIP=q33_cosine_topk,q44_cosine_topk_blocked \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13m5_full.err | tail -1
log "DONE"
uptime
