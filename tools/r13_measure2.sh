#!/bin/bash
# Round-13 evidence chain 2 — FROZEN binary target/r13bin3 (post
# BM25-small-query route + TF-IDF heavy-hitter routing).
#   1. SkewPhase routed-vs-plain A/B on the 4M-doc / 80M-term synthetic
#      (the corpus parquet from chain 1 is reused — same bytes).
#   2. q95/q96 decade points re-measured on the new routes (sf100 +
#      sf10full) — comparators: 112.0 / 144.6 s (sf100) and 4.36 /
#      20.0 s (sf10full) from bench_sf*_newops_r13.json.
#   3. q94's sf10full GC anomaly heap A/B: 52.7 s wall / 49.5 s GC at
#      Xmx32g (chain 1) vs r12's 4.95 s / 0.8 s GC at Xmx64g — same
#      code, same bytes. 3-run cells at 64g and 32g adjudicate
#      harness-heap artifact vs operator regression.
set -eu
cd /root/repo
log() { echo "[r13m2] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin3:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/4 SkewPhase routed-vs-plain (4M docs)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 SPARK_GRAFT_SKEW_PLAN_OUT=skewplan_tfidf_4m_r13b \
  $JAVA -Xmx48g -Xms48g -cp "$CP" graft.tools.SkewPhase 4000000 \
  2>/tmp/r13_skew2.err | tee skewphase_tfidf_4m_r13b.txt

log "2/4 q95+q96 sf100 on the new routes"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_q95q96_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13_lad100b.err | tail -1

log "3/4 q95+q96 sf10full on the new routes"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q95q96_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13_lad10b.err | tail -1

log "4/4 q94 heap A/B at sf10full (64g vs 32g, 3-run cells)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q94_knn_labels \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q94_64g_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13_q94_64.err | tail -1
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q94_knn_labels \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q94_32g_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13_q94_32.err | tail -1
log "DONE"
uptime
