#!/bin/bash
# Round-13 evidence chain 3 — FROZEN binary target/r13bin4 (TF-IDF
# heavy-hitter routing with the SHARED persisted dft; BM25 re-cut to
# ONE explode pass with persisted pre-filtered postings — chain 2 measured
# the first cut paying a duplicate dft corpus pass: routed 94.8-326.5 s
# vs plain 44.7-56.1 s at +3.9 GB shuffle). Re-adjudicates routed vs
# plain on the fixed code, and lands the final q96 decade points.
set -eu
cd /root/repo
log() { echo "[r13m3] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin4:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/3 SkewPhase routed(persisted-dft) vs plain (4M docs)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 SPARK_GRAFT_SKEW_PLAN_OUT=skewplan_tfidf_4m_r13c \
  $JAVA -Xmx48g -Xms48g -cp "$CP" graft.tools.SkewPhase 4000000 \
  2>/tmp/r13_skew3.err | tee skewphase_tfidf_4m_r13c.txt

log "2/3 q95+q96 sf100 final decade points"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_q95q96b_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13_q96_100.err | tail -1

log "3/3 q95+q96 sf10full final decade points"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q95q96b_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13_q96_10.err | tail -1
log "DONE"
uptime
