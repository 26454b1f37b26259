#!/bin/bash
# Round-13 evidence chain 4 — FROZEN binary target/r13bin5 (FINAL round
# code: BM25 one-pass persisted postings; TF-IDF default = plain join,
# hotTerms routing opt-in). Lands the definitive decade points for
# q95/q96, the certificate-safety check at sf0.1, and the stage-named
# straggler attribution for the SkewPhase cells.
#
# RUNS>=3 everywhere so medians are warm (chains 2/3 ran q95 cold-first
# with RUNS=2, where median = mean(cold, warm) — 22.6/40.2 s artifacts).
set -eu
cd /root/repo
log() { echo "[r13m4] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin5:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/4 q95+q96 sf0.1 certificate-safety check (3-run medians)"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf01_q95q96_r13.json \
  $JAVA -Xmx16g -Xms16g -cp "$CP" graft.Bench 2>/tmp/r13m4_sf01.err | tail -1

log "2/4 q95+q96 sf10full (3-run warm medians)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_q95q96c_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13m4_sf10.err | tail -1

log "3/4 q95+q96 sf100 (3-run warm medians)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_q95q96c_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13m4_sf100.err | tail -1

log "4/4 SkewPhase with stage-named straggler attribution (1 round)"
uptime
SPARK_GRAFT_PHASE_RUNS=1 \
  $JAVA -Xmx48g -Xms48g -cp "$CP" graft.tools.SkewPhase 4000000 \
  2>/tmp/r13m4_skew.err | tee skewphase_tfidf_4m_r13d.txt
log "DONE"
uptime
