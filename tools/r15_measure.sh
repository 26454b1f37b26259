#!/bin/bash
# Round-15 evidence chain, mapped to the round-14 verdict:
#   1. IndexAppendPhase at 4M docs / 1% append — the segmented-index
#      witness (verdict #1): append cost ∝ appended fraction, mode and
#      files-tokenized read from the build accounting, compaction a
#      postings-only merge.
#   2. KnnStructPhase at 2M vectors / 200 clusters / 1% planted
#      mislabels — the structured-label decade point for the IVF-PQ
#      audit route (verdict #5): verdict agreement ≈ 1 expected.
#   3. Retrieval decade ladders (q95/q96/q99/q100) at sf10full + sf100 —
#      parity check that segmented serving holds the r14 decade points
#      (q99 index-served search still ∝ matching postings; q100 still
#      ~2x under q96 at sf100).
#   4. CooccurSkewPhase at 1M docs / 100k pool — stretch #8: measure
#      that a hot term_a's pair fan-out is vocabulary-bounded.
#
# Conventions carried from r14_measure.sh: heap ladder (32g sf10full,
# 64g sf100/4M-docs/2M-vectors), idle gate before every Spark cell
# (refuse above loadavg 4.0, poll 30 min, fail loudly), warm lap on
# subset ladders (the alphabetically-first query otherwise pays session
# JIT inside its measured runs).
set -eu
cd /root/repo
log() { echo "[r15m] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r15bin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32
RETRIEVAL=q95_bm25_search,q96_tfidf_terms,q99_bm25_indexed,q100_tfidf_indexed

LOAD_GATE="${SPARK_GRAFT_MEASURE_MAX_LOAD:-4.0}"
require_idle() {
  for i in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $LOAD_GATE else 0)")
    [ "$ok" = "1" ] && { log "idle gate: loadavg $load < $LOAD_GATE"; return 0; }
    log "idle gate: loadavg $load >= $LOAD_GATE — waiting ($i/60)"
    sleep 30
  done
  log "idle gate: host never went idle — REFUSING"
  exit 2
}

require_idle
log "1/4 IndexAppendPhase: 4M docs, 1% append (64g)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.IndexAppendPhase 4000000 0.01 \
  2>/tmp/r15_idxapp.err | tee idxappend_4m_r15.txt

require_idle
log "2/4 KnnStructPhase: 2M vectors, 200 clusters, 1% planted (64g)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.KnnStructPhase 2000000 200 5 4 \
  2>/tmp/r15_knnstruct.err | tee knnstruct_emb2m_r15.txt

require_idle
log "3a/4 retrieval ladder at sf10full (3-run medians, 32g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_retrieval_r15.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r15_lad10.err | tail -1

require_idle
log "3b/4 retrieval ladder at sf100 (3-run medians, 64g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_retrieval_r15.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r15_lad100.err | tail -1

require_idle
log "4/4 CooccurSkewPhase: 1M docs, 100k pool (64g)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.CooccurSkewPhase 1000000 100000 \
  2>/tmp/r15_cooccur.err | tee cooccur_skew_1m_r15.txt

log "DONE"
