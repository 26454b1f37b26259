#!/bin/bash
# Round-16 evidence chain, mapped to the round-15 verdict:
#   1. IndexAppendPhase at 4M docs / 1% append — the append lifecycle
#      must be UNCHANGED by this round's maintenance work (deferred
#      sweep, writer lock, packed manifest, batched listing): append
#      still ∝ appended fraction, compaction still postings-only.
#   2. Retrieval decade ladders (q95/q96/q99/q100) at sf10full + sf100 —
#      verdict #3: re-adjudicate q95's sf100 swing (8.8 → 33.1 s r14→r15,
#      shape-identical plan, attributed to host weather) on a quiet
#      phase; also re-bases q100 with the decidable census-skip live
#      (skips at sf0.1/sf10full where N ≤ ~3.3M docs, censuses at sf100).
#
# Conventions carried from r15_measure.sh: heap ladder (32g sf10full,
# 64g sf100/4M-docs), idle gate before every Spark cell (refuse above
# loadavg 4.0, poll 30 min, fail loudly), warm lap on subset ladders.
set -euo pipefail
cd /root/repo
log() { echo "[r16m] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r16bin:/opt/spark/jars/*"
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
log "1/3 IndexAppendPhase: 4M docs, 1% append (64g)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.IndexAppendPhase 4000000 0.01 \
  2>/tmp/r16_idxapp.err | tee idxappend_4m_r16.txt

require_idle
log "2/3 retrieval ladder at sf10full (3-run medians, 32g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_retrieval_r16.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r16_lad10.err | tail -1

require_idle
log "3/3 retrieval ladder at sf100 (3-run medians, 64g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_retrieval_r16.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r16_lad100.err | tail -1
log "DONE"
