#!/bin/bash
# Round-14 evidence chain — FINAL methodology (the first cut of this
# script is preserved in git history; two of its cells were re-measured
# during the round and the lessons are baked in here):
#
#   - Heap conventions from r13_measure5.sh: sf10full cells at -Xmx32g,
#     sf100/SkewPhase/emb2m cells at -Xmx64g. The first-cut 16 g sf100
#     cells re-measured heap pressure, not operators (q96: 63 GB
#     mem-spill at 16 g, zero at 64 g on the identical plan).
#   - Idle gate before every Spark cell (the r14_mint.sh rule): refuse
#     to launch above loadavg 4.0, poll 30 min, fail loudly.
#   - SPARK_GRAFT_BENCH_WARM_LAP=1 on subset ladders: the
#     alphabetically-first query of a subset session otherwise pays the
#     session's JIT/codegen inside its measured runs (q100 read 4.4 to
#     17.4 s at sf10full purely by session position).
#
# Items, mapped to the round-13 verdict:
#   1. SkewPhase "auto" cell at 4M docs — census router proof (verdict #1).
#   2. Retrieval decade ladders (q95/q96/q99/q100) at sf10full + sf100
#      (verdict #2).
#   3. q40 decade points: 10× and 100× the reference workload (verdict #5).
#   4. Forward as-of soak with per-batch attribution (verdict #4a).
# ci_scale_witnesses.sh (verdict #4b) runs separately — it drives sbt.
set -eu
cd /root/repo
log() { echo "[r14m] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r14bin:/opt/spark/jars/*"
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
log "1/4 SkewPhase auto/routed/plain at 4M docs (64g)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 SPARK_GRAFT_SKEW_PLAN_OUT=skewplan_tfidf_4m_r14 \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.SkewPhase 4000000 3 \
  2>/tmp/r14_skew.err | tee skewphase_tfidf_4m_r14.txt

require_idle
log "2a/4 retrieval ladder at sf10full (3-run medians, 32g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_retrieval_r14.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r14_lad10.err | tail -1

require_idle
log "2b/4 retrieval ladder at sf100 (3-run medians, 64g, warm lap)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_WARM_LAP=1 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_retrieval_r14.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r14_lad100.err | tail -1

require_idle
log "3a/4 q40 decade point: 400 scenarios / 15.0M ticks, 3 runs (16g)"
uptime
for i in 1 2 3; do
  SPARK_GRAFT_REPLAY_SCENARIOS=400 SPARK_GRAFT_REPLAY_TICKS=15000000 \
    $JAVA -Xmx16g -Xms16g -cp "$CP" graft.sim.TickReplay \
    2>/tmp/r14_replay10_$i.err | tail -1
done | tee bench_tickreplay_10x_r14.txt

require_idle
log "3b/4 q40 century point: 4000 scenarios / 150M ticks, 1 run (16g)"
uptime
SPARK_GRAFT_REPLAY_SCENARIOS=4000 SPARK_GRAFT_REPLAY_TICKS=150000000 \
  $JAVA -Xmx16g -Xms16g -cp "$CP" graft.sim.TickReplay \
  2>/tmp/r14_replay100.err | tail -1 | tee bench_tickreplay_100x_r14.txt

require_idle
log "4/4 forward as-of soak (1000 keys x 30 min) with batch attribution (16g)"
uptime
$JAVA -Xmx16g -Xms16g -cp "$CP" graft.tools.ForwardAsOfSoak 1000 30 \
  2>/tmp/r14_soak.err | tail -1 | tee soak_forward_asof_r14.txt

log "DONE"
