#!/bin/bash
# Round-14 evidence chain (run sequentially, one Spark JVM at a time —
# the same-phase discipline). Items, mapped to the round-13 verdict:
#
#   1. SkewPhase with the new "auto" cell at 4M docs: proves the census
#      router picks the hot route on a stopword-dense corpus (verdict #1
#      "done =" condition) — route_hot read from the actual plan.
#   2. Retrieval-family decade ladder at sf10full and sf100 for
#      q95/q96/q99/q100: q96 now runs the AUTO default (census-routed —
#      plain at sf10full where max-df×40B ≈ 20 MB, HOT at sf100 where it
#      ≈ 200 MB crosses the 128 MB task threshold), and q100 lands its
#      first decade points against q96's per-query form (verdict #2).
#   3. q40 decade points on the CURRENT engine (verdict #5): 10× the
#      reference workload (400 scenarios / 15.0M ticks) and 100×
#      (4000 / 150M), 3 runs and 1 run respectively.
#   4. Forward as-of soak re-run with per-batch attribution columns
#      (verdict #4a): every batch records GC delta + loadavg; the
#      artifact's slowest_batches block adjudicates spikes by itself.
#
# ci_scale_witnesses.sh (verdict #4b) runs separately — it drives sbt,
# not the frozen bin.
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
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
JAVA64="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx64g -Xms64g"
export SPARK_GRAFT_CPUS=32
RETRIEVAL=q95_bm25_search,q96_tfidf_terms,q99_bm25_indexed,q100_tfidf_indexed

log "1/4 SkewPhase auto/routed/plain at 4M docs"
uptime
SPARK_GRAFT_PHASE_RUNS=2 SPARK_GRAFT_SKEW_PLAN_OUT=skewplan_tfidf_4m_r14 \
  $JAVA64 -cp "$CP" graft.tools.SkewPhase 4000000 3 \
  2>/tmp/r14_skew.err | tee skewphase_tfidf_4m_r14.txt

log "2a/4 retrieval ladder at sf10full (3-run medians)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_retrieval_r14.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r14_lad10.err | tail -1

log "2b/4 retrieval ladder at sf100 (3-run medians; q96 expected AUTO-HOT)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_ONLY=$RETRIEVAL \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_retrieval_r14.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r14_lad100.err | tail -1

log "3a/4 q40 decade point: 400 scenarios / 15.0M ticks, 3 runs"
uptime
for i in 1 2 3; do
  SPARK_GRAFT_REPLAY_SCENARIOS=400 SPARK_GRAFT_REPLAY_TICKS=15000000 \
    $JAVA -cp "$CP" graft.sim.TickReplay 2>/tmp/r14_replay10_$i.err | tail -1
done | tee bench_tickreplay_10x_r14.txt

log "3b/4 q40 century point: 4000 scenarios / 150M ticks, 1 run"
uptime
SPARK_GRAFT_REPLAY_SCENARIOS=4000 SPARK_GRAFT_REPLAY_TICKS=150000000 \
  $JAVA -cp "$CP" graft.sim.TickReplay 2>/tmp/r14_replay100.err | tail -1 \
  | tee bench_tickreplay_100x_r14.txt

log "4/4 forward as-of soak (1000 keys x 30 min) with batch attribution"
uptime
$JAVA -cp "$CP" graft.tools.ForwardAsOfSoak 1000 30 \
  2>/tmp/r14_soak.err | tail -1 | tee soak_forward_asof_r14.txt

log "DONE"
