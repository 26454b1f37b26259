#!/bin/bash
# Round-12c chain 2 — runs on the frozen binary target/r12cbin2 (the
# PartitionPhase memo-clean fix compiled in): 
#   1. q91 sf100 same-phase cells 32/256/adaptive with the memoized pair
#      stream DROPPED between cells, so every cell replans its whole tree
#      under its own conf (chain 1's table shared a frozen 32-partition
#      sub-plan across cells, understating the adaptive/256 advantage).
#   2. PipelinePhase q27->q81->q91->q93 at sf100: q93 as the 4th consumer
#      of the shared PPJoin pair stream — marginal cost only.
set -u
cd /root/repo
log() { echo "[r12c2] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12cbin2:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/2 q91 sf100 memo-clean cells: 32 vs 256 vs adaptive (2 rounds)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PartitionPhase q91_canonical_keep target/sf100 32,256,adaptive \
  2>/tmp/r12c2_phase_q91.err | tee phase_q91_sf100_adaptive_r12b.txt

log "2/2 pipeline q27->q81->q91->q93 at sf100 (2 rounds)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.PipelinePhase target/sf100 \
  q27_ngram_jaccard,q81_dedup_clusters,q91_canonical_keep,q93_edit_neardup 2 \
  2>/tmp/r12c2_pipeline.err | tee pipeline_q27q81q91q93_sf100_r12.txt

log "DONE"; uptime
