#!/bin/bash
# Round-12 evidence chain — runs on the FROZEN binary target/r12bin
# (copied from the committed 182ae05 compile) so source edits during the
# round cannot change what is being measured. Launched detached
# (setsid nohup) per the round-10/11 discipline; each step appends to
# its own artifact so a killed chain still leaves partial evidence.
#
# Steps, in verdict-priority order:
#   1. q91 sf100 same-phase partition knob (32 vs 256, 2 interleaved
#      rounds) — converts the 1.22 wall-exponent attribution from
#      q27-analogy to direct evidence (VERDICT r11 Next #1).
#   2. docs50m two-level simhash kernel wall point (no-sort: the route
#      tool writes pairs via noop, no orderBy) — converts the decade-4
#      work census into an end-to-end wall measurement (Next #4).
#   3. Forward as-of RocksDB soak at LiveLoopSoak scale (Next #5).
set -u
cd /root/repo
log() { echo "[round12] $(date +%H:%M:%S) $*"; }

ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12bin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/3 q91 sf100 partition phase (32 vs 256, 2 rounds interleaved)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PartitionPhase q91_canonical_keep target/sf100 32,256 \
  2>/tmp/r12_phase_q91.err | tee phase_q91_sf100_r12.txt

log "2/3 docs50m two-level simhash kernel wall (no-sort, 2 runs)"
uptime
SPARK_GRAFT_ROUTES=two SPARK_GRAFT_ROUTE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.SimhashRoutePhase target/docs50m \
  2>/tmp/r12_docs50m.err | tee routephase_docs50m_r12.txt

log "3/3 forward as-of RocksDB soak (1000 keys x 30 min = 1.8M ticks)"
uptime
$JAVA -Xmx16g -Xms16g -cp "$CP" \
  graft.tools.ForwardAsOfSoak 1000 30 \
  2>/tmp/r12_fwdsoak.err | tee soak_forward_asof_r12.txt

log "DONE"
