#!/bin/bash
# Round-12c evidence chain — adaptive-partitioning engine default +
# registry 94. Runs on the FROZEN binary target/r12cbin (copied from the
# committed 5fc8bc9 compile). Detached launch per the round-10/11
# discipline; every step appends its own artifact so a killed chain
# still leaves partial evidence.
#
# Steps:
#   1. Idle twin 3-run local benches at sf0.1 (the driver contract, now
#      adaptive by default) -> bench_local_r12.json / r12b.json
#      (OVERWRITING this round's pre-adaptive twins — those stay in git
#      history at 1af5000; the gate spec needs the newest bench_local_r12
#      to carry all 94 queries), then re-mint the certificate.
#   2. q91 sf100 same-phase partition cells: pinned 32 vs pinned 256 vs
#      ADAPTIVE (the engine default) — does the default match or beat the
#      hand-picked 256?
#   3. q30 sf100 same-phase: pinned 32 vs adaptive (its sf100 wall is
#      ~90% output orderBy — exactly the stage adaptive range partitioning
#      should parallelize).
#   4. sf10full full suite (minus contract-quadratic q33/q44) on the
#      adaptive default -> bench_sf10full_r12.json (r11 comparator:
#      722.8 s pinned-32).
set -u
cd /root/repo
log() { echo "[r12c] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12cbin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/4 idle twin 3-run local benches (mint source) + re-mint"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r12.json \
  $JAVA -Xmx16g -Xms16g -cp "$CP" graft.Bench 2>/tmp/r12c_bench1.err | tail -1
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r12b.json \
  $JAVA -Xmx16g -Xms16g -cp "$CP" graft.Bench 2>/tmp/r12c_bench2.err | tail -1
$JAVA -Xmx4g -Xms4g -cp "$CP" graft.tools.BenchCertify \
  bench_local_r12.json bench_certificate.json 2>&1 | tail -1

log "2/4 q91 sf100 same-phase cells: 32 vs 256 vs adaptive (2 rounds)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PartitionPhase q91_canonical_keep target/sf100 32,256,adaptive \
  2>/tmp/r12c_phase_q91.err | tee phase_q91_sf100_adaptive_r12.txt

log "3/4 q30 sf100 same-phase cells: 32 vs adaptive (2 rounds)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PartitionPhase q30_simhash_pairs target/sf100 32,adaptive \
  2>/tmp/r12c_phase_q30.err | tee phase_q30_sf100_adaptive_r12.txt

log "4/4 sf10full full suite on the adaptive default"
uptime
SPARK_GRAFT_SF_DIR=$PWD/target/sf10full SPARK_GRAFT_BENCH_SKIP=q33_cosine_topk,q44_cosine_topk_blocked \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_r12.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r12c_sf10full.err | tail -1

log "DONE"; uptime
