#!/bin/bash
# Round-12 evidence chain, part 2 — runs on the FROZEN post-rewrite
# binary target/r12bin2 (commit 3e46cf1: canonicalKeep aggregates,
# memoized PPJoin pair stream). Detached launch; artifacts land next to
# part 1's.
#
#   1. q91 sf100 partition phase on the NEW kernel (the part-1 artifact
#      measured the r11 kernel per the attribution question; the landing
#      code gets its own same-phase number).
#   2. PipelinePhase q27->q81->q91 at sf100: the memoized pair stream's
#      pipeline framing — consumers after the first pay marginal cost.
#   3. docs50m two-level kernel wall, clean rerun (part 1's runs carried
#      builder co-tenancy: loadavg 20-37).
#   4. Idle 3-run full local bench -> bench_local_r12.json, then re-mint
#      the certificate (registry hot paths changed: q27/q81/q91).
set -u
cd /root/repo
log() { echo "[round12b] $(date +%H:%M:%S) $*"; }

ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12bin2:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1/4 q91 sf100 partition phase, NEW kernel (32 vs 256, 2 rounds)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PartitionPhase q91_canonical_keep target/sf100 32,256 \
  2>/tmp/r12b_phase_q91.err | tee phase_q91_sf100_new_r12.txt

log "2/4 pipeline q27->q81->q91 at sf100 (memoized pair stream, 2 rounds)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.PipelinePhase target/sf100 \
  q27_ngram_jaccard,q81_dedup_clusters,q91_canonical_keep 2 \
  2>/tmp/r12b_pipeline.err | tee pipeline_q27q81q91_sf100_r12.txt

log "3/4 docs50m two-level kernel wall, clean rerun (2 runs)"
uptime
SPARK_GRAFT_ROUTES=two SPARK_GRAFT_ROUTE_RUNS=2 $JAVA -Xmx64g -Xms64g -cp "$CP" \
  graft.tools.SimhashRoutePhase target/docs50m \
  2>/tmp/r12b_docs50m.err | tee routephase_docs50m_idle_r12.txt

log "4/4 idle 3-run local bench + certificate re-mint"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r12.json \
  $JAVA -Xmx16g -Xms16g -cp "$CP" graft.Bench \
  2>/tmp/r12b_bench_local.err | tail -2
$JAVA -Xmx2g -Xms2g -cp "$CP" \
  graft.tools.BenchCertify bench_local_r12.json bench_certificate.json \
  2>&1 | tail -1

log "DONE"
