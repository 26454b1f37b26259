#!/bin/bash
# Round-12e mint: registry grew 94 -> 98 (q95 BM25, q96 TF-IDF, q97
# token-budget, q98 PMI), so the
# certificate re-mints (standing rule). Twin back-to-back idle 3-run
# local benches on the frozen post-commit binary (target/r12ebin), mint
# from the first.
set -eu
cd /root/repo
log() { echo "[r12e] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12ebin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
export SPARK_GRAFT_CPUS=32

log "idle 3-run local bench (mint source)"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r12c.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r12e_bench1.err | tail -1

log "back-to-back twin (same binary, same phase)"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r12d.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r12e_bench2.err | tail -1

log "re-mint certificate from the mint source"
$JAVA -cp "$CP" graft.tools.BenchCertify \
  bench_local_r12c.json bench_certificate.json 2>&1 | tail -1
log "DONE"
