#!/bin/bash
# Round-17 (optimization round 1) bench runner: one loadavg-gated 3-run
# cycle of the full suite on the frozen binary in target/r17bin, writing
# bench_local_r17$1.json (+ metrics/plans sidecars). Protocol identical
# to r16_mint.sh's run_cycle so numbers stay comparable.
set -euo pipefail
cd /root/repo
TAG="${1:?usage: r17_bench.sh <tag> [extra env...]}"
log() { echo "[r17bench] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r17bin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

LOAD_GATE="${SPARK_GRAFT_MINT_MAX_LOAD:-4.0}"
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $LOAD_GATE else 0)")
  [ "$ok" = "1" ] && { log "idle gate: loadavg $load < $LOAD_GATE"; break; }
  log "idle gate: loadavg $load >= $LOAD_GATE — waiting ($i/60)"
  sleep 30
done

log "pre-build the sf0.1 q99/q100 index on the current binary (outside the cycle)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_ONLY=q99_bm25_indexed,q100_tfidf_indexed \
  SPARK_GRAFT_BENCH_WITNESS=0 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_prebuild.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r17_prebuild.err | tail -1

log "3-run local bench ($TAG)"
uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_local_r17$TAG.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r17_bench_$TAG.err | tail -1
