#!/bin/bash
# Round-18 measurement cycle — the r17 protocol verbatim: frozen classes
# dir (target/r18bin, refreshed by the caller via tools/r18_freeze.sh),
# java directly (no sbt JIT/GC co-tenant), local[32], sf0.1, 3-run
# medians, loadavg-gated admission. Usage:
#   tools/r18_bench.sh <tag> [sfdir] [runs]
# writes bench_local_r18<tag>.json (+ .metrics.json / .plans.txt).
set -euo pipefail
cd /root/repo
TAG="${1:?tag}"
SF="${2:-/root/testdata/sf0.1}"
RUNS="${3:-3}"
log() { echo "[r18bench] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r18bin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

LOAD_GATE="${SPARK_GRAFT_MINT_MAX_LOAD:-4.0}"
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $LOAD_GATE else 0)")
  [ "$ok" = "1" ] && { log "idle gate: loadavg $load < $LOAD_GATE"; break; }
  log "idle gate: loadavg $load >= $LOAD_GATE — waiting ($i/60)"
  sleep 30
  [ "$i" = "60" ] && { log "host never idle — REFUSING"; exit 2; }
done

log "$RUNS-run bench ($TAG) on $SF"
uptime
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_BENCH_OUT="bench_local_r18$TAG.json" \
  $JAVA -cp "$CP" graft.Bench 2>"/tmp/r18_bench_$TAG.err" | tail -2 | head -1
