#!/bin/bash
# On-demand CI-style re-execution of the heavy route-proof witnesses —
# the env-gated specs that a default `sbt test` reports as canceled by
# design (RouteScaleSpec: 74M real simhash edges take the distributed CC
# branch, 10.4M real eval hashes take the contamination inverted-index
# branch, both parity diff=0), plus the two streaming soaks. One
# command, artifacts with timestamps, non-zero exit on any failure:
#
#   ./tools/ci_scale_witnesses.sh           # everything (~20-40 min idle)
#   ./tools/ci_scale_witnesses.sh routes    # just RouteScaleSpec
#   ./tools/ci_scale_witnesses.sh soaks     # just the streaming soaks
#
# Discipline (PLAN.md round-10/11): launch at verified idle (the script
# prints uptime into the artifact), local[32], pinned-heap JVMs via
# build.sbt's -Xms=-Xmx.
set -e
cd "$(dirname "$0")/.."
what="${1:-all}"
stamp="$(date +%Y%m%d_%H%M%S)"
out="target/ci_witnesses_${stamp}.log"
log() { echo "[ci-witness] $(date +%H:%M:%S) $*" | tee -a "$out"; }

log "start what=$what"
uptime | tee -a "$out"
export SPARK_GRAFT_CPUS=32

if [ "$what" = "all" ] || [ "$what" = "routes" ]; then
  log "RouteScaleSpec (gated heavy witnesses: CC star-alternation @74M edges, contamination join @10.4M hashes)"
  SPARK_GRAFT_SCALE_SPECS=1 SPARK_DRIVER_MEM=64g \
    sbt -batch "testOnly graft.tools.RouteScaleSpec" 2>&1 | tee -a "$out" \
    | grep -E "Tests:|info\]\s+-|edges=|eval_hashes=" || true
  grep -q "All tests passed." "$out" || { log "FAIL RouteScaleSpec"; exit 1; }
fi

if [ "$what" = "all" ] || [ "$what" = "soaks" ]; then
  log "LiveLoopSoak (backward as-of streaming, 1000 keys x 30 min)"
  sbt -batch "runMain graft.tools.LiveLoopSoak" 2>&1 | tee -a "$out" \
    | grep -E '"soak"' || { log "FAIL LiveLoopSoak"; exit 1; }
  log "ForwardAsOfSoak (forward as-of streaming, 1000 keys x 30 min)"
  sbt -batch "runMain graft.tools.ForwardAsOfSoak 1000 30" 2>&1 | tee -a "$out" \
    | grep -E '"soak"' || { log "FAIL ForwardAsOfSoak"; exit 1; }
fi

log "DONE ok — artifact $out"
