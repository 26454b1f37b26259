#!/bin/bash
# Round-14 mint: registry grows to 100 (q100_tfidf_indexed), and q96's
# default is now census-auto-routed — standing rule: any registry growth
# or default-plan change re-mints the certificate from quiet local bench
# medians (per-query median across three idle 3-run benches, the
# round-13 protocol).
#
# NEW this round (round-13 verdict #6): the mint is SELF-DEFENDING — it
# refuses to run a bench cycle when the host is not idle, instead of
# relying on the operator eyeballing `uptime`. Threshold: 1-min loadavg
# must be < 4.0 (a truly idle host here sits at ~0–2; the contended
# driver-suite phases every round since 10 ran at 5–24). The gate
# re-polls before EACH bench tag so a co-tenant arriving mid-mint stalls
# the mint rather than polluting a cycle, and gives up loudly after
# ~30 min so a stuck mint is a visible failure, not a silent stale
# certificate.
set -eu
cd /root/repo
log() { echo "[r14] $(date +%H:%M:%S) $*"; }
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
export SPARK_GRAFT_CPUS=32

LOAD_GATE="${SPARK_GRAFT_MINT_MAX_LOAD:-4.0}"
require_idle() {  # poll up to 30 min for loadavg < gate; fail loudly after
  for i in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $LOAD_GATE else 0)")
    if [ "$ok" = "1" ]; then
      log "idle gate: loadavg $load < $LOAD_GATE — proceeding"
      return 0
    fi
    log "idle gate: loadavg $load >= $LOAD_GATE — waiting (poll $i/60)"
    sleep 30
  done
  log "idle gate: host never went idle — REFUSING to mint"
  exit 2
}

check_json() {  # fail loudly if a bench artifact is missing or unparseable
  python3 - "$1" <<'EOF'
import json, sys
with open(sys.argv[1]) as f:
    d = json.loads(f.read())
n = len(d["queries"])
assert n >= 100, f"expected >=100 queries, got {n}"
assert not d.get("errors"), f"bench errors: {d.get('errors')}"
print(f"[r14] {sys.argv[1]}: {n} queries, total {d['value']}s — OK")
EOF
}

for tag in a b c; do
  require_idle
  log "idle 3-run local bench ($tag)"
  uptime
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_OUT=bench_local_r14$tag.json \
    $JAVA -cp "$CP" graft.Bench 2>/tmp/r14_bench_$tag.err | tail -1
  check_json bench_local_r14$tag.json
done

log "combine: per-query median across a/b/c -> bench_local_r14.json"
python3 - <<'EOF'
import json
files = ['bench_local_r14a.json','bench_local_r14b.json','bench_local_r14c.json']
qs = [json.loads(open(f).read())["queries"] for f in files]
keys = sorted(qs[0])
med = {k: sorted(q[k] for q in qs)[1] for k in keys}
total = round(sum(med.values()), 3)
out = {"metric":"total","value":total,"unit":"sec",
       "queries":{k: med[k] for k in keys},
       "source":"per-query median of bench_local_r14{a,b,c}.json (three idle 3-run benches, 9 runs/query, 100-query registry, loadavg-gated)",
       "sf":"/root/testdata/sf0.1"}
open('bench_local_r14.json','w').write(json.dumps(out, separators=(',',':'))+"\n")
print(f"[r14] combined total: {total}s")
EOF

log "mint certificate from the combined medians (25% band + 0.5s floor)"
$JAVA -cp "$CP" graft.tools.BenchCertify \
  bench_local_r14.json bench_certificate.json 2>&1 | tail -1
log "DONE"
