#!/bin/bash
# Round-15 mint, step 3 — FINAL: the q98 doc-exchange pin (a default-plan
# change, standing rule: re-mint) landed after the first mint, so the
# certificate must come from cycles on the FINAL binary; mixing cycles
# across binaries would certify a plan mix nothing ships. Protocol:
# three loadavg-gated 3-run cycles (e, f, g) + the r15_mint2.sh
# contended-cycle rule (a cycle whose total exceeds the minimum's by
# >15% is contended; up to TWO replacement cycles h, i; combine
# per-query medians over the three quietest-by-total — mechanical, no
# per-query selection). All cycle artifacts stay committed.
set -eu
cd /root/repo
log() { echo "[r15m3] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r15bin:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
export SPARK_GRAFT_CPUS=32

LOAD_GATE="${SPARK_GRAFT_MINT_MAX_LOAD:-4.0}"
require_idle() {
  for i in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $LOAD_GATE else 0)")
    [ "$ok" = "1" ] && { log "idle gate: loadavg $load < $LOAD_GATE"; return 0; }
    log "idle gate: loadavg $load >= $LOAD_GATE — waiting ($i/60)"
    sleep 30
  done
  log "idle gate: host never went idle — REFUSING"
  exit 2
}

run_cycle() {
  require_idle
  log "idle 3-run local bench ($1)"
  uptime
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_OUT=bench_local_r15$1.json \
    $JAVA -cp "$CP" graft.Bench 2>/tmp/r15_bench_$1.err | tail -1
}

require_idle
log "pre-build the sf0.1 q99/q100 index on the final binary (outside cycles)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_ONLY=q99_bm25_indexed,q100_tfidf_indexed \
  SPARK_GRAFT_BENCH_OUT=/tmp/r15_prebuild3.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r15_prebuild3.err | tail -1

for tag in e f g; do run_cycle $tag; done

# contended-cycle replacements (mechanical rule, bounded at two)
python3 - <<'EOF' > /tmp/r15_contended
import json
tags = ['e','f','g']
tot = {t: json.loads(open(f'bench_local_r15{t}.json').read())['value'] for t in tags}
lo = min(tot.values())
print(len([t for t in tags if tot[t] > lo * 1.15]))
EOF
NEED=$(cat /tmp/r15_contended)
log "contended cycles among e/f/g: $NEED"
[ "$NEED" -ge 1 ] && run_cycle h
[ "$NEED" -ge 2 ] && run_cycle i

log "combine: quietest 3 by total -> bench_local_r15.json"
python3 - <<'EOF'
import json, os
tags = [t for t in ['e','f','g','h','i']
        if os.path.exists(f'bench_local_r15{t}.json')]
data = {t: json.loads(open(f'bench_local_r15{t}.json').read()) for t in tags}
totals = {t: round(data[t]['value'], 3) for t in tags}
keep = sorted(tags, key=lambda t: totals[t])[:3]
print(f"[r15m3] totals: {totals}; keeping {keep}")
qs = [data[t]['queries'] for t in keep]
keys = sorted(qs[0])
med = {k: sorted(q[k] for q in qs)[1] for k in keys}
total = round(sum(med.values()), 3)
out = {"metric":"total","value":total,"unit":"sec",
       "queries":{k: med[k] for k in keys},
       "source":"per-query median of the 3 quietest-by-total loadavg-gated 3-run benches on the final r15 binary (bench_local_r15{e..i}.json; >1.15x-min cycles replaced mechanically)",
       "sf":"/root/testdata/sf0.1"}
open('bench_local_r15.json','w').write(json.dumps(out, separators=(',',':'))+"\n")
print(f"[r15m3] combined total: {total}s")
EOF

log "drift watch (r14 verdict #6): q27/q91/q93 vs the r14 certificate"
python3 - <<'EOF'
import json
new = json.loads(open('bench_local_r15.json').read())["queries"]
cert = json.loads(open('bench_certificate.json.r14bak').read())["queries"]
for q in ["q27_ngram_jaccard", "q91_canonical_keep", "q93_edit_neardup"]:
    print(f"[r15m3] drift-watch {q}: r15 median {new[q]} vs r14 cert {cert[q]} "
          f"(ratio {new[q]/cert[q]:.2f})")
EOF

log "mint certificate from the combined medians"
$JAVA -cp "$CP" graft.tools.BenchCertify \
  bench_local_r15.json bench_certificate.json 2>&1 | tail -1
log "DONE"
