#!/bin/bash
# Round-15 mint. Standing rule: any registry growth or default-plan
# change re-mints the certificate from quiet local bench medians
# (per-query median across three idle 3-run benches). This round the
# registry holds at 100, but q99/q100's serving path changed by default:
# the segmented index reads postings/stats through the manifest (stats
# is now a summed aggregate over per-segment rows) and q99/q100's index
# directory name gained a tag hash — both queries pay a fresh v3 build
# on this host's first run. The mint pre-builds that index OUTSIDE the
# measured cycles (one throwaway bench lap would also do, but an explicit
# pre-build keeps cycle (a) comparable to (b)/(c)).
#
# Self-defence carried from r14_mint.sh: refuse to run a bench cycle
# above loadavg 4.0 (poll 30 min, fail loudly) — the gate re-polls
# before EACH cycle.
set -eu
cd /root/repo
log() { echo "[r15] $(date +%H:%M:%S) $*"; }
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
print(f"[r15] {sys.argv[1]}: {n} queries, total {d['value']}s — OK")
EOF
}

require_idle
log "pre-build the sf0.1 q99/q100 index (one-time v3 build, outside cycles)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_ONLY=q99_bm25_indexed,q100_tfidf_indexed \
  SPARK_GRAFT_BENCH_OUT=/tmp/r15_prebuild.json \
  $JAVA -cp "$CP" graft.Bench 2>/tmp/r15_prebuild.err | tail -1

for tag in a b c; do
  require_idle
  log "idle 3-run local bench ($tag)"
  uptime
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_OUT=bench_local_r15$tag.json \
    $JAVA -cp "$CP" graft.Bench 2>/tmp/r15_bench_$tag.err | tail -1
  check_json bench_local_r15$tag.json
done

log "combine: per-query median across a/b/c -> bench_local_r15.json"
python3 - <<'EOF'
import json
files = ['bench_local_r15a.json','bench_local_r15b.json','bench_local_r15c.json']
qs = [json.loads(open(f).read())["queries"] for f in files]
keys = sorted(qs[0])
med = {k: sorted(q[k] for q in qs)[1] for k in keys}
total = round(sum(med.values()), 3)
out = {"metric":"total","value":total,"unit":"sec",
       "queries":{k: med[k] for k in keys},
       "source":"per-query median of bench_local_r15{a,b,c}.json (three idle 3-run benches, 9 runs/query, 100-query registry, loadavg-gated)",
       "sf":"/root/testdata/sf0.1"}
open('bench_local_r15.json','w').write(json.dumps(out, separators=(',',':'))+"\n")
print(f"[r15] combined total: {total}s")
EOF

log "drift watch (r14 verdict #6): q27/q91/q93 vs the r14 certificate"
python3 - <<'EOF'
import json
new = json.loads(open('bench_local_r15.json').read())["queries"]
cert = json.loads(open('bench_certificate.json').read())["queries"]
for q in ["q27_ngram_jaccard", "q91_canonical_keep", "q93_edit_neardup"]:
    print(f"[r15] drift-watch {q}: r15 median {new[q]} vs r14 cert {cert[q]} "
          f"(ratio {new[q]/cert[q]:.2f})")
EOF

log "mint certificate from the combined medians (25% band + 0.5s floor)"
$JAVA -cp "$CP" graft.tools.BenchCertify \
  bench_local_r15.json bench_certificate.json 2>&1 | tail -1
log "DONE"
