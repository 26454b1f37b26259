#!/bin/bash
# Round-13 mint: ran twice this round (standing rule: any registry
# growth re-mints the certificate from quiet local bench medians).
# Cycle 1 (tags a/b/c): registry 98 — q95–q98 had landed at the end of
# round 12 WITHOUT a re-mint, leaving the gate blind (round-12 verdict
# #1). Cycle 2 (tags d/e/f): registry 99 — q99_bm25_indexed (the
# persisted-postings search) registered late in round 13.
#
# This round's host phase carried rotating per-query weather (totals
# 86/78/69 s across three back-to-back idle benches, median per-query
# ratio vs r12 = 1.08 with DIFFERENT 3–7× outliers each run), so the
# committed medians artifact bench_local_r13.json is the PER-QUERY
# MEDIAN across three idle 3-run benches (a/b/c — 9 runs per query,
# the reference's median-of-repeats policy scaled to the weather band);
# the three raw artifacts are committed alongside. The certificate is
# minted from the combined medians at the round-13 band: 25% relative
# + 0.5 s absolute floor (see BenchCertificate scaladoc for the
# rationale; replaces the pure-50% band of rounds 6–12).
#
# set -e (round-12 advice): a failed bench run must NOT fall through to
# BenchCertify and mint from a stale/partial artifact; each bench JSON
# must exist and parse before combining.
set -eu
cd /root/repo
log() { echo "[r13] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin7:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xms16g"
export SPARK_GRAFT_CPUS=32

check_json() {  # fail loudly if a bench artifact is missing or unparseable
  python3 - "$1" <<'EOF'
import json, sys
with open(sys.argv[1]) as f:
    d = json.loads(f.read())
n = len(d["queries"])
assert n >= 99, f"expected >=99 queries, got {n}"
assert not d.get("errors"), f"bench errors: {d.get('errors')}"
print(f"[r13] {sys.argv[1]}: {n} queries, total {d['value']}s — OK")
EOF
}

for tag in d e f; do
  log "idle 3-run local bench ($tag)"
  uptime
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_OUT=bench_local_r13$tag.json \
    $JAVA -cp "$CP" graft.Bench 2>/tmp/r13_bench_$tag.err | tail -1
  check_json bench_local_r13$tag.json
done

log "combine: per-query median across d/e/f -> bench_local_r13.json"
python3 - <<'EOF'
import json
files = ['bench_local_r13d.json','bench_local_r13e.json','bench_local_r13f.json']
qs = [json.loads(open(f).read())["queries"] for f in files]
keys = sorted(qs[0])
med = {k: sorted(q[k] for q in qs)[1] for k in keys}
total = round(sum(med.values()), 3)
out = {"metric":"total","value":total,"unit":"sec",
       "queries":{k: med[k] for k in keys},
       "source":"per-query median of bench_local_r13{d,e,f}.json (three idle 3-run benches, 9 runs/query, 99-query registry)",
       "sf":"/root/testdata/sf0.1"}
open('bench_local_r13.json','w').write(json.dumps(out, separators=(',',':'))+"\n")
print(f"[r13] combined total: {total}s")
EOF

log "mint certificate from the combined medians (25% band + 0.5s floor)"
$JAVA -cp "$CP" graft.tools.BenchCertify \
  bench_local_r13.json bench_certificate.json 2>&1 | tail -1
log "DONE"
