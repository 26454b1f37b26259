#!/bin/bash
# Round-12c chain 3 — banded-levenshtein q93 remeasure on frozen
# target/r12cbin4: the same q27->q81->q91->q93 sf100 pipeline as chain 2
# (comparator: q93 marginal 203.2/221.1 s unbanded).
set -u
cd /root/repo
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r12cbin4:/opt/spark/jars/*"
export SPARK_GRAFT_CPUS=32
echo "[r12c4] $(date +%H:%M:%S) pipeline q27->q81->q91->q93 sf100, banded q93"
uptime
java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx64g -Xms64g -cp "$CP" graft.tools.PipelinePhase target/sf100 \
  q27_ngram_jaccard,q81_dedup_clusters,q91_canonical_keep,q93_edit_neardup 2 \
  2>/tmp/r12c4_pipeline.err | tee pipeline_q27q81q91q93_sf100_r12c.txt
echo "[r12c4] DONE"; uptime
