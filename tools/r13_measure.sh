#!/bin/bash
# Round-13 evidence chain — runs on the FROZEN binary target/r13bin2
# (copied from the committed 49b22f2 compile). Verdict-priority order
# (round-12 Next #3/#4):
#   1. Decade ladder for the six round-12 operators: q94–q98 at sf10full
#      (full schema ×100) and q95–q98 at sf100 (documents ×1000 — q94 is
#      embeddings-based and sf100 carries documents only; NAMED, not
#      silent). 2-run medians + metrics sidecars, the bench_q91q92_*
#      pattern.
#   2. q93's sf100 pipeline marginal variance (74.8 vs 133.9 s in
#      r12d with identical bytes): 3 idle interleaved rounds of the
#      q27→q81→q91→q93 memoized pipeline — same-phase cells adjudicate
#      host weather vs real stage cost.
#   3. q96 stopword-skew same-phase A/B (SkewPhase, 4M synthetic docs,
#      80M-term vocabulary): does AQE's skew split actually engage on
#      the term-keyed SMJ, and what does disabling it cost?
set -eu
cd /root/repo
log() { echo "[r13m] $(date +%H:%M:%S) $*"; }
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
CP="target/r13bin2:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_CPUS=32

log "1a/4 new-operator ladder at sf10full (q94-q98, 2-run medians)"
uptime
SPARK_GRAFT_SF_DIR=target/sf10full SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q94_knn_labels,q95_bm25_search,q96_tfidf_terms,q97_token_budget,q98_pmi_cooccur \
  SPARK_GRAFT_BENCH_OUT=bench_sf10full_newops_r13.json \
  $JAVA -Xmx32g -Xms32g -cp "$CP" graft.Bench 2>/tmp/r13_lad10.err | tail -1

log "1b/4 new-operator ladder at sf100 (q95-q98; q94 excluded: sf100 has documents only)"
uptime
SPARK_GRAFT_SF_DIR=target/sf100 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY=q95_bm25_search,q96_tfidf_terms,q97_token_budget,q98_pmi_cooccur \
  SPARK_GRAFT_BENCH_OUT=bench_sf100_newops_r13.json \
  $JAVA -Xmx64g -Xms64g -cp "$CP" graft.Bench 2>/tmp/r13_lad100.err | tail -1

log "2/4 q27->q81->q91->q93 memoized pipeline at sf100 (3 idle rounds)"
uptime
$JAVA -Xmx64g -Xms64g -cp "$CP" graft.tools.PipelinePhase \
  target/sf100 q27_ngram_jaccard,q81_dedup_clusters,q91_canonical_keep,q93_edit_neardup 3 \
  2>/tmp/r13_pipe.err | tee pipeline_q27q81q91q93_sf100_r13.txt

log "3/4 q96 stopword-skew same-phase A/B (4M docs, 80M-term vocab)"
uptime
SPARK_GRAFT_PHASE_RUNS=2 SPARK_GRAFT_SKEW_PLAN_OUT=skewplan_tfidf_4m_r13 \
  $JAVA -Xmx48g -Xms48g -cp "$CP" graft.tools.SkewPhase 4000000 \
  2>/tmp/r13_skew.err | tee skewphase_tfidf_4m_r13.txt

log "DONE"
uptime
