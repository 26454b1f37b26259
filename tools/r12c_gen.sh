#!/bin/bash
# Round-12c: regenerate the scale-ladder inputs (target/ was cleaned
# between sessions). Same recipe as round10_measure.sh: full schema x100
# -> sf10full; documents x1000 -> sf100.
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
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JAVA="java $ADDOPENS -Dspark.ui.enabled=false -Xmx48g -Xms48g"
export SPARK_GRAFT_CPUS=32
echo "[gen] sf10full (full schema x100)"; uptime
$JAVA -cp "$CP" graft.tools.ScaleUp /root/testdata/sf0.1 target/sf10full 100 2>/tmp/r12c_gen1.err
echo "[gen] sf100 (documents x1000)"; uptime
$JAVA -cp "$CP" graft.tools.ScaleUp /root/testdata/sf0.1 target/sf100 1000 documents 2>/tmp/r12c_gen2.err
echo "[gen] DONE"; uptime; du -sh target/sf10full target/sf100
