#!/bin/bash
# Freeze the current compiled classes into the measurement classpath
# (target/r18bin) so bench cycles run one fixed binary via plain java.
set -euo pipefail
cd /root/repo
sbt -batch compile 2>&1 | tail -2
rm -rf target/r18bin
cp -r target/scala-2.13/classes target/r18bin
echo "[r18freeze] frozen $(find target/r18bin -name '*.class' | wc -l) classes"
