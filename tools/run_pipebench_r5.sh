#!/usr/bin/env bash
# Round-5 pipeline-family evidence at 10x the r4 corpus (r4 verdict next-#8).
# Pass A: non-pair-explosive families at 10M docs/vectors.
# Pass B: cosine self-join at 4M vectors (the pair-explosive family; at 10M
#         its candidate shuffle needs >60G spill and overruns the sandbox
#         /tmp quota — 4M is the largest level that fits alongside inputs).
# Runs from a CLASSES SNAPSHOT so sbt stays free (CLAUDE.md detached-bench
# rule); launch under setsid so it survives the controlling session.
set -uo pipefail
CLS="${1:-/tmp/graft_classes_r5}"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED --enable-native-access=ALL-UNNAMED"
rm -f /tmp/pipebench_r5_results.jsonl
java $OPENS -Xmx60g -cp "$CLS:/opt/spark/jars/*" graft.PipelineBench \
  10000000 10000000 32 exact,minhash,simhash,ivf,kmeans,repetition,keywords,contamination \
  > /tmp/pipebench_10m_a.log 2>&1
sync
java $OPENS -Xmx60g -cp "$CLS:/opt/spark/jars/*" graft.PipelineBench \
  4000000 4000000 32 cosine \
  > /tmp/pipebench_4m_b.log 2>&1
grep -hE '^\{"bench"' /tmp/pipebench_10m_a.log /tmp/pipebench_4m_b.log > /tmp/pipebench_r5_results.jsonl
echo DONE >> /tmp/pipebench_r5_results.jsonl
