#!/usr/bin/env bash
# Real spark-submit entry (north_rule: "submitted via spark-submit to
# multi-executor clusters"): packages the engine jar and submits any of
# the mains (graft.Bench, graft.ScalingBench, graft.Verify,
# graft.MergeBench, graft.PlanDump) to the given master.
# Usage: tools/spark_submit.sh <mainClass> [master] [args...]
#   e.g. tools/spark_submit.sh graft.ScalingBench local[8] 8 64000000 bucketed
set -euo pipefail
MAIN="${1:?main class}"; shift
MASTER="${1:-local[8]}"; [ $# -gt 0 ] && shift
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | grep -v -- -tests | head -1)
exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
  --class "$MAIN" "$JAR" "$@"
