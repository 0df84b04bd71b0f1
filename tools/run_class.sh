#!/bin/bash
# Run a compiled graft main class directly against the Spark jars, bypassing
# sbt (no project-lock contention with a concurrent `sbt test`, no sbt
# startup cost). Mirrors build.sbt's forked-run JVM flags exactly.
# Usage: tools/run_class.sh [-mem 8g] graft.ScaleGen arg1 arg2 ...
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
if [ "${1:-}" = "-mem" ]; then MEM="$2"; shift 2; fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# SPARK_EXTRA_JAVA_OPTS: extra -D flags (SparkConf picks up spark.* system
# properties), e.g. the sf100 spill A/B's
#   SPARK_EXTRA_JAVA_OPTS=-Dspark.sql.adaptive.coalescePartitions.initialPartitionNum=512
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_EXTRA_JAVA_OPTS:-} \
  -Xmx"$MEM" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
