#!/bin/bash
# Run a graft main directly (bypasses sbt; same JVM opts as build.sbt).
# Usage: tools/run_main.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=$(ls -d target/scala-*/classes | head -1)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize=1g \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
