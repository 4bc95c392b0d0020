#!/bin/bash
# Run a graft main class outside sbt (so it can run concurrently with tests).
# Usage: tools/run_graft.sh [-XmxNN] <mainClass> [args...]
set -e
cd "$(dirname "$0")/.."
MEM=8g
if [[ "$1" == -Xmx* ]]; then MEM="${1#-Xmx}"; shift; fi
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx$MEM $ADD_OPENS -cp "$CP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@"
