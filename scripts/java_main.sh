#!/usr/bin/env bash
# Run a graft main directly with java (no sbt lock, no sbt startup):
#   scripts/java_main.sh graft.Bench [args...]
# Mirrors build.sbt's forked-run JVM flags (add-opens, heap, UTC, no UI).
# Requires target/scala-2.13/classes to be current (sbt -batch compile).
set -euo pipefail
CLASSES="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes"
CP="$CLASSES:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "$CP" "$@"
