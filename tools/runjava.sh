#!/bin/bash
# Direct JVM launcher for graft mains — same flags as build.sbt's forked
# run (JDK17 add-opens, UTC, UI off), without sbt startup/lock overhead.
# Usage: tools/runjava.sh <mainClass> [args...]   (env passes through)
set -e
# derive the repo root from this script's location and glob the Scala
# version, so a moved checkout or a Scala bump doesn't silently launch
# with an empty classpath (ClassNotFoundException at runtime)
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$(ls -d "$REPO"/target/scala-*/classes 2>/dev/null | head -1)"
if [ -z "$CLASSES" ]; then
  echo "runjava.sh: no target/scala-*/classes under $REPO — run sbt compile first" >&2
  exit 1
fi
CP="$CLASSES:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
