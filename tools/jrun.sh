#!/bin/bash
# Run a graft main class directly on the compiled classes — no sbt lock, no
# sbt startup latency. Mirrors build.sbt's fork options (JDK-17 add-opens,
# ParallelGC, SPARK_DRIVER_MEM). Compile first: sbt -batch compile.
# Usage: tools/jrun.sh graft.Bench [args...]
set -eu
cd "$(dirname "$0")/.."
CLS=target/scala-2.13/classes
[ -d "$CLS" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-12g}" -XX:+UseParallelGC \
  -cp "$CLS:/opt/spark/jars/*" "$@"
