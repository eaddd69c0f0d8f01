#!/bin/bash
# Run a graft main class directly against the compiled classes — no sbt
# (so probes can run while an sbt test/compile holds the build lock).
# Usage: tools/run_probe.sh [-cpus N] <mainClass> [args...]
# Mirrors build.sbt's forked-JVM options (add-opens, UTC, heap).
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/opt/spark/jars/*:target/scala-2.13/classes:target/scala-2.13/test-classes"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Duser.timezone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" -cp "$CP" "$@"
