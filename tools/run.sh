#!/bin/bash
# Run a graft main class against the local Spark jars (same JVM flags the
# driver uses via build.sbt javaOptions).
# GRAFT_CLASSES overrides the class dir — point it at a snapshot copy to
# run long sweeps concurrently with recompiles (sbt swaps class files
# under a live JVM otherwise).
CLASS="$1"; shift
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_SPARK_OPTS: extra -Dspark.* system properties (SparkConf picks
# them up) — lets probes try runtime-filter/AQE settings without edits.
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_SPARK_OPTS:-} \
  -Xmx${GRAFT_XMX:-8g} \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$CLASS" "$@"
