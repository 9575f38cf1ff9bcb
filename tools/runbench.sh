#!/bin/bash
# Exclusive fresh-JVM bench sweep at sf0.1 (the driver's protocol:
# local[32], best-of-2 per query). Run on a QUIET host — the two
# forced-distributed proof rows (g_articulation_dist/g_bridges_dist)
# inflate 2-3x if the sweep follows a CPU-saturating job (bench notes
# r11 §4 documents the variance class).
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
exec java $ADDOPENS -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
