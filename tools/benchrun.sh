#!/bin/bash
# Direct-java Bench runner (no sbt lock, same JVM args as build.sbt's fork).
# Usage: tools/benchrun.sh <detail_out.json> [extra env via environment]
set -u
CP=$(cat /tmp/graft_cp.txt)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS ${GRAFT_EXTRA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -XX:ReservedCodeCacheSize=512m \
  -cp "$CP" "${GRAFT_MAIN:-graft.Bench}"
