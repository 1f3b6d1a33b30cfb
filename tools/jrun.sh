#!/bin/bash
# Run a graft main on the compiled classes directly (no sbt lock) with the
# same JVM shape build.sbt gives forked runs. Usage: jrun.sh <MainClass> [args...]
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS $JRUN_EXTRA \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -XX:ReservedCodeCacheSize=512m \
  -cp "$CP" "$@"
