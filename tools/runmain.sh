#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (no project-lock contention with a parallel dev loop, and
# heap controlled via GRAFT_XMX). Usage: tools/runmain.sh <MainClass> [args...]
# Requires a prior `sbt compile`.
set -euo pipefail
XMX="${GRAFT_XMX:-8g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: optional extra JVM flags (e.g. a -Dspark.* conf for
# an A/B run — SparkConf absorbs spark.-prefixed system properties)
# GRAFT_CLASSDIR: run on a class snapshot instead of target/classes, so
# long background runs don't race a parallel compile loop
exec java -Xmx"$XMX" $ADD_OPENS ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSDIR:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
