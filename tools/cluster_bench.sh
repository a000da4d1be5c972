#!/bin/bash
# Cluster bench-of-record: 1 master + 2 standalone workers as child JVMs,
# then graft.ClusterBench times the mart + dedup + graph families and
# records per-query wall + shuffle read/write bytes (task-metrics
# listener) into BENCH_cluster.json. See the ClusterBench Scaladoc.
# Usage: tools/cluster_bench.sh [sfDir]
set -euo pipefail
SFDIR="${1:-/root/repo/testdata_sf1}"
cd /root/repo
JAR=$(ls target/scala-2.13/*.jar 2>/dev/null | head -1 || true)
if [ -z "$JAR" ]; then
  sbt -batch package >/dev/null
  JAR=$(ls target/scala-2.13/*.jar | head -1)
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

PIDS=()
cleanup() {
  # each daemon is setsid'd (its own process group, executors inherit
  # it), so killing the tracked groups reaps master+workers+executors
  # WITHOUT pkill patterns that would take down a concurrently running
  # second cluster (fault smoke / bench) as collateral
  for p in "${PIDS[@]:-}"; do kill -9 -- "-$p" 2>/dev/null || kill -9 "$p" 2>/dev/null || true; done
}
trap cleanup EXIT

# SPARK_HOME + SPARK_SCALA_VERSION: the Worker builds each executor's
# launch command from them (see cluster_fault_smoke.sh)
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
setsid java $ADD_OPENS -Xmx1g -cp "/opt/spark/jars/*" \
  -Dspark.ui.enabled=false \
  org.apache.spark.deploy.master.Master \
  --host 127.0.0.1 --port 7077 --webui-port 8091 \
  > /tmp/cbench_master.log 2>&1 &
PIDS+=($!)
sleep 3
for i in 1 2; do
  setsid java $ADD_OPENS -Xmx1g -cp "/opt/spark/jars/*" \
    -Dspark.ui.enabled=false \
    org.apache.spark.deploy.worker.Worker spark://127.0.0.1:7077 \
    --cores 8 --memory 24g --port 0 --webui-port $((8092 + i)) \
    --work-dir /tmp/cbench_worker_$i \
    > /tmp/cbench_worker_$i.log 2>&1 &
  PIDS+=($!)
done
sleep 3

GRAFT_XMX="${GRAFT_XMX:-12g}" tools/runmain.sh graft.ClusterBench \
  spark://127.0.0.1:7077 "$SFDIR" "/root/repo/$JAR"
