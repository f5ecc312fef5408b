#!/bin/bash
# Warm (REPEAT=2) zorder ladder — the r12_scale.sh cold pass runs one
# query per fresh JVM, so sf1/sf10 timings are dominated by Spark
# startup; rep 2 in the same JVM strips it (Bench reports the last rep).
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r12_scale.log

run() {
  local sf=$1 qs=$2; shift 2
  echo "=== warm $sf :: $qs ===" >> "$LOG"
  env SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=2 \
    SPARK_GRAFT_RETHROW=1 SPARK_GRAFT_ONLY="$qs" "$@" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench "$JAR" 2>>"$LOG.err" \
    | grep '"metric"' >> "$LOG"
}

run target/scale/sf1   zorder_layout_orders
run target/scale/sf10  zorder_layout_orders
run target/scale/sf100 zorder_layout_orders SPARK_GRAFT_SHUFFLE_PARTITIONS=256
echo "r12_scale warm done" >> "$LOG"
