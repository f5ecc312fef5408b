#!/bin/bash
# Round-12 scale measurements:
#  (1) zorder_layout_orders sf100 re-measure after the DistRank guard
#      moved off the per-row path (r11 regression; pre-guard 37.6 s),
#      plus the sf1/sf10 rungs for the ladder.
#  (2) cms_heavy_hitters_stream under the bounded trigger
#      (SPARK_GRAFT_STREAM_MAX_FILES=1) at sf100 — trigger-time
#      stability of the fixed-state CMS stream (VERDICT r11 task 6).
# Fresh-JVM single-rep batches, same method as r10/r11_scale.sh.
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r12_scale.log

run() { # run <sfDir> <queries> [extra env as VAR=VAL pairs...]
  local sf=$1 qs=$2; shift 2
  echo "=== $sf :: $qs ===" >> "$LOG"
  env SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
    SPARK_GRAFT_RETHROW=1 SPARK_GRAFT_ONLY="$qs" "$@" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench "$JAR" 2>>"$LOG.err" \
    | grep '"metric"' >> "$LOG"
}

run target/scale/sf1   zorder_layout_orders
run target/scale/sf10  zorder_layout_orders
run target/scale/sf100 zorder_layout_orders SPARK_GRAFT_SHUFFLE_PARTITIONS=256
echo "r12_scale done" >> "$LOG"

