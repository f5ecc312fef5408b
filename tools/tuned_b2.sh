#!/bin/bash
set -u
LOG=/root/repo/target/scale/bench_sf100_tuned.log
B2=scd2_customer_status_history,rolling_user_features,events_hourly,sessionize_native,asof_native_exec,interval_join_bucketed,skew_salted_join
echo "=== batch $B2 (rerun, fixed jar) ===" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/repo/target/scale/sf100 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_MAX_PARTITION_BYTES=33554432 \
SPARK_GRAFT_ONLY="$B2" \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench /tmp/graft-classes.jar 2>/dev/null \
  | grep '"metric"' >> "$LOG"
echo B2REDONE >> "$LOG"
