#!/bin/bash
set -u
LOG=/root/repo/target/scale/bench_sf100_multifile.log
: > "$LOG"
EV=events_hourly,sessionize_native,asof_native_exec,interval_join_bucketed,rolling_user_features
echo "=== multifile, default config ===" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/repo/target/scale/sf100 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
SPARK_GRAFT_ONLY="$EV" \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench /tmp/graft-classes.jar 2>/dev/null | grep '"metric"' >> "$LOG"
echo "=== multifile, 256 shuffle partitions ===" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/repo/target/scale/sf100 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_ONLY="$EV" \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench /tmp/graft-classes.jar 2>/dev/null | grep '"metric"' >> "$LOG"
echo LAYOUTDONE >> "$LOG"
