#!/bin/bash
# Round-12 ANN recall-audit sf10 timings (VERDICT r11 task 3) plus
# sf10 oracle parity for the two new recall queries.
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r12_scale.log

echo "=== target/scale/sf10 :: ann recalls ===" >> "$LOG"
env SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPEAT=1 SPARK_GRAFT_RETHROW=1 \
  SPARK_GRAFT_ONLY=ann_recall_pq_vec0,ann_recall_sign_vec0,ann_recall_ivf_vec0 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>"$LOG.err" \
  | grep '"metric"' >> "$LOG"

env SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=ann_recall_pq_vec0,ann_recall_sign_vec0 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" target/scale/sf10 \
  target/scale/verify_r12_ann_sf10 2>>target/scale/r12_ann.err
python3 tools/check_parity.py target/scale/sf10 \
  target/scale/verify_r12_ann_sf10 2>&1 \
  | grep -E "ann_recall_(pq|sign)" >> target/scale/r12_oracle.out
echo "r12_ann done" >> target/scale/r12_oracle.out
