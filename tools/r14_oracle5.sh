#!/bin/bash
# Round-14 sf100 stage 5: the scaled SemDeDup decision — full Spark run
# (the keep-list output is linear; the 200M-candidate rerank stays
# internal) + budgeted full oracle (expected bound) + slice value gate.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle5.out
ERR=target/scale/r14_oracle5.err

: > "$LOG"; : > "$ERR"
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=semantic_dedup_scaled,semantic_dedup_scaled_slice \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R14_SPARK_FAIL" >> "$LOG"; exit 1; }
python3 tools/oracle_budget.py "$SF" "$OUT" 1800 semantic_dedup_scaled_slice >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
python3 tools/oracle_budget.py "$SF" "$OUT" 900 semantic_dedup_scaled >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
echo R14_STAGE5_DONE >> "$LOG"
echo R14_STAGE5_DONE
