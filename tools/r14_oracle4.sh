#!/bin/bash
# Round-14 sf100 stage 4: the ordered-ingestion standing gate at sf100 —
# engine-side ordered copy (8 range files), bounded trigger, watermarked
# stream-stream join, hash vs the batch oracle (proven at sf100 in r13).
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle4.out
ERR=target/scale/r14_oracle4.err

: > "$LOG"; : > "$ERR"
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=interval_join_ordered_stream \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 SPARK_GRAFT_STREAM_METRICS=1 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R14_SPARK_FAIL" >> "$LOG"; exit 1; }
grep -c "stream-metrics" "$ERR" >> "$LOG" || true
python3 tools/oracle_budget.py "$SF" "$OUT" 900 interval_join_ordered_stream >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
echo R14_STAGE4_DONE >> "$LOG"
echo R14_STAGE4_DONE
