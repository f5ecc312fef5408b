#!/bin/bash
# Round-14 sf100 stage 2: value evidence for the policy-twin SLICES
# (the full-corpus replays are measured DuckDB disk bounds — temp
# exhausted at 261.5 s / 217.0 s in stage 1 — same class as
# dedup_components_bucket; the slice CC oracle is proven at 109.7 s).
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle2.out
ERR=target/scale/r14_oracle2.err

: > "$LOG"; : > "$ERR"
QS=dedup_drop_components_slice10,dedup_keep_best_components_slice10
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R14_SPARK_FAIL" >> "$LOG"; exit 1; }
for q in ${QS//,/ }; do
  python3 tools/oracle_budget.py "$SF" "$OUT" 1800 "$q" >> "$LOG" 2>&1
  rm -rf target/spark-tmp/duck
done
echo R14_STAGE2_DONE >> "$LOG"
echo R14_STAGE2_DONE
