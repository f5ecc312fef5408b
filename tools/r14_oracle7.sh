#!/bin/bash
# Round-14 sf100 stage 7: the DSIR importance-resampling family —
#   - dsir_select_top / dsir_gumbel_sample (full-corpus replays: the
#     hashed-gram frame is ~1B rows in DuckDB, so a disk/budget bound
#     is plausible; the Spark side is two linear passes + a 4096-row
#     broadcast model and should complete)
#   - dsir_select_slice (the 10% induced-subcorpus value gate)
#   - bpe_encode_ratio (the fit-then-transform twin of the stage-6
#     trainer; its replay adds one corpus-scale word join to the
#     2.8 s vocab chain)
# Spark side first (one Verify for all four), then budgeted replays.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle7.out
ERR=target/scale/r14_oracle7.err

: > "$LOG"; : > "$ERR"
QS=dsir_select_top,dsir_gumbel_sample,dsir_select_slice,bpe_encode_ratio
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
  || { echo R14_SPARK_FAIL >> "$LOG"; exit 1; }
for q in ${QS//,/ }; do
  scratch_require_gb 25 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
  python3 tools/oracle_budget.py "$SF" "$OUT" 1800 "$q" >> "$LOG" 2>&1
  rm -rf target/spark-tmp/duck
done
echo R14_STAGE7_DONE >> "$LOG"
echo R14_STAGE7_DONE
