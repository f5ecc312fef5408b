#!/bin/bash
# Round-14 sf100 stage 6: the two late-round additions —
#   - bpe_merge_train (8-round BPE merge training; the corpus-scale part
#     is ONE word count, every round runs on the Heaps-bounded vocab)
#   - gram_novelty_sources (distinct trigram explode + min-doc_id join:
#     the shingle-family linear shape; the DuckDB replay re-derives the
#     full 1B-row gram frame, so a disk/budget bound is plausible there)
# Spark side first (one Verify for both), then budgeted DuckDB replays.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle6.out
ERR=target/scale/r14_oracle6.err

: > "$LOG"; : > "$ERR"
QS=bpe_merge_train,gram_novelty_sources,gram_novelty_slice
scratch_guard 30 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R14_SPARK_FAIL" >> "$LOG"; exit 1; }
for q in ${QS//,/ }; do
  scratch_require_gb 25 >> "$LOG" 2>&1 || { echo R14_ABORT_DISK >> "$LOG"; exit 1; }
  python3 tools/oracle_budget.py "$SF" "$OUT" 1800 "$q" >> "$LOG" 2>&1
  rm -rf target/spark-tmp/duck
done
echo R14_STAGE6_DONE >> "$LOG"
echo R14_STAGE6_DONE
