#!/bin/bash
# Round-14 sf100 evidence for the new queries (VERDICT r13 tasks 1/2/4):
#   - component-label dedup twins (dedup_drop_components,
#     dedup_keep_best_components, incremental_dedup_components)
#   - corpus-scaled embedding near-dup (embedding_near_dup_scaled)
#   - the two exact truth slices (pack_greedy_slice, ngram_jaccard_slice)
# Spark side first (one Verify per batch), then budgeted DuckDB replays.
# Scratch hygiene is mechanized (task 5): free-disk check + spill wipe
# before every batch and between spill-heavy replays.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r14_sf100
LOG=target/scale/r14_oracle.out
ERR=target/scale/r14_oracle.err

: > "$LOG"; : > "$ERR"

run_batch () {
  local qs=$1 budget=$2 tag=$3
  scratch_guard 30 >> "$LOG" 2>&1 || { echo "R14_ABORT_DISK_$tag" >> "$LOG"; exit 1; }
  echo "=== spark $tag $(date +%T) ===" >> "$ERR"
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$qs" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R14_SPARK_FAIL" >> "$LOG"; exit 1; }
  echo "=== oracle $tag $(date +%T) ===" >> "$ERR"
  for q in ${qs//,/ }; do
    python3 tools/oracle_budget.py "$SF" "$OUT" "$budget" "$q" >> "$LOG" 2>&1
    rm -rf target/spark-tmp/duck
  done
}

# batch 1: the dedup component twins — shares the star-edge/CC chain
# in ONE Verify session (memoized), replays are the iterative-CC oracle
run_batch dedup_drop_components,dedup_keep_best_components,incremental_dedup_components 1800 T1

# batch 2: the truth slices (prefix recursion / contiguous-range pairs)
run_batch pack_greedy_slice,ngram_jaccard_slice 1800 T4

# batch 3: corpus-scaled near-dup at 2M vectors (p grows to 16 here)
run_batch embedding_near_dup_scaled 1800 T2

echo R14_STAGE1_DONE >> "$LOG"
echo R14_STAGE1_DONE
