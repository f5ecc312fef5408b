#!/bin/bash
# Round-13 sf100 ledger stage 3: everything retryable now that the
# 55 GB of stale spill that poisoned stages 1-2 (Spark aborts, DuckDB
# temp-write failures, one OOM while the box was saturated) is cleared.
#
# Phase 1 — feasible spark runs, grouped by shared memoized chains
#   (simhashPairs3 serves simhash_hamming_pairs + dedup_drop_list;
#   allPairs05 [doc_id<500, constant-size] serves dedup_threshold_sweep
#   + lsh_quality_report), then budgeted oracle replays.
# Phase 2 — oracle-only retries for queries whose sf100 Spark results
#   already landed in stage 1/2: the disk-killed replays get the budget
#   their first attempt never had; pq/session get the escalated budgets
#   their families needed elsewhere.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle3.out
ERR=target/scale/r13_oracle3.err

: > "$LOG"; : > "$ERR"

spark_group () { # name list cap
  local tag=$1 list=$2 cap=$3
  echo "=== spark $tag [$list] cap=${cap}s $(date +%T) ===" >> "$ERR"
  rm -rf target/spark-tmp/*
  timeout "$cap" env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$list" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"
  local rc=$?
  echo "=== spark $tag rc=$rc $(date +%T) ===" >> "$ERR"
  for q in ${list//,/ }; do
    [ -d "$OUT/$q" ] || echo "$q {\"status\": \"error\", \"err\": \"spark failed/timeout rc=$rc (${cap} s cap)\"}" >> "$LOG"
  done
  rm -rf target/spark-tmp/*
}

oracle () { # budget list
  python3 tools/oracle_budget.py "$SF" "$OUT" "$1" "$2" >> "$LOG" 2>&1
  rm -rf target/spark-tmp/duck
}

# ---- Phase 1: feasible spark runs ----
spark_group p1 \
  incremental_dedup_shard,simhash_hamming_pairs,ngram_jaccard_adjacent,dedup_drop_list,dedup_threshold_sweep,lsh_quality_report \
  2400
oracle 1200 incremental_dedup_shard,simhash_hamming_pairs,dedup_threshold_sweep,lsh_quality_report
oracle 1500 ngram_jaccard_adjacent
oracle 1200 dedup_drop_list

# ---- Phase 2: oracle-only retries (Spark results already on disk) ----
oracle  900 mmr_diverse_top5
oracle 1200 tree_train_binned_confusion
oracle 1200 tree_train_confusion
oracle 1200 user_journeys
oracle 1500 dedup_components_slice10
oracle 1800 session_duration_slice
oracle 1800 pq_ann_topk_vec0
oracle 1800 pack_greedy_docs

echo R13_STAGE3_DONE >> "$LOG"
echo R13_STAGE3_DONE
