#!/bin/bash
# Round-13 sf100 ledger, stage 2: the queries whose Spark-side cost at
# sf100 is NOT known-linear — verified-pair LSH dedup (quadratic in
# duplicate mass), coarse-bucket embedding near-dup (16 buckets over 5M
# vectors), the tree/CV training family (fits over 600M rows), and the
# new bucket-CC slices. Each gets its OWN timeout-wrapped Verify
# invocation so one intractable plan can't starve the rest; a Spark
# timeout is recorded by the ledger as a measured bound
# (no_spark_result + the wall-clock in r13_oracle2.err).
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle2.out
ERR=target/scale/r13_oracle2.err

D="minhash_lsh_candidates near_dup_lsh_pruned dedup_clusters_lsh dedup_keep_best dedup_drop_list dedup_threshold_sweep lsh_quality_report embedding_near_dup_pairs semantic_dedup_keep dedup_components_slice10 dedup_components_bucket"
F="binning_design_lineitem tree_train_binned_confusion tree_proba_auc tree_path_counts tree_feature_importance tree_train_confusion rf_bagged_vote_confusion cv_grid_tree_select"

: > "$LOG"; : > "$ERR"
for q in $D $F; do
  echo "=== spark $q $(date +%T) ===" >> "$ERR"
  timeout 1500 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"
  rc=$?
  echo "=== spark $q rc=$rc $(date +%T) ===" >> "$ERR"
  if [ $rc -eq 0 ] && [ -d "$OUT/$q" ]; then
    python3 tools/oracle_budget.py "$SF" "$OUT" 1200 "$q" >> "$LOG" 2>&1
  else
    echo "$q {\"status\": \"error\", \"err\": \"spark timeout/abort rc=$rc (1500 s cap)\"}" >> "$LOG"
  fi
done
echo R13_STAGE2_DONE >> "$LOG"
echo R13_STAGE2_DONE
