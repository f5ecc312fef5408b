#!/bin/bash
# Round-13 sf100 ledger stage 4: the remaining evidence classes.
#
# Phase 1 — binned-tree eval family: tree_feature_importance /
#   tree_proba_auc / tree_path_counts share ONE memoized binned fit per
#   Verify session (TreeQueries.model TrieMap), so the group costs one
#   fit + three cheap evals; each oracle replays the 3-level trainer.
# Phase 2 — full-corpus dedup_components_bucket: the star-edge CC's
#   Spark side is linear (edges bounded by bands x corpus) and the
#   oracle's quadratic reach CTE is now the iterative min-label
#   propagation — first full-corpus (5M-doc) value attempt since the
#   r10 disk kill.
# Phase 3 — budgeted BOUND measurements on a clean box for the classes
#   expected to be intractable by construction, so the ledger records
#   a measured attempt instead of a stale disk-pressure artifact:
#   - verified-pair MinHash chain (minhash_lsh_candidates; its bound
#     covers dedup_clusters_lsh / dedup_keep_best, which consume the
#     same memoized frame and cannot start until it materializes)
#   - 4-plane sign-LSH embedding family (2M vectors / 16 buckets per
#     band -> C(125k,2)-scale candidate pairs per bucket: quadratic)
#   - seeded CV / RF fits (cv_grid_tree_select, rf_bagged_vote_confusion)
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle4.out
ERR=target/scale/r13_oracle4.err

: > "$LOG"; : > "$ERR"

spark_group () { # tag list cap
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

# ---- Phase 1: binned-tree eval family ----
# The trees Verify run also refreshes oracle_sql.json with the weighted
# (pre-aggregated) trainer replay, which is what makes these replays —
# and the tree_train_binned_confusion retry — tractable at 600M rows.
spark_group trees tree_feature_importance,tree_proba_auc,tree_path_counts 1800
oracle 1200 tree_feature_importance
oracle 1200 tree_proba_auc
oracle 1200 tree_path_counts
oracle 1200 tree_train_binned_confusion
# makeup: the stage-3 slice10 retry was disk-killed by a concurrent
# local spark run, not by its own footprint — replay on the idle box
oracle 1500 dedup_components_slice10

# ---- Phase 2: full-corpus bucket-CC ----
spark_group cc_full dedup_components_bucket 1800
oracle 1800 dedup_components_bucket

# ---- Phase 3: bound measurements ----
spark_group lsh_pairs minhash_lsh_candidates,dedup_clusters_lsh,dedup_keep_best 1200
oracle 1200 minhash_lsh_candidates,dedup_clusters_lsh,dedup_keep_best
spark_group emb_family embedding_near_dup_pairs,semantic_dedup_keep,near_dup_lsh_pruned 1500
oracle 1200 embedding_near_dup_pairs,semantic_dedup_keep,near_dup_lsh_pruned
spark_group cv_rf cv_grid_tree_select,rf_bagged_vote_confusion 2400
oracle 1200 cv_grid_tree_select
oracle 1200 rf_bagged_vote_confusion

echo R13_STAGE4_DONE >> "$LOG"
echo R13_STAGE4_DONE
