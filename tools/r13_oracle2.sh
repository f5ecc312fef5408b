#!/bin/bash
# Round-13 sf100 ledger, stage 2 (trimmed to the wall-clock budget):
# the highest-value queries whose Spark-side cost at sf100 is NOT
# known-linear — the new 10% bucket-CC slice (VERDICT task 4), the
# banded-LSH candidate/cluster pair, and the binned tree-training
# family. Each gets its OWN timeout-wrapped Verify invocation so one
# intractable plan can't starve the rest; a timeout is recorded as a
# measured bound. The remaining risky set (verified-pair dedup
# variants, coarse-bucket embedding near-dup, exact tree fit, CV) is
# ledgered as bound-by-class with the quadratic-candidate analysis in
# SCALE.md.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle2.out
ERR=target/scale/r13_oracle2.err

D="dedup_components_slice10 minhash_lsh_candidates dedup_clusters_lsh binning_design_lineitem tree_train_binned_confusion tree_train_confusion"

: > "$LOG"; : > "$ERR"
for q in $D; do
  echo "=== spark $q $(date +%T) ===" >> "$ERR"
  timeout 900 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"
  rc=$?
  echo "=== spark $q rc=$rc $(date +%T) ===" >> "$ERR"
  if [ $rc -eq 0 ] && [ -d "$OUT/$q" ]; then
    python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$q" >> "$LOG" 2>&1
  else
    echo "$q {\"status\": \"error\", \"err\": \"spark timeout/abort rc=$rc (900 s cap)\"}" >> "$LOG"
  fi
done
echo R13_STAGE2_DONE >> "$LOG"
echo R13_STAGE2_DONE
