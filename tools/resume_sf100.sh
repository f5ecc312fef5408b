#!/bin/bash
set -u
cd /root/repo
LOG=target/scale/bench_sf100.log
run() {
  SPARK_GRAFT_SF_DIR=/root/repo/target/scale/sf100 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
  SPARK_GRAFT_ONLY="$1" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench /tmp/graft-classes.jar 2>/dev/null \
    | grep '"metric"' >> "$LOG"
}
echo "=== batch dedup_components_bucket,span_dedup_coverage ===" >> "$LOG"
run dedup_components_bucket,span_dedup_coverage
echo "=== batch ivf_ann_topk_vec0,pq_ann_topk_vec0,embedding_assign_centroid ===" >> "$LOG"
run ivf_ann_topk_vec0,pq_ann_topk_vec0,embedding_assign_centroid
echo "=== batch hll_distinct_shingles ===" >> "$LOG"
run hll_distinct_shingles
echo B5B6B7DONE >> "$LOG"
