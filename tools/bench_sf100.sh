#!/bin/bash
# sf100 heavy-hitter bench: fresh-JVM single-rep batches (clean-run
# timings; REPEAT=1 because each batch is already a cold JVM and the
# numbers are compared as within-run relatives vs the sf10 sweep).
# Usage: tools/bench_sf100.sh <sfDir> <outLog>
set -u
SF=${1:-/root/repo/target/scale/sf100}
LOG=${2:-/root/repo/target/scale/bench_sf100.log}
JAR=/tmp/graft-classes.jar
. /root/repo/tools/scratch_guard.sh
B1=q1_pricing_summary,q3_top_order_revenue,q5_region_nation_revenue,q18_large_volume_customers,orders_monthly_counts
B2=scd2_customer_status_history,rolling_user_features,events_hourly,sessionize_native,asof_native_exec,interval_join_bucketed,skew_salted_join
B3=flagship_bin_label_dist,binning_design_lineitem,quantile_bin_totalprice,grouped_quantiles_returnflag,hist_quantile_totalprice,hist_quantile_merge_check
B4=exact_dedup_prefix,simhash_docs,cms_heavy_hitters_tokens,minhash_estimate_error,mixing_temperature_langs,gopher_quality_rules,tfidf_top_terms
B5=dedup_components_bucket,span_dedup_coverage
B6=ivf_ann_topk_vec0,pq_ann_topk_vec0,embedding_assign_centroid
B7=hll_distinct_shingles
B8=events_hourly_stream,sessionize_stream,hll_users_stream,dedup_distinct_stream,events_sliding_stream,interval_join_stream,cms_heavy_hitters_stream
for B in $B1 $B2 $B3 $B4 $B5 $B6 $B7 $B8; do
  echo "=== batch $B ===" >> "$LOG"
  scratch_guard 30 >> "$LOG" 2>&1 || { echo "ABORT_DISK" >> "$LOG"; exit 1; }
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
  SPARK_GRAFT_ONLY="$B" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench "$JAR" 2>/dev/null \
    | grep '"metric"' >> "$LOG"
done
echo ALLDONE >> "$LOG"
