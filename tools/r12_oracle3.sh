#!/bin/bash
# Round-12 sf100 oracle-subset extension, batch 2: drift/daily/monthly
# report shapes, sketch-overlap proofs, the full graph family (tiny
# node-level outputs after a q5-shaped edge build over 600M lineitem),
# and the five stream twins not yet value-verified at sf100. Budgeted
# per batch; timeouts land as measured bounds.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r12_ext2_sf100
LOG=target/scale/r12_ext2_oracle.out

E=mad_outliers_totalprice,ks_drift_totalprice,cusum_changepoint_daily,revenue_autocorr_daily,seasonality_index_monthly,revenue_growth_monthly
F=new_vs_repeat_revenue_monthly,retention_cohorts_weekly,trending_types_daily,hhi_supplier_concentration,ols_price_on_quantity,mutual_info_priority_status
G=woe_iv_priority,correlated_above_avg_orders,skyline_parts_size_price,join_size_profile,schema_drift_report,k_anonymity_check
H=distinct_estimate_tokens,cms_shard_merge_check,hll_overlap_custkeys,kmv_overlap_custkeys,hll_sliding_users_6h,props_json_stats
I=pagerank_nation_trade,pagerank_nation_weighted,triangles_nation_trade,kcore_nation_trade,adamic_adar_trade_links,bfs_hops_nation_trade,label_prop_communities,trade_balance_nation
J=events_sliding_stream,events_dau_stream,latest_status_stream,funnel_stream,dedup_within_watermark_stream

env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$E,$F,$G,$H,$I,$J" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r12_ext2.err

: > "$LOG"
for batch in "$E" "$F" "$G" "$H" "$I" "$J"; do
  python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$batch" >> "$LOG" 2>&1
done
echo R12_EXT2_DONE >> "$LOG"
