#!/bin/bash
# sf100 oracle-parity subset: queries where BOTH engines stay tractable
# at 600M lineitem rows (no quadratic dedup chains, no 100M-row window
# sorts in DuckDB). Extends the oracle-agreement ladder to sf100.
# Usage: tools/oracle_sf100.sh <sfDir> <outDir>
set -u
SF=${1:-/root/repo/target/scale/sf100}
OUT=${2:-/root/repo/target/scale/verify_sf100}
JAR=/tmp/graft-classes.jar
QS=q1_pricing_summary,q3_top_order_revenue,q5_region_nation_revenue,q18_large_volume_customers,orders_monthly_counts,value_counts_priority,exact_dedup_prefix,hist_quantile_totalprice,hist_quantile_merge_check,grouped_quantiles_returnflag,flagship_bin_label_dist,asof_native_exec,interval_join_bucketed,skew_salted_join,mixing_temperature_langs,cms_heavy_hitters_tokens,minhash_estimate_error,events_hourly,sessionize_native,union_concat_acctbal,events_hourly_stream,sessionize_stream,hll_users_stream,dedup_distinct_stream,pareto_revenue_deciles,rfm_segments,session_duration_profile,token_budget_curve,zorder_layout_orders,bucketed_q5_region_revenue
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>/dev/null
python3 tools/check_parity.py "$SF" "$OUT" 2>&1 | grep -v "no spark result"
