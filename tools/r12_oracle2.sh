#!/bin/bash
# Round-12 sf100 oracle-subset extension: 24 small-output
# aggregate/join/report queries not yet in the value-level sf100
# subset. All are shapes where BOTH engines stay tractable at 600M
# lineitem / 150M orders / 100M events / 50M docs (grouped aggregates,
# semi/anti joins, top-k reports, CUBE/ROLLUP, drift stats, one token
# explode). Each batch gets its own oracle_budget.py invocation so a
# slow oracle can't starve the rest; timeouts land as MEASURED bounds.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r12_ext_sf100
LOG=target/scale/r12_ext_oracle.out

A=null_counts_orders,describe_strings_orders,skew_kurtosis_discount,corr_pairs_lineitem,entropy_gini_returnflag,crosstab_flag_status
B=welch_ttest_totalprice,chi2_flag_status,benford_digit_audit,equal_width_bin_acctbal,quantile_bin_totalprice,stratified_split_counts
C=semi_big_orders,anti_customers_no_orders,q10_returned_revenue,q14_promo_revenue_monthly,sql_api_region_revenue,pivot_priority_status
D=rollup_region_nation_customers,cube_status_priority,events_dau_report,psi_drift_totalprice,jsd_source_unigrams,fd_violation_checks

env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$A,$B,$C,$D" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r12_ext.err

: > "$LOG"
for batch in "$A" "$B" "$C" "$D"; do
  python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$batch" >> "$LOG" 2>&1
done
echo R12_EXT_DONE >> "$LOG"
