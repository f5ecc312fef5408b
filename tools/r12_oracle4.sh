#!/bin/bash
# Round-12 sf100 extension, batch 3: the three scale-fixed queries
# (seasonality decimal128, autocorr decimal128, latest-status
# foreachBatch sink) plus the four entries the batch-2 script crashes
# skipped (revenue_growth, funnel/watermark streams, hhi — whose oracle
# hit transient disk pressure from a concurrent run).
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r12_ext3_sf100
LOG=target/scale/r12_ext3_oracle.out

K=seasonality_index_monthly,revenue_growth_monthly,revenue_autocorr_daily,latest_status_stream,funnel_stream,dedup_within_watermark_stream
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$K,hhi_supplier_concentration" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r12_ext3.err

: > "$LOG"
python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$K" >> "$LOG" 2>&1
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 hhi_supplier_concentration >> "$LOG" 2>&1
echo R12_EXT3_DONE >> "$LOG"
