#!/bin/bash
# Round-12 sf100 truth-slice oracle runs (VERDICT r11 tasks 4 + 7):
# Spark Verify dumps the three slice queries at sf100, then the DuckDB
# differential check replays their oracles — value-level sf100 evidence
# for the three families whose FULL oracles disk-killed DuckDB
# (gopher 323.5 s, HLL shingles 457.6 s, bucket-CC 373 s / 57 GB).
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r12_slice_sf100
QS=gopher_rules_slice,hll_shingles_slice,dedup_components_slice

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r12_oracle.err

/usr/bin/time -v python3 tools/check_parity.py "$SF" "$OUT" \
  > target/scale/r12_oracle.out 2> target/scale/r12_oracle.time
echo "r12_oracle done" >> target/scale/r12_oracle.out
