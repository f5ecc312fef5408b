#!/bin/bash
# Round-13 sf100 ledger stage 5 (makeup): replay the bucket-CC oracles
# with the list-based MinHash rewrite (DocQueries.bucketCcSql) — the
# CROSS JOIN perms explode was the measured disk kill for both the 10%
# slice (3 deaths, last at 225 s idle-box) and the full corpus (212 s).
# A single cheap Verify run refreshes oracle_sql.json with the new SQL
# (the Spark results for all three queries are already on disk); then
# the two replays get generous budgets.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle5.out
ERR=target/scale/r13_oracle5.err

: > "$LOG"; : > "$ERR"
rm -rf target/spark-tmp/*

# refresh oracle_sql.json only (cheapest registered query)
env SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY=nation_set_ops \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=8 \
/opt/spark/bin/spark-submit --master local[8] --driver-memory 16g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"

python3 tools/oracle_budget.py "$SF" "$OUT" 1800 dedup_components_slice10 >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
python3 tools/oracle_budget.py "$SF" "$OUT" 1800 dedup_components_bucket >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
# weighted CV-twin replay (CvTwinQueries r13 rewrite; Spark result
# landed in stage 4)
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 cv_grid_tree_select >> "$LOG" 2>&1
rm -rf target/spark-tmp/duck
echo R13_STAGE5_DONE >> "$LOG"
echo R13_STAGE5_DONE
