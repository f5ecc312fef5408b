#!/bin/bash
# r11: extend the sf1/sf10 oracle-parity ladder with the text family and
# the round-11 queries (each already hash-green at sf0.001/0.01/0.1 and,
# where tractable, sf100). Budgeted DuckDB replay (900 s/query).
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
QS=gopher_quality_rules,tfidf_top_terms,word_count_docs,lift_gains_deciles,interarrival_profile,bucketed_q18_large_volume,hll_distinct_shingles
for SF in target/scale/sf1 target/scale/sf10; do
  OUT=target/scale/verify_r11_$(basename $SF)
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>/dev/null
  python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$QS"
done
echo R11_MID_DONE
