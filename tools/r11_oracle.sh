#!/bin/bash
# Round-11 sf100 oracle-subset extension: (a) the text family the r10
# verdict asked for (gopher / tfidf / word-count — single-pass
# aggregations DuckDB should replay within budget), (b) the two newly
# de-globalized queries (lift deciles, interarrival), (c) bucketed q18,
# (d) a budgeted attempt at hll_distinct_shingles' oracle (it re-hashes
# every shingle OCCURRENCE — the Spark side dedupes first — so this may
# land as a measured bound like r10's bucket-CC).
# Usage: tools/r11_oracle.sh
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r11_sf100
QS=gopher_quality_rules,tfidf_top_terms,word_count_docs,lift_gains_deciles,interarrival_profile,bucketed_q18_large_volume,hll_distinct_shingles

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r11_oracle.err

# cheap/medium oracles: plain sequential replay, 1500 s budget each
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 \
  gopher_quality_rules,tfidf_top_terms,word_count_docs,lift_gains_deciles,bucketed_q18_large_volume
# the two risky ones get their own (identical) budget so an early
# timeout doesn't starve the rest
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 interarrival_profile
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 hll_distinct_shingles
echo R11_ORACLE_DONE
