#!/bin/bash
# Round-13 sf100 ledger retries: the four stage-1 casualties — two
# Spark-side disk-full aborts (the box ran out of disk mid-batch before
# superseded verify dirs were cleared), one oracle-side disk-full, and
# the PQ top-k oracle 600 s timeout (the SQL replay runs 2 Lloyd
# iterations over 5M x 4 subvectors; give it the 1800 s budget its
# recall twin needed).
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle3.out
ERR=target/scale/r13_oracle3.err

SPARK_RETRY=incremental_dedup_shard,simhash_hamming_pairs,ngram_jaccard_adjacent
: > "$LOG"; : > "$ERR"
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$SPARK_RETRY" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"

python3 tools/oracle_budget.py "$SF" "$OUT" 900 \
  "$SPARK_RETRY,mmr_diverse_top5" >> "$LOG" 2>&1
python3 tools/oracle_budget.py "$SF" "$OUT" 1800 pq_ann_topk_vec0 >> "$LOG" 2>&1
# slice10 CC: Spark result landed in stage 2; its oracle died only on
# disk (DuckDB temp vs 25G of live Spark spill) — replay with the box
# idle.
python3 tools/oracle_budget.py "$SF" "$OUT" 1500 dedup_components_slice10 >> "$LOG" 2>&1
# session_duration_slice: 900 s was not enough for the 10M-event
# DuckDB window replay; one escalation to 1800 s before recording the
# bound as final.
python3 tools/oracle_budget.py "$SF" "$OUT" 1800 session_duration_slice >> "$LOG" 2>&1
echo R13_RETRIES_DONE >> "$LOG"
echo R13_RETRIES_DONE
