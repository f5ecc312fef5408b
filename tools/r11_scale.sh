#!/bin/bash
# Round-11 scale measurements:
#  (1) the two newly de-globalized queries (lift_gains_deciles on
#      DistRank, interarrival_profile on the distinct-gap grid) on the
#      sf1/sf10/sf100 ladder,
#  (2) hll_distinct_shingles after the per-distinct pre-aggregation
#      (was 281.9 s at sf100) at sf10/sf100,
#  (3) BucketBench at sf100 incl. the new q18 shape (exchange-free
#      requirement + bucketed-vs-plain timing),
#  (4) interval_join_stream under a rate-limited trigger
#      (SPARK_GRAFT_STREAM_MAX_FILES=1 -> 50 micro-batches at sf100)
#      with per-batch state metrics — the watermark-bounded steady
#      state measured, vs r10's one-batch 39.7M-row worst case.
# Fresh-JVM single-rep batches, same method as r10_scale.sh.
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r11_scale.log

run() { # run <sfDir> <queries> [extra env as VAR=VAL pairs...]
  local sf=$1 qs=$2; shift 2
  echo "=== $sf :: $qs ===" >> "$LOG"
  env SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
    SPARK_GRAFT_RETHROW=1 SPARK_GRAFT_ONLY="$qs" "$@" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench "$JAR" 2>>"$LOG.err" \
    | grep '"metric"' >> "$LOG"
}

TWO=lift_gains_deciles,interarrival_profile
for SF in target/scale/sf1 target/scale/sf10 target/scale/sf100; do
  run "$SF" "$TWO"
done

run target/scale/sf10 hll_distinct_shingles
run target/scale/sf100 hll_distinct_shingles

echo "=== BucketBench sf100 (incl. q18 shape) ===" >> "$LOG"
env SPARK_GRAFT_SF_DIR=target/scale/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BUCKETS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.BucketBench "$JAR" 2>>"$LOG.err" >> "$LOG"

echo "=== interval_join_stream bounded-trigger (1 file/batch) ===" >> "$LOG"
: > "$LOG.err"
run target/scale/sf100 interval_join_stream \
  SPARK_GRAFT_STREAM_METRICS=1 SPARK_GRAFT_STREAM_MAX_FILES=1
grep stream-metrics "$LOG.err" > target/scale/r11_stream_trigger.metrics || true

echo R11_SCALE_DONE >> "$LOG"
echo R11_SCALE_DONE
