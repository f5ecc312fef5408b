#!/bin/bash
# Round-12 CMS stream bounded-trigger measurement (VERDICT r11 task 6):
# cms_heavy_hitters_stream at sf100 under SPARK_GRAFT_STREAM_MAX_FILES=1
# (32 doc shards -> 32 micro-batches) with per-batch metrics. The CMS
# grid is a non-watermarked running aggregation, so the bounded-trigger
# result is trigger-invariant — Verify re-checks oracle equality with
# the knob ON (the StreamRead caveat's required knob-on re-verify),
# and the metrics pin flat per-batch trigger cost on fixed d*w state.
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r12_scale.log

echo "=== cms_heavy_hitters_stream bounded-trigger (1 file/batch, sf100) ===" >> "$LOG"
: > "$LOG.err"
env SPARK_GRAFT_SF_DIR=target/scale/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPEAT=1 SPARK_GRAFT_RETHROW=1 \
  SPARK_GRAFT_ONLY=cms_heavy_hitters_stream \
  SPARK_GRAFT_STREAM_METRICS=1 SPARK_GRAFT_STREAM_MAX_FILES=1 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>"$LOG.err" \
  | grep '"metric"' >> "$LOG"
grep stream-metrics "$LOG.err" > target/scale/r12_cms_trigger.metrics || true

# knob-on oracle equality at sf100 for the same query
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=cms_heavy_hitters_stream \
  SPARK_GRAFT_STREAM_MAX_FILES=1 SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" target/scale/sf100 \
  target/scale/verify_r12_cms_stream 2>>target/scale/r12_cms_verify.err
python3 tools/check_parity.py target/scale/sf100 \
  target/scale/verify_r12_cms_stream 2>&1 \
  | grep -E "cms_heavy_hitters_stream|match" \
  >> target/scale/r12_oracle.out
echo "r12_stream done" >> "$LOG"
