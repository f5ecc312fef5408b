#!/bin/bash
# Round-10 drift attribution: incremental_dedup_shard (3.66->4.49 s) and
# hll_distinct_shingles (2.55->2.94 s) rose two rounds running on
# unchanged code — isolated fresh-JVM reps at sf0.1 (3 per query, with
# the calibration canary in each JVM) decide box noise vs real.
# Usage: tools/r10_drift.sh
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r10_drift.log
for q in incremental_dedup_shard hll_distinct_shingles; do
  for rep in 1 2 3; do
    echo "=== $q rep$rep ===" >> "$LOG"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_REPEAT=1 SPARK_GRAFT_RETHROW=1 \
    SPARK_GRAFT_ONLY="calibration_cpu,$q" \
    /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
      --conf spark.local.dir=/root/repo/target/spark-tmp \
      --class graft.Bench "$JAR" 2>/dev/null \
      | grep '"metric"' >> "$LOG"
  done
done
echo R10_DRIFT_DONE >> "$LOG"
echo R10_DRIFT_DONE
