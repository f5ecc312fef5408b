#!/bin/bash
# Round-12 closing evidence:
#  (1) sf100 Bench timings for the three truth-slice queries,
#  (2) full-surface two-scale parity (sf0.001 + sf0.01) on the
#      245-query registry incl. the jsonl/orc gates and all round-12
#      additions (VERDICT r11 task 2),
#  (3) a full sf0.1 bench sweep for cross-round comparability.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
LOG=target/scale/r12_scale.log

echo "=== target/scale/sf100 :: slice queries ===" >> "$LOG"
env SPARK_GRAFT_SF_DIR=target/scale/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPEAT=1 SPARK_GRAFT_RETHROW=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
  SPARK_GRAFT_ONLY=gopher_rules_slice,hll_shingles_slice,dedup_components_slice \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>"$LOG.err" \
  | grep '"metric"' >> "$LOG"

for sf in 0.001 0.01; do
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" /root/testdata/sf$sf \
    target/scale/verify_r12_full_sf$sf 2>>target/scale/r12_full.err
  python3 tools/check_parity.py /root/testdata/sf$sf \
    target/scale/verify_r12_full_sf$sf \
    > target/scale/r12_parity_sf$sf.out 2>&1
  tail -1 target/scale/r12_parity_sf$sf.out
done

echo "=== full sf0.1 bench sweep ===" >> "$LOG"
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>"$LOG.err" \
  | grep '"metric"' > target/scale/r12_bench_sf01.json
echo "r12_close done" >> "$LOG"
echo r12_close done
