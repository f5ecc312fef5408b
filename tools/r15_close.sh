#!/bin/bash
# Round-15 closing evidence:
#  (1) full ScalaTest suite,
#  (2) full-surface two-scale parity (sf0.001 + sf0.01) on the
#      276-query registry — regression gate over the r15 additions
#      (real image + WAV audio decode, k=32 span window, cluster
#      SemDeDup + agreement audit, 64-round BPE gate, quality
#      classifier + slice) and the overflow-safe media generator,
#  (3) a full sf0.1 bench sweep (emitting total_adjusted).
set -u
cd /root/repo
. tools/scratch_guard.sh

sbt -batch test > target/scale/r15_sbt_test.log 2>&1
tail -4 target/scale/r15_sbt_test.log

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar

for sf in 0.001 0.01; do
  scratch_guard 10 || exit 1
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" /root/testdata/sf$sf \
    target/scale/verify_r15_full_sf$sf 2>>target/scale/r15_full.err \
    || { echo "R15_SPARK_FAIL_sf$sf"; exit 1; }
  python3 tools/check_parity.py /root/testdata/sf$sf \
    target/scale/verify_r15_full_sf$sf \
    > target/scale/r15_parity_sf$sf.out 2>&1
  tail -1 target/scale/r15_parity_sf$sf.out
done

scratch_guard 10 || exit 1
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>target/scale/r15_bench.err \
  | grep '"metric"' > target/scale/r15_bench_sf01_full.json
cat target/scale/r15_bench_sf01_full.json | head -c 400
echo R15_CLOSE_DONE
