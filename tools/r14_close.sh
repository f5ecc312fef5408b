#!/bin/bash
# Round-14 closing evidence:
#  (1) full ScalaTest suite,
#  (2) full-surface two-scale parity (sf0.001 + sf0.01) on the
#      255-query registry — regression gate over the r14 additions
#      (component-label dedup twins + slices, corpus-scaled near-dup,
#      ordered-ingestion stream gate, truth slices) and the CC oracle
#      convergence guard / CV-twin alias rename,
#  (3) a full sf0.1 bench sweep (now emitting total_adjusted).
set -u
cd /root/repo
. tools/scratch_guard.sh

sbt -batch test > target/scale/r14_sbt_test.log 2>&1
tail -4 target/scale/r14_sbt_test.log

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar

for sf in 0.001 0.01; do
  scratch_guard 10 || exit 1
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" /root/testdata/sf$sf \
    target/scale/verify_r14_full_sf$sf 2>>target/scale/r14_full.err
  python3 tools/check_parity.py /root/testdata/sf$sf \
    target/scale/verify_r14_full_sf$sf \
    > target/scale/r14_parity_sf$sf.out 2>&1
  tail -1 target/scale/r14_parity_sf$sf.out
done

scratch_guard 10 || exit 1
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench "$JAR" 2>>target/scale/r14_bench.err \
  | grep '"metric"' > target/scale/r14_bench_sf01_full.json
cat target/scale/r14_bench_sf01_full.json | head -c 400
echo R14_CLOSE_DONE
