#!/bin/bash
# Round-15 closing evidence, trimmed to what has NOT already run this
# session: the full ScalaTest suite and the sf0.1 bench sweep. The
# two-scale parity half of r15_close.sh already ran fresh on this box
# against the final code (target/scale/r15_pre_parity_sf0.001.out:
# 270/270 on the pre-video surface + both video queries green in
# isolation; target/scale/r15_pre_parity_sf0.01.out: 272/272 on the
# full final surface) — re-running it would spend the last hour of the
# round re-proving logs that are already on disk.
set -u
cd /root/repo
. tools/scratch_guard.sh
scratch_guard 10 || exit 1

sbt -batch test > target/scale/r15_sbt_test.log 2>&1
tail -4 target/scale/r15_sbt_test.log

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
scratch_guard 10 || exit 1
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Bench /tmp/graft-classes.jar 2>>target/scale/r15_bench.err \
  | grep '"metric"' > target/scale/r15_bench_sf01_full.json
head -c 400 target/scale/r15_bench_sf01_full.json
echo
echo R15_CLOSE2_DONE
