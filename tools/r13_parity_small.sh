#!/bin/bash
# Round-13 regression gate: full registry Verify + DuckDB parity at
# sf0.001 and sf0.01 after the r13 changes (DistRank all-aggregate
# guard, iterative bucket-CC oracle, session_duration_slice,
# dedup_components_slice10, latest_status empty-source guard,
# annLshPlaneCount constant).
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar

for SF in 0.001 0.01; do
  OUT=target/scale/verify_r13_full_sf$SF
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 64g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" /root/testdata/sf$SF "$OUT" \
    2>target/scale/r13_parity_sf$SF.err
  python3 tools/check_parity.py /root/testdata/sf$SF "$OUT" \
    > target/scale/r13_parity_sf$SF.out 2>&1
  tail -3 target/scale/r13_parity_sf$SF.out
done
echo R13_PARITY_DONE
