#!/bin/bash
# Re-run dedup_components_slice at sf100 after thinning the slice to
# doc_id % 100 = 7 (the 10% slice OOM'd DuckDB's closure CTE — giant
# component; measured r12), then replay the oracle.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=dedup_components_slice \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify /tmp/graft-classes.jar target/scale/sf100 \
  target/scale/verify_r12_dcs_sf100 2>target/scale/r12_dcs.err
{ time python3 tools/check_parity.py target/scale/sf100 \
    target/scale/verify_r12_dcs_sf100 2>&1 \
    | grep -E "dedup_components_slice|match" ; } \
  >> target/scale/r12_oracle.out 2>&1
echo "r12_dcs done" >> target/scale/r12_oracle.out
