#!/bin/bash
# Round-15 sf100 stage 1b: re-run the two media round-trip queries with
# the overflow-safe generator (commit 8069fc7 — sf100 doc_ids exceed
# 3.4e9, so the original id * 2654435761 product overflowed INT64:
# Spark wrapped silently, DuckDB raised). The mod-127 reduction is
# value-identical at small sf; this rerun gathers the sf100 evidence
# the ledger keeps (best status per query wins over the stage-1 error).
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r15_sf100
LOG=target/scale/r15_oracle2.out
ERR=target/scale/r15_oracle2.err

: > "$LOG"; : > "$ERR"
QS=media_metadata_real,audio_metadata_real

scratch_guard 30 >> "$LOG" 2>&1 || { echo "R15_ABORT_DISK_MEDIA" >> "$LOG"; exit 1; }
env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
  || { echo "R15_SPARK_FAIL_MEDIA" >> "$LOG"; exit 1; }
for q in ${QS//,/ }; do
  python3 tools/oracle_budget.py "$SF" "$OUT" 1800 "$q" >> "$LOG" 2>&1
  rm -rf target/spark-tmp/duck
done
echo R15_STAGE1B_DONE >> "$LOG"
echo R15_STAGE1B_DONE
