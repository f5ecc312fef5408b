#!/bin/bash
# Round-15 sf100 corpus regeneration. The session box was recycled
# between rounds 14 and 15 and target/ (incl. target/scale/sf100 and
# every evidence log) was wiped; same recipe as the two r14 rebuilds:
# graft.ScaleUp factor 1000 from the driver's sf0.1 for all Spark-
# writable tables + tools/scale_events.py for the TIMESTAMP(NANOS)
# events table.
set -u
cd /root/repo
. tools/scratch_guard.sh
scratch_guard 40 || exit 1
JAR=/tmp/graft-classes.jar
LOG=target/scale/scaleup_sf100.log
: > "$LOG"
date +%T >> "$LOG"
env SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.ScaleUp "$JAR" /root/testdata/sf0.1 target/scale/sf100 1000 \
  >> "$LOG" 2>&1 || { echo R15_SCALEUP_FAIL >> "$LOG"; exit 1; }
date +%T >> "$LOG"
python3 tools/scale_events.py /root/testdata/sf0.1 target/scale/sf100 1000 \
  >> "$LOG" 2>&1 || { echo R15_EVENTS_FAIL >> "$LOG"; exit 1; }
date +%T >> "$LOG"
du -sh target/scale/sf100 >> "$LOG"
echo R15_SCALEUP_DONE >> "$LOG"
echo R15_SCALEUP_DONE
