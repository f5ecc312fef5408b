#!/bin/bash
# Round-15 sf100 stage 1c: resume of r15_oracle.sh from batch T2.
#
# The first stage-1 run completed T1 fully green (media/audio round
# trips + the 64-round BPE trainer) but T2's Spark driver was starved
# by CONCURRENT interactive JVMs (a full sbt test + an sf0.001 Verify
# sharing the box): the executor logged "unable to send heartbeats to
# driver more than 60 times" after 600 s and exited, which surfaced as
# a cache-rebuild NullPointerException inside the quality-classifier
# count. Not a query bug — the same query is hash-green at sf0.01 —
# a box-contention incident. This rerun serializes: NOTHING else heavy
# may run while sf100 stages do (now noted in SCALE.md's hygiene
# section alongside the disk guard).
#
# Batches: T2/T3/T4 verbatim from r15_oracle.sh, plus T5 for the two
# round-15 REAL-video-decode queries (hand-rolled RIFF/AVI parser)
# that landed after the stage-1 script was written.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r15_sf100
LOG=target/scale/r15_oracle3.out
ERR=target/scale/r15_oracle3.err

: > "$LOG"; : > "$ERR"

run_batch () {
  local qs=$1 budget=$2 tag=$3
  scratch_guard 30 >> "$LOG" 2>&1 || { echo "R15_ABORT_DISK_$tag" >> "$LOG"; exit 1; }
  echo "=== spark $tag $(date +%T) ===" >> "$ERR"
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$qs" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || { echo "R15_SPARK_FAIL_$tag" >> "$LOG"; exit 1; }
  echo "=== oracle $tag $(date +%T) ===" >> "$ERR"
  for q in ${qs//,/ }; do
    python3 tools/oracle_budget.py "$SF" "$OUT" "$budget" "$q" >> "$LOG" 2>&1
    rm -rf target/spark-tmp/duck
  done
}

run_batch quality_classifier_slice,quality_classifier_select 1800 T2
run_batch span_dedup_coverage_k32 1800 T3
run_batch semantic_dedup_kmeans_slice,semantic_dedup_kmeans_agreement,semantic_dedup_kmeans 1800 T4
run_batch video_metadata_real,video_frames_real 1800 T5

echo R15_STAGE1C_DONE >> "$LOG"
echo R15_STAGE1C_DONE
