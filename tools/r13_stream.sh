#!/bin/bash
# Round-13 bounded-trigger semantics measurement for the WATERMARKED
# streams (VERDICT r12 task 2). StreamRead.scala documents that
# watermarked operators can diverge from the single-batch oracle when
# real lateness exceeds the configured delay and the watermark advances
# BETWEEN micro-batches; watermark_lateness_profile shows lateness is
# live in this corpus. This runs each watermarked stream once at sf100
# under SPARK_GRAFT_STREAM_MAX_FILES=1 (events = 49 part files -> ~49
# micro-batches; orders/documents = 32) with per-batch state metrics,
# then replays the batch oracle and records hash-equal vs measured
# divergence per stream. Results are a SEMANTICS statement, not a
# ledger row — the registered knob-off results stay the correctness
# gate.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_stream_sf100
LOG=target/scale/r13_stream_trigger.out
MET=target/scale/r13_stream_trigger.metrics
ERR=target/scale/r13_stream.err

WM="events_sliding_stream events_hourly_stream interval_join_stream dedup_within_watermark_stream sessionize_stream"

: > "$LOG"; : > "$MET"
for q in $WM; do
  echo "=== $q $(date +%T) ===" > "$ERR.$q"
  echo "=== $q ===" >> "$MET"
  timeout 1200 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
    SPARK_GRAFT_STREAM_MAX_FILES=1 SPARK_GRAFT_STREAM_METRICS=1 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR.$q"
  rc=$?
  grep stream-metrics "$ERR.$q" >> "$MET" || true
  if [ $rc -eq 0 ] && [ -d "$OUT/$q" ]; then
    python3 tools/oracle_budget.py "$SF" "$OUT" 1200 "$q" >> "$LOG" 2>&1
  else
    echo "$q {\"status\": \"error\", \"err\": \"spark timeout/abort rc=$rc (1200 s cap)\"}" >> "$LOG"
  fi
done
echo R13_STREAM_DONE >> "$LOG"
echo R13_STREAM_DONE
