#!/bin/bash
# Round-10 scale measurements: (1) the five de-globalized rank queries
# (DistRank rewrite) on the sf1/sf10/sf100 ladder, (2) the SCALE.md gap
# rows (lang-id / token-budget / vocab / quality-gate / word-count /
# ann-recall) at sf1/sf10, (3) the two trending stream twins with
# per-micro-batch state metrics at sf10/sf100 for attribution.
# Fresh-JVM single-rep batches, same method as bench_sf100.sh.
# Usage: tools/r10_scale.sh
set -u
cd /root/repo
JAR=/tmp/graft-classes.jar
LOG=target/scale/r10_scale.log

run() { # run <sfDir> <queries> [extra env as VAR=VAL pairs...]
  local sf=$1 qs=$2; shift 2
  echo "=== $sf :: $qs ===" >> "$LOG"
  env SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
    SPARK_GRAFT_RETHROW=1 SPARK_GRAFT_ONLY="$qs" "$@" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Bench "$JAR" 2>>"$LOG.err" \
    | grep '"metric"' >> "$LOG"
}

FIVE=pareto_revenue_deciles,rfm_segments,session_duration_profile,token_budget_curve,zorder_layout_orders
GAPS=lang_id_confusion,quality_gate_sources,vocab_oov_docs,word_count_docs,ann_recall_ivf_vec0
STREAMS=interval_join_stream,cms_heavy_hitters_stream

for SF in target/scale/sf1 target/scale/sf10; do
  run "$SF" "$FIVE"
  run "$SF" "$GAPS"
done
run target/scale/sf100 "$FIVE"
echo "=== stream attribution (metrics on) ===" >> "$LOG"
run target/scale/sf10 "$STREAMS" SPARK_GRAFT_STREAM_METRICS=1
grep stream-metrics "$LOG.err" | tail -40 > target/scale/r10_stream_sf10.metrics || true
: > "$LOG.err"
run target/scale/sf100 "$STREAMS" SPARK_GRAFT_STREAM_METRICS=1
grep stream-metrics "$LOG.err" | tail -40 > target/scale/r10_stream_sf100.metrics || true
echo R10_SCALE_DONE >> "$LOG"
echo R10_SCALE_DONE
