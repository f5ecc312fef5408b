#!/bin/bash
# Round-16 isolated reruns (VERDICT r16 tasks 3 + 6): every r15 driver-
# bench query that came in >= 1.3x its r14 time (and > 1 s), re-timed
# on a QUIET box in two small batches — sol2_pipeline_gate alone first
# (it carries the new 8-partition tiny-frame shuffle pin and needs an
# isolated number next to r14's 17.3 s), then the other outliers in one
# JVM. Bench prints the calibration canary line, so the adjusted
# numbers are comparable across boxes. Exit codes checked; a failed
# batch emits a distinct marker (ADVICE r15 item 4).
set -u
cd /root/repo
. tools/heavy_guard.sh

LOG=target/scale/r16_isolated.log
: > "$LOG"

note () { echo "[$(date +%T)] $*" | tee -a "$LOG"; }

heavy_guard >> "$LOG" 2>&1 || { note R16_ISO_ABORT_BUSY; exit 1; }

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes . \
  || { note R16_ISO_JAR_FAIL; exit 1; }
JAR=/tmp/graft-classes.jar

bench_batch () {
  local qs=$1 tag=$2
  note "bench $tag start: $qs"
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$qs" \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 32g \
    --conf spark.local.dir=/root/repo/target/spark-tmp/r16_iso \
    --class graft.Bench "$JAR" 2>/dev/null | grep '"metric"' >> "$LOG" \
    || { note "R16_ISO_FAIL_$tag"; exit 1; }
  note "bench $tag done"
}

bench_batch sol2_pipeline_gate ISO1
bench_batch interval_join_ordered_stream,house_pipeline_gate,binning_design_lineitem,risk_flags_lineitem,scale_robust_extendedprice,span_dedup_coverage,adamic_adar_trade_links,pq_ann_topk_vec0,kcore_nation_trade,bfs_hops_nation_trade,pagerank_nation_weighted,label_prop_communities,latest_status_stream,pagerank_nation_trade,basket_brand_pairs_lift ISO2
note R16_ISO_DONE
