#!/bin/bash
# Round-15 sf100 stage 1: evidence for the nine round-15 queries
# (VERDICT r14 tasks 1/2/3/4/6):
#   - media_metadata_real (real javax.imageio decode round trip)
#   - bpe_merge_train_deep / bpe_tokens_curve (64-round trainer; the
#     corpus-scale part is ONE word count, merges ride the
#     Heaps-bounded vocab, so the replay should complete)
#   - quality_classifier_select (full replay rides a ~750M-row hashed
#     gram count frame per gradient round -> bound plausible) +
#     quality_classifier_slice (the 10% induced-subcorpus value gate)
#   - span_dedup_coverage_k32 (Lee-et-al-scale window beside the k=8
#     standing gate; 60-bit fingerprints on the wire)
#   - semantic_dedup_kmeans{,_slice,_agreement} (paper-shape SemDeDup
#     over the Lloyd fit; full oracle unrolls the fit -> bound
#     plausible at 20M vectors; the slice is the value gate)
# Spark side first (one Verify per batch), then budgeted DuckDB
# replays. Scratch hygiene mechanized per r14 task 5.
set -u
cd /root/repo
. tools/scratch_guard.sh
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r15_sf100
LOG=target/scale/r15_oracle.out
ERR=target/scale/r15_oracle.err

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

# batch 1: the cheap-replay additions (decode round trip is per-row
# arithmetic; the BPE frames are vocab-bounded after one word count)
run_batch media_metadata_real,audio_metadata_real,bpe_merge_train_deep,bpe_tokens_curve 1800 T1

# batch 2: quality classifier — slice first (the value gate), then the
# full replay under budget (expected bound: 8 gradient rounds x a
# corpus-scale hashed-gram count frame in DuckDB)
run_batch quality_classifier_slice,quality_classifier_select 1800 T2

# batch 3: the k=32 span window (same linear fingerprint shape as the
# k=8 gate that runs 156.9 s at sf100)
run_batch span_dedup_coverage_k32 1800 T3

# batch 4: cluster-based SemDeDup — slice + agreement are the value
# gates; the full keep-list replay unrolls the Lloyd fit over 20M
# vectors (bound plausible)
run_batch semantic_dedup_kmeans_slice,semantic_dedup_kmeans_agreement,semantic_dedup_kmeans 1800 T4

echo R15_STAGE1_DONE >> "$LOG"
echo R15_STAGE1_DONE
