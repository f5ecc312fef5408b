#!/bin/bash
# Round-16 sf100 evidence runs, serialized in one orchestrator so the
# round-15 incident classes cannot recur (heavy_guard refuses foreign
# JVMs before every stage; each spark-submit gets its OWN scratch dir;
# every exit status is checked and a stage failure emits a distinct
# marker instead of a normal-looking tail — ADVICE r15 items 3/4).
#
# Stage A (VERDICT r16 task 1): the cluster-based SemDeDup family at
#   the corpus-scaled list count (k = ceil(n/1024), floored at 8).
#   Cut-safe ordering: slice value-gate first, then the full keep-list
#   + agreement in ONE JVM (the Lloyd fit is memoized per session, so
#   the 2M-vector k=1954 fit is paid once).
# Stage B (task 2): the staged-CTE replayer over the 4 r14 DuckDB
#   disk bounds + the quality_classifier_select budget bound.
# Stage C (task 5): every carried r13/r14 budget bound re-attempted —
#   staged replay first (bounded peak disk), oracle_budget fallback
#   for non-WITH oracles — inside a fixed per-query budget.
set -u
cd /root/repo
. tools/scratch_guard.sh
. tools/heavy_guard.sh

SF=target/scale/sf100
OUT=target/scale/verify_r15_sf100     # accumulated sf100 Spark outputs
ALOG=target/scale/r16_oracle.out      # stage A (ledger source)
BLOG=target/scale/r16_staged.out      # stage B (ledger source)
CLOG=target/scale/r16_sweep.out       # stage C (ledger source)
ERR=target/scale/r16_scale.err
NARR=target/scale/r16_scale.log       # narrative / markers

: > "$ALOG"; : > "$BLOG"; : > "$CLOG"; : > "$ERR"; : > "$NARR"

note () { echo "[$(date +%T)] $*" | tee -a "$NARR"; }
fail () { note "$1"; exit 1; }

heavy_guard >> "$NARR" 2>&1 || fail R16_ABORT_BUSY
scratch_guard 30 >> "$NARR" 2>&1 || fail R16_ABORT_DISK

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes . \
  || fail R16_JAR_FAIL
JAR=/tmp/graft-classes.jar

# one spark-submit batch; per-run scratch dir (incident 1's disk twin:
# a shared spill dir wiped by a stage guard killed a concurrent Verify)
spark_batch () {
  local qs=$1 tag=$2
  heavy_guard >> "$NARR" 2>&1 || fail "R16_ABORT_BUSY_$tag"
  scratch_guard 30 >> "$NARR" 2>&1 || fail "R16_ABORT_DISK_$tag"
  note "spark $tag start: $qs"
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$qs" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp/r16_"$tag" \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR" \
    || fail "R16_SPARK_FAIL_$tag"
  note "spark $tag done"
}

budget_oracle () {  # budget_oracle <log> <budget_s> <q>
  local log=$1 budget=$2 q=$3
  note "oracle(budget $budget) $q"
  python3 tools/oracle_budget.py "$SF" "$OUT" "$budget" "$q" \
    >> "$log" 2>&1 \
    || echo "$q {\"status\": \"error\", \"err\": \"oracle_budget runner died\"}" >> "$log"
  rm -rf target/spark-tmp/duck
}

# staged replay with timeout; falls back to oracle_budget when the
# oracle is not a WITH chain (the replayer's one structural premise)
staged_oracle () {  # staged_oracle <log> <timeout_s> <fallback_budget_s> <q>
  local log=$1 tmo=$2 fb=$3 q=$4
  note "oracle(staged, timeout $tmo) $q"
  local tmp rc
  tmp=$(mktemp)
  timeout "$tmo" python3 tools/oracle_staged.py "$SF" "$OUT" "$q" \
    > "$tmp" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ] && grep -q "does not start with WITH" "$tmp"; then
    note "  $q: not a WITH chain — oracle_budget fallback"
    cat "$tmp" >> "$NARR"
    budget_oracle "$log" "$fb" "$q"
  elif [ "$rc" -eq 0 ]; then
    cat "$tmp" >> "$log"
  elif [ "$rc" -eq 124 ]; then
    cat "$tmp" >> "$log"
    echo "$q {\"status\": \"timeout\", \"err\": \"staged replay exceeded ${tmo}s\"}" >> "$log"
  else
    cat "$tmp" >> "$log"
    echo "$q {\"status\": \"error\", \"err\": \"staged runner died rc=$rc\"}" >> "$log"
  fi
  rm -f "$tmp"
  rm -rf target/spark-tmp/duck
}

# ---- Stage A: scaled-k SemDeDup (value gate first, cut-safe)
spark_batch semantic_dedup_kmeans_slice A1
budget_oracle "$ALOG" 1800 semantic_dedup_kmeans_slice
spark_batch semantic_dedup_kmeans,semantic_dedup_kmeans_agreement A2
budget_oracle "$ALOG" 1800 semantic_dedup_kmeans
budget_oracle "$ALOG" 1800 semantic_dedup_kmeans_agreement
note R16_STAGE_A_DONE

# ---- Stage B: staged-CTE replays (4 disk bounds + the QC budget bound)
# dedup_drop_components / dedup_keep_best_components /
# quality_classifier_select Spark outputs already sit in $OUT (r15,
# code unchanged this round); the scaled near-dup pair needs a fresh
# Spark pass.
spark_batch embedding_near_dup_scaled,semantic_dedup_scaled B1
for q in dedup_drop_components dedup_keep_best_components \
         embedding_near_dup_scaled semantic_dedup_scaled \
         quality_classifier_select; do
  staged_oracle "$BLOG" 2700 600 "$q"
done
note R16_STAGE_B_DONE

# ---- Stage C: carried r13/r14 budget bounds, ledger order
CARRIED="dedup_clusters_lsh dedup_components_bucket dedup_drop_list \
dedup_keep_best embedding_near_dup_pairs gopher_quality_rules \
hll_distinct_shingles incremental_dedup_shard minhash_lsh_candidates \
mmr_diverse_top5 near_dup_lsh_pruned ngram_jaccard_adjacent \
pack_greedy_docs rf_bagged_vote_confusion semantic_dedup_keep \
session_duration_profile simhash_hamming_pairs tree_train_confusion"

# Spark outputs for the carried set were lost with the box recycle;
# regenerate in batches small enough that one failure loses little.
spark_batch dedup_clusters_lsh,dedup_components_bucket,dedup_drop_list,dedup_keep_best C1
spark_batch gopher_quality_rules,hll_distinct_shingles,incremental_dedup_shard,minhash_lsh_candidates C2
spark_batch mmr_diverse_top5,near_dup_lsh_pruned,ngram_jaccard_adjacent,pack_greedy_docs C3
spark_batch rf_bagged_vote_confusion,semantic_dedup_keep,session_duration_profile,simhash_hamming_pairs,tree_train_confusion C4
spark_batch embedding_near_dup_pairs C5

for q in $CARRIED; do
  staged_oracle "$CLOG" 600 600 "$q"
done
note R16_STAGE_C_DONE

note R16_ALL_DONE
