#!/bin/bash
# Round-13 sf100 value-parity ledger, stage 1 (VERDICT r12 task 1):
# every remaining oracle-backed query whose Spark-side plan is known
# linear/bounded at sf100, in four family batches. Each batch is one
# Verify invocation (results parquet) followed by a budgeted DuckDB
# replay; a timeout lands in the ledger as a MEASURED bound.
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r13_sf100
LOG=target/scale/r13_oracle.out
ERR=target/scale/r13_oracle.err

A=accuracy_synth,basket_brand_pairs_lift,bloom_semi_urgent_revenue,bucketed_join_roundtrip,calibration_cpu,calibration_curve_synth,class_balance_downsample,confusion_matrix_synth,corr_vs_label_ranked,cuped_adjusted_ab,derived_features_lineitem,grid_bin_price_quantity,grouping_sets_report,groupwise_z_quantity,hash_fold_counts,impute_group_mean_quantity,label_encode_nation,label_encode_unseen,macro_f1_synth,nation_set_ops,per_class_prf_synth,pr_curve_synth,priority_abs_deviation,profile_lineitem,risk_flags_lineitem,roc_auc_synth,rollup_share_report,running_revenue_per_customer,scale_robust_extendedprice,snapshot_diff_report,split_gains_discount,standardize_quantity,target_encode_oof_priority,weighted_prf_synth
B=bloom_contamination_prefilter,boilerplate_ngrams,bpe_token_stats,chunk_docs_64_16,clean_normalize_docs,contamination_trigram_bench,corpus_summary_report,csv_roundtrip_docs,fingerprint_docs,jsonl_roundtrip_docs,lm_ppl_holdout,lm_score_docs,mixing_plan_langs,orc_roundtrip_docs,pack_greedy_docs,partitioned_roundtrip_docs,pii_redact_docs,pmi_collocations,quality_quartile_gate_lang,quality_sample_docs,repetition_scores_docs,repetition_scores_stream,sample_per_lang_docs,shard_assign_docs,source_frequency_cap,text_stats_docs,top_bigrams_lang,trigram_index_search,weighted_sample_docs
C=allpairs_jaccard_pairs,ann_lsh_topk_vec0,ann_recall_ivf_vec0,ann_sign_topk_vec0,cosine_topk_vec0,doc_cosine_topk,dup_leakage_matrix_sources,embedding_assign_centroid,embedding_centroid_per_label,embedding_dim_stats,embedding_quantize_int8,embedding_random_projection,fuzzy_dedup_adjacent,incremental_dedup_shard,ivf_ann_topk_vec0,knn_label_vote_vec0,mann_whitney_totalprice,media_dedup_by_frame_hash,media_frames_hashed,media_metadata_stub,mmr_diverse_top5,pq_ann_topk_vec0,simhash_hamming_pairs,dedup_keep_first_counts
E=asof_last_click_before_error,asof_native_forward,attribution_last_touch,cms_heavy_hitters_stream,curation_pipeline_gate,event_markov_matrix,events_enriched_stream,events_sliding_2h,funnel_signup_click_purchase,funnel_windowed_24h,interval_join_click_error,interval_join_stream,merge_upsert_customers,rolling_anomaly_flags,scd2_point_in_time_join,session_duration_slice,session_duration_profile,sessionize_users,user_journeys,watermark_lateness_profile

: > "$LOG"; : > "$ERR"
run_batch () {
  local qs=$1 budget=$2 tag=$3
  echo "=== spark $tag $(date +%T) ===" >> "$ERR"
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$qs" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  /opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
    --conf spark.local.dir=/root/repo/target/spark-tmp \
    --class graft.Verify "$JAR" "$SF" "$OUT" 2>>"$ERR"
  echo "=== oracle $tag $(date +%T) ===" >> "$ERR"
  python3 tools/oracle_budget.py "$SF" "$OUT" "$budget" "$qs" >> "$LOG" 2>&1
}

run_batch "$A" 600 A
run_batch "$C" 600 C
run_batch "$E" 900 E
run_batch "$B" 900 B
echo R13_STAGE1_DONE >> "$LOG"
echo R13_STAGE1_DONE
