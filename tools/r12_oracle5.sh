#!/bin/bash
# Round-12 sf100 extension, batch 4: the synthetic-label metric family,
# events windows, encodings, dedup counters, embedding stats, and the
# doc-text explode family (budgeted — DuckDB token explodes over 50M
# docs run minutes each; a timeout is a measured bound).
set -u
cd /root/repo
jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes .
JAR=/tmp/graft-classes.jar
SF=target/scale/sf100
OUT=target/scale/verify_r12_ext4_sf100
LOG=target/scale/r12_ext4_oracle.out

M1=accuracy_synth,macro_f1_synth,per_class_prf_synth,weighted_prf_synth,confusion_matrix_synth,roc_auc_synth,pr_curve_synth
M2=calibration_curve_synth,attribution_last_touch,bloom_contamination_prefilter,bloom_semi_urgent_revenue,corr_vs_label_ranked,cuped_adjusted_ab
M3=event_markov_matrix,events_sliding_2h,funnel_windowed_24h,grid_bin_price_quantity,grouping_sets_report,label_encode_nation,label_encode_unseen
M4=mixing_plan_langs,mmr_diverse_top5,quality_quartile_gate_lang,rolling_anomaly_flags,snapshot_diff_report,watermark_lateness_profile,mann_whitney_totalprice
M5=split_gains_discount,target_encode_oof_priority,source_frequency_cap,class_balance_downsample,dedup_keep_first_counts,dedup_threshold_sweep,dedup_drop_list
M6=scale_robust_extendedprice,standardize_quantity,embedding_dim_stats,embedding_centroid_per_label,knn_label_vote_vec0,lsh_quality_report
M7=text_stats_docs,top_bigrams_lang,bpe_token_stats,boilerplate_ngrams,trigram_index_search,contamination_trigram_bench,lm_ppl_holdout,corpus_summary_report,basket_brand_pairs_lift

env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$M1,$M2,$M3,$M4,$M5,$M6,$M7" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 96g \
  --conf spark.local.dir=/root/repo/target/spark-tmp \
  --class graft.Verify "$JAR" "$SF" "$OUT" 2>target/scale/r12_ext4.err

: > "$LOG"
for batch in "$M1" "$M2" "$M3" "$M4" "$M5" "$M6" "$M7"; do
  python3 tools/oracle_budget.py "$SF" "$OUT" 900 "$batch" >> "$LOG" 2>&1
done
echo R12_EXT4_DONE >> "$LOG"
