#!/bin/bash
# Round-13 continuation pipeline (after VM restart killed stage B sf100).
# Order: short required evidence first, long sf100 chunks last.
set -x
cd /root/repo
NEW="q_stream_hostquota,q_line_dedup,q_dedup_spans_varlen,q_wordpiece_byte_encode,q_unigram_byte_encode,q_html_extract,q_crawl_funnel_html,q_dedup_incremental_persisted,q_dedup_incremental"

# B100: the 9 new/twin rows at sf100 (four-decade story, crash-isolated)
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=$NEW SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_new_sf100.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_b_sf100.log 2>&1
echo "B_sf100_done=$?"

# D: second quiet full sf0.1 run (noise estimate / min-based)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf01_full2.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_d_full2.log 2>&1
echo "D_done=$?"

# E: gates
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.01" > /tmp/r13_plans.log 2>&1
echo "E_plans_done=$?"
sbt -batch test > /tmp/r13_test.log 2>&1
echo "E_test_done=$?"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v13_001" > /tmp/r13_v001.log 2>&1
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/v13_001 > /tmp/r13_v001_check.log 2>&1
echo "E_v001_done=$?"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v13_01" > /tmp/r13_v01.log 2>&1
python3 scripts/selfcheck.py /root/testdata/sf0.1 /tmp/v13_01 > /tmp/r13_v01_check.log 2>&1
echo "E_v01_done=$?"

# C: full sf100 suite in crash-bounded chunks
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q1_agg,q3_topk,q_agg_cube,q_agg_rollup,q_ann_ivf,q_ann_lsh,q_ann_pq,q_ann_topk,q_append,q_asof_join,q_asof_join_fwd,q_asof_join_nearest,q_asof_join_sharded,q_asof_join_tol,q_astype,q_bloom_join,q_boilerplate_cut,q_bpe_apply,q_bpe_bytes_encode,q_bpe_bytes_train,q_bpe_encode,q_bpe_pairs,q_bpe_train,q_c4_line_filter,q_c4_report,q_cdc_apply,q_cdc_diff,q_cell_changes,q_classify_nb,q_classify_report,q_cms_check,q_corpus_datacard,q_count_distinct_check,q_crawl_funnel,q_crawl_funnel_html,q_curation_decontaminated,q_curation_pipeline,q_decontaminate,q_decontaminate_cut,q_decontaminate_hashfilter,q_dedup_embed_incremental,q_dedup_exact,q_dedup_incremental,q_dedup_incremental_persisted,q_dedup_minhash_recall,q_dedup_ngram,q_dedup_paragraphs,q_dedup_report,q_dedup_simhash,q_dedup_spans_cut,q_dedup_spans_varlen,q_delete_rows,q_describe_approx,q_distinct_sketch_check,q_domain_cap,q_dsir_select,q_dsir_weights,q_embed_centroids,q_embed_classify,q_embed_knn,q_epoch_shuffle,q_events_abtest,q_events_anomalies,q_events_attribution,q_events_decayed,q_events_deltas,q_events_ewma,q_events_funnel,q_events_funnel_steps,q_events_hist,q_events_hopping,q_events_props,q_events_retention,q_events_robust,q_events_rolling,q_events_sessionize,q_events_transitions,q_events_window,q_export_manifest,q_fetch_logs,q_filter_cmp,q_filter_combo,q_filter_contains,q_filter_endswith,q_filter_isin,q_filter_null,q_filter_startswith,q_fim_transform,q_fuzzy_join,q_get_view,q_get_view_or,q_graph_pagerank,q_graph_triangles_nodesampled,q_head,q_heavy_hitters,q_html_extract,q_iloc_neg,q_iloc_slice SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_b1.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_c_b1.log 2>&1
echo "C_b1_done=$?"
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q_iloc_step,q_join_salted,q_length_buckets,q_line_dedup,q_link_array,q_link_join,q_linked_count,q_linked_findmax,q_linked_findmin,q_linked_lookup,q_linked_rollup_avg,q_linked_rollup_conc,q_linked_rollup_sum,q_lm_bigram,q_lm_perplexity,q_map_values,q_mixture_take,q_mixture_take_rate,q_mixture_weights,q_multimodal_audio,q_multimodal_decode,q_multimodal_features,q_multimodal_frames,q_multimodal_image_formats,q_multimodal_meta,q_multimodal_resize,q_multimodal_video_meta,q_multiselect_contains,q_pack_bestfit,q_pack_report,q_pack_sequences,q_percent_rank_approx,q_pivot_events,q_ppl_buckets,q_quality_gopher,q_quality_sweep,q_query_sql,q_range_join,q_redaction,q_row_logs,q_row_lookup,q_sample_bernoulli,q_sample_stratified,q_sample_temperature,q_scd2,q_search_bm25,q_search_hybrid,q_search_phrase,q_select_cols,q_setitem_const,q_setitem_masked,q_sft_masks,q_sft_pack,q_sft_render,q_shared_spans,q_skew_report,q_span_corrupt,q_split_assign,q_split_leakage,q_stats_linreg,q_stats_quantiles_approx,q_stats_quantiles_approx_check,q_stream_dedupe,q_stream_funnel,q_stream_hostquota,q_stream_sessionize,q_stream_tokenize,q_stream_upsert,q_stream_webingest,q_text_chunks,q_text_langid,q_text_langmix,q_text_normalize,q_text_quality,q_text_repetition,q_text_tokens,q_tfidf_keywords,q_time_machine,q_time_machine_cols,q_tokenizer_report,q_topk_per_group,q_unigram_byte_encode,q_unigram_encode,q_unigram_segment,q_unigram_train,q_unique,q_update_changed,q_upsert_latest,q_url_canonical,q_url_dedup,q_url_incremental,q_value_counts,q_vocab_report,q_wordpiece_byte_encode,q_wordpiece_encode,q_wordpiece_segment,q_wordpiece_train,q_zorder_layout SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_b2.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_c_b2.log 2>&1
echo "C_b2_done=$?"
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_embed_lsh,q_stats_pca,q_dedup_minhash,q_ann_ivfpq,q_percent_rank,q_stats_corr,q_contamination_report,q_semdedup,q_dedup_cluster_best,q_text_fingerprint,q_dedup_clusters_ls,q_dedup_containment,q_dedup_clusters,q_ntile,q_quantile_bins,q_stats_quantiles,q_sample_stratified_exact,q_graph_triangles_sampled SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_risky.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_c_risky.log 2>&1
echo "C_risky_done=$?"
echo "pipeline_complete"
