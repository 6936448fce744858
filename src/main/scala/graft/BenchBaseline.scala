package graft

/** Recorded per-query bench minima (seconds, min across all recorded
  * runs: the BENCH_r01-r09 driver artifacts plus local round-10 calm-window
  * runs at sf0.1, local[32], reps>=2; the 8 round-10 additions seed from
  * the round-10 160-query full run). This is the self-probe reference
  * [[Bench]] compares against: a suite time above `2 x` the recorded
  * minimum marks the query for an in-artifact isolation re-probe
  * (BASELINE.md "Round-10 Bench self-probe protocol").
  *
  * Regenerate when a query's plan deliberately changes: take the new
  * calm-window minimum from a fresh full run. Values are ONLY meaningful
  * at sf0.1 - the self-probe skips comparison on other SF dirs.
  */
object BenchBaseline {
  val sfDir = "/root/testdata/sf0.1"
  val minima: Map[String, Double] = Map(
    // Round-15 closure of the uncovered set (r13 verdict #1, r14 #2):
    // min across two calm-window isolated runs (reps=2 each) of the 23
    // previously-baselined-nowhere queries, sf0.1 local[32].
    // Round-16 additions (the 11 queries registered since r15: the wide
    // index-probe/MJPEG family and the audio fingerprint + perceptual
    // gate families): min across two calm-window isolated runs (reps=2
    // each), sf0.1 local[32] (/tmp/bench_new_{1,2}.json).
    "llm_audio_dedup_clusters" -> 2.513, // r16 calm-window
    "llm_audio_fingerprint" -> 0.648, // r16 calm-window
    "llm_audio_index_probe_wide" -> 1.364, // r16 calm-window
    "llm_audio_neardup" -> 1.366, // r16 calm-window
    // Round-18 addition: the cross-modal pair gate (calm pinned:32
    // reps=3 run, /tmp/r18_minima.log — image decode of three arriving
    // classes dominates).
    "llm_stream_pair_gate" -> 4.808, // r18 calm-window
    // Round-19 addition: both defect directions armed — a THIRD image
    // chain (novel-salt domain) decodes in the arriving set, on top of
    // the existing row's two (best of r19 calm bench + isolated probe).
    "llm_stream_pair_gate_boilerplate" -> 6.322, // r19 calm-window
    "llm_image_index_probe_wide" -> 0.744, // r18: auto-width layout (sidecar-resolved nb), probe reads fewer saturated files
    "llm_stream_audio_gate" -> 1.347, // r16 calm-window
    "llm_stream_image_gate" -> 0.798, // r18: auto-width layout
    "llm_video_index_probe_wide" -> 0.659, // r18: auto-width layout
    "llm_video_mjpeg_neardup" -> 6.76, // r16 calm-window
    "llm_video_mjpeg_phash" -> 3.805, // r16 calm-window
    "llm_video_strided_index_probe_wide" -> 0.772, // r18: auto-width layout
    "a2_cms_topk" -> 1.733, // r15 calm-window
    "analyst_trend" -> 0.308, // r15 calm-window
    "dividend_asof" -> 0.231, // r15 calm-window
    "dq_chi2_drift" -> 0.360, // r15 calm-window
    "dq_ks_drift" -> 0.955, // r15 calm-window
    "dq_mad_outliers_approx" -> 0.853, // r15 calm-window
    "dq_psi_drift" -> 0.439, // r15 calm-window
    "events_anomaly_mad" -> 0.691, // r15 calm-window
    "events_ols_trend" -> 0.725, // r15 calm-window
    "graph_labelprop" -> 2.509, // r15 calm-window
    "llm_sim_range" -> 0.259, // r15 calm-window
    "llm_sim_range_ivf" -> 1.183, // r15 calm-window
    "llm_sim_range_ivf_grown" -> 1.139, // r15 calm-window
    "llm_stream_drift_monitor" -> 0.317, // r15 calm-window
    "llm_stream_ingest_e2e" -> 11.673, // r18: DELIBERATE plan change - semantic stage on the multi-probe posture (index storage x1, probe width x(p+1)); 1.66x on the corpus-shaped fixture batch, priced in BASELINE.md round-18 posture row
    // Round-17 additions (recall contracts, cross-modal pair checks,
    // video ingest gate): min across two full calm-window runs
    // (/tmp/bench_full_r17{a,b}.raw), sf0.1 local[32], reps=2.
    "llm_lsh_recall_auto" -> 1.082, // r17
    "llm_lsh_multiprobe_recall" -> 1.295, // r17
    "llm_caption_boilerplate" -> 1.102, // r17
    "llm_pair_contamination" -> 2.668, // r17
    "llm_stream_video_gate" -> 0.993, // r18: auto-width layout
    "llm_stream_pii_redact" -> 0.198, // r15 calm-window
    "llm_video_neardup" -> 0.381, // r16 calm-window
    "llm_video_phash" -> 0.131, // r16 calm-window
    "llm_video_strided_neardup" -> 0.764, // r16 calm-window
    "llm_weighted_sample" -> 0.091, // r15 calm-window
    "llm_image_neardup_wide" -> 1.586, // r16 calm-window
    "llm_video_dedup_clusters_wide" -> 1.356, // r16 calm-window
    "a1_yearly_rollup" -> 0.495,
    "a2_approx_distinct" -> 0.523,
    "a2_approx_percentile" -> 0.806,
    "a2_cube" -> 0.358,
    "a2_distinct_exact" -> 0.523,
    "a2_grouping_sets" -> 0.284,
    "a2_hll_sketch" -> 0.894,
    "a2_rollup" -> 0.262,
    "api_earnings_estimates" -> 0.082,
    "api_options_chain" -> 0.240,
    "asof_join_lookup" -> 0.595,
    "d1_fault_isolation" -> 0.207,
    "d3_full_pipeline" -> 3.090,
    "dq_duplicate_keys" -> 0.161,
    "dq_referential" -> 0.570,
    "dq_rule_violations" -> 0.171,
    "events_ab_lift" -> 0.352,
    "events_anomaly_zscore" -> 0.286,
    "events_corr" -> 0.450,
    "events_ewma" -> 0.228,
    "events_from_json" -> 0.364,
    "events_funnel" -> 0.413,
    "events_hourly_agg" -> 0.190,
    "events_json_props" -> 0.320,
    "events_retention" -> 0.369,
    "events_session_assembly" -> 0.251,
    "events_sessionize" -> 0.187,
    "f8_split_suffix" -> 0.070,
    "graph_clustering" -> 3.723, // r11 second pass
    "graph_kcore" -> 3.330, // r11 second pass
    "graph_pagerank" -> 2.861,
    "graph_triangles" -> 2.323, // r11 second pass
    "histogram_prices" -> 0.340,
    "j1_glob_key_recovery" -> 0.248,
    "j2_semi_join" -> 0.295,
    "j3_star_join" -> 0.676,
    "j4_salted_join" -> 0.979,
    "j5_range_join_bucketed" -> 0.215,
    "j6_bucketed_join" -> 0.784,
    "j7_fuzzy_join" -> 0.589, // r11 second pass
    "llm_ann_recall" -> 0.971,
    "llm_audio_energy" -> 0.346,
    "llm_audio_features" -> 0.332,
    "llm_audio_resample" -> 0.626,
    "llm_bigram_surprisal" -> 0.748,
    "llm_bpe_encode" -> 1.095, // r11 array-native rewrite (was 2.301)
    "llm_bpe_merge2" -> 0.707,
    "llm_bpe_pairs" -> 0.302,
    "llm_bpe_train" -> 0.813, // r11 array-native rewrite (was 1.137)
    "llm_cdc_chunks" -> 0.386,
    "llm_cdc_dedup" -> 0.646,
    "llm_centroid_classify" -> 0.412,
    "llm_chunk" -> 0.177,
    "llm_cluster_canonical" -> 1.151,
    "llm_cluster_split" -> 0.877,
    "llm_curation_pipeline" -> 0.703,
    "llm_containment" -> 1.825, // r11 second pass
    "llm_decontaminate" -> 0.403,
    // round-11 additions: minima from the round's isolated reps=3 runs
    "llm_decontaminate_neardup" -> 1.152,
    "llm_decontaminate_bloom" -> 0.528,
    "llm_dedup_clusters" -> 0.887,
    "llm_dedup_embedding" -> 0.167,
    "llm_dedup_exact" -> 0.217,
    "llm_dedup_minhash_lsh" -> 0.362,
    "llm_dedup_ngram_jaccard" -> 0.836,
    "llm_dedup_simhash_pairs" -> 0.724,
    "llm_index_compact" -> 3.526, // maintenance dataflow timed by design
    "llm_ivfpq_compact" -> 14.275, // r12: full lifecycle (PQ train + 3
    // appends + compaction + 2 probes) rebuilt per rep by design
    "llm_ivfpq_rebuild" -> 14.558, // r12: drift fixture + retrain + swap
    "j8_entity_resolution" -> 3.470, // r12: fuzzy join + closure rounds
    "llm_quality_clf_train" -> 3.870, // r17 calm (was 4.146 r12); the
    // r16 8.5-8.8 s driver readings adjudicated as window drift by an
    // isolated fresh-JVM probe (5.05 s) + two calm full runs (4.07/3.87)
    "llm_quality_clf_score" -> 5.158, // r12: train + broadcast score
    "llm_clf_auc" -> 5.460, // r12: train + score + rank statistic
    "llm_epoch_mix" -> 0.904, // r12
    "llm_stream_clf_gate" -> 0.751, // r12: artifact prebuilt, pure probe
    "llm_bpe_frozen_encode" -> 0.752, // r12: frozen rules, zero-shuffle
    "dq_k_anonymity" -> 0.363, // r12
    "dq_k_suppress" -> 0.478, // r12
    "dq_dp_noisy_count" -> 0.357, // r12
    "dq_benford" -> 0.601, // r12
    "events_drawdown" -> 0.726, // r12
    "llm_semantic_dedup" -> 5.709, // inline: k-means fit + closure + contract
    "llm_semantic_dedup_index" -> 3.109, // r17 calm (was 4.135); the r16
    // 7.5 s calm reading adjudicated as drift (isolated probe 3.91 s)
    "llm_stream_quality_gate" -> 1.159, // r11 second pass
    "llm_stream_semantic_gate" -> 1.579, // r18: DELIBERATE plan change - multi-probe posture over the 4-table layout (see ingest_e2e note)
    "llm_domain_mix" -> 0.065,
    "llm_exactdup_index_probe" -> 0.611,
    "llm_fingerprint" -> 0.260,
    "llm_dsir_resample" -> 1.316, // r11 second pass
    "llm_dsir_weights" -> 1.056, // r11 second pass
    "llm_hard_negatives" -> 0.208,
    "llm_image_dedup_clusters" -> 2.951, // r16 calm-window
    "llm_image_phash" -> 0.692, // r16 calm-window
    "llm_ivf_recall" -> 0.761,
    "llm_kn_surprisal" -> 1.416, // r11 second pass
    "llm_langid" -> 0.197,
    "llm_length_buckets" -> 0.223,
    "llm_minmax_scale" -> 0.188,
    "llm_mix_proportions" -> 0.224,
    "llm_multimodal_features" -> 0.243,
    "llm_neardup_index_probe" -> 1.928,
    "llm_negative_sample" -> 0.170,
    "llm_ngram_novelty" -> 0.494,
    "llm_normalize" -> 0.266,
    "llm_oov_rate" -> 0.352,
    "llm_pack_shards" -> 0.224,
    "llm_pii_redact" -> 0.470,
    "llm_quality" -> 0.204,
    "llm_quality_gate" -> 0.469,
    "llm_quality_quantiles" -> 0.086,
    "llm_quality_sample" -> 0.230,
    "llm_quantize_int8" -> 0.296,
    "llm_quota_sample" -> 0.098,
    "llm_repetition" -> 0.603,
    "llm_sim_topk_brute" -> 0.183,
    "llm_sim_topk_ivf" -> 1.994,
    // Round-19 adjudication of the r18 over-2x pair (r18 verdict #2):
    // both GROWN-index probes stayed >2x their r10-era minima in a calm
    // isolated fresh-JVM run (load 0.07, reps=3, ZERO spill) AND the
    // same round's full bench — no plan change since the fixtures were
    // versioned (lsh_grown_v2 128 files / ivf_grown_v3 ~630 files,
    // completion-marker-stable across rounds), so the old floor is no
    // longer reachable: the rows are dominated by per-file open cost +
    // the suite's constant factors, which drifted as the registry grew
    // 160 -> 231 (the r17 llm_quality_clf_train adjudication class).
    // Re-recorded from the round-19 calm evidence (best of in-suite
    // bench and the isolated probe, /tmp/r19_{bench_calm,calmprobe}.log).
    "llm_sim_topk_ivf_grown" -> 2.129, // r19 re-record (was 0.838) — cause above
    "llm_sim_topk_ivf_index" -> 0.840,
    "llm_sim_topk_lsh" -> 0.548,
    "llm_sim_topk_lsh_grown" -> 1.356, // r19 re-record (was 0.614) — cause above
    "llm_sim_topk_lsh_index" -> 0.570,
    "llm_sim_topk_pq" -> 3.664, // r11 second pass (training-inclusive)
    "llm_sim_topk_pq_index" -> 2.901, // r11 second pass
    "llm_sim_topk_sq8" -> 0.336,
    "llm_sim_topk_sq8_rerank" -> 0.376,
    "llm_simhash" -> 0.392,
    "llm_simhash_index_probe" -> 0.888,
    "llm_simhash_wide_index_probe" -> 3.399,
    "llm_simhash_wide_pairs" -> 2.917,
    "llm_source_overlap" -> 0.705,
    "llm_split_hash" -> 0.063,
    "llm_sq8_recall" -> 0.516,
    "llm_stream_dedup_gate" -> 0.839,
    "llm_stream_neardup_gate" -> 5.272,
    "llm_strip_boilerplate" -> 0.683,
    "llm_substring_clean" -> 0.780,
    "llm_substring_dup" -> 0.483,
    "llm_substring_spans" -> 0.529,
    "llm_tf_cosine" -> 0.439,
    "llm_tfidf" -> 0.432,
    "llm_tokens" -> 0.207,
    "llm_uniform_sample" -> 0.071,
    "llm_unigram_surprisal" -> 0.446,
    "llm_video_features" -> 0.124,
    "llm_vocab_topk" -> 0.161,
    "llm_winnow" -> 0.276,
    "llm_winnow_pairs" -> 0.591,
    "llm_zscore_scale" -> 0.291,
    "m2_standardize_combine" -> 0.649,
    "o1_union_by_name" -> 0.105,
    "o2_nway_union" -> 0.219,
    "o5_grouped_topk" -> 0.157,
    "o5_intersect_except" -> 0.198,
    "o5_topk" -> 0.087,
    "p10_nested_json" -> 0.100,
    "p1_invalid_date_filter" -> 0.294,
    "p2_p4_filter_project" -> 0.141,
    "p5_p6_lit_derived" -> 0.126,
    "p7_allowlist_isin" -> 0.105,
    "p8_rename" -> 0.065,
    "profile_columns" -> 1.200,
    "r1_transpose_roundtrip" -> 0.749,
    "s10_autodetect_load" -> 0.237,
    "s15_compaction" -> 0.612,
    "s16_schema_evolution" -> 0.296,
    "s17_dynamic_overwrite" -> 0.368,
    "s1_csv_roundtrip" -> 0.768,
    "s2_w1_skiprows" -> 0.239,
    "s3_key_list" -> 0.322,
    "s4_cash_flow_width" -> 0.154,
    "s4_full_width_transpose" -> 0.172,
    "s4_multi_sheet_pipeline" -> 0.910,
    "s4_statement_transpose" -> 0.324,
    "s5_p9_json_info" -> 0.086,
    "s6_partitioned_write" -> 0.512,
    "s7_s9_warehouse_sql" -> 0.235,
    "s8_s10_ndjson_roundtrip" -> 0.235,
    "scd2_intervals" -> 0.225,
    "serial_surrogate_key" -> 0.219,
    "skew_topk" -> 0.121,
    "st1_tumbling_window" -> 0.170,
    "st2_session_window" -> 0.285,
    "st3_sliding_window" -> 0.147,
    "st4_interval_join" -> 0.158,
    "st5_stream_static_join" -> 0.186,
    "st6_windowed_topk" -> 0.253,
    "w2_keyed_window" -> 0.206,
    "warehouse_ddl_typed" -> 0.326,
    "warehouse_upsert" -> 0.141,
    "winsorize_prices" -> 0.617,
    "zorder_curve" -> 0.147)
}
