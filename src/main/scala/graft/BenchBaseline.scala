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
  *
  * Round-19 bulk re-record: a full 231-query run on a FRESH IDLE
  * machine (152.1 s min-of-2, wall/timed 2.29, zero reprobes,
  * /tmp/r19b_bench_calm.log) undercut 136 recorded floors — the
  * calmest window the suite has had; minima are historical bests, so
  * every undercut floor was lowered ("r19 calm-window"). Cause
  * sentences from deliberate plan changes are preserved behind the
  * "r19 calm;" prefix.
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
    "llm_audio_dedup_clusters" -> 1.604, // r19 calm-window (fresh machine)
    "llm_audio_fingerprint" -> 0.581, // r19 calm-window (fresh machine)
    "llm_audio_index_probe_wide" -> 0.361, // r19 calm-window (fresh machine)
    "llm_audio_neardup" -> 1.102, // r19 final: function-level signature pin REVERTED (paired sf10 A/B measured it a scale loss for cheap kernels); floor restored to the pre-pin r19 calm best
    // Round-18 addition: the cross-modal pair gate (calm pinned:32
    // reps=3 run, /tmp/r18_minima.log — image decode of three arriving
    // classes dominates).
    "llm_stream_pair_gate" -> 1.067, // r19 wrap closing run 2; decode-once pin (narrow post-kernel signature frame)
    // Round-19 addition: both defect directions armed — a THIRD image
    // chain (novel-salt domain) decodes in the arriving set, on top of
    // the existing row's two (best of r19 calm bench + isolated probe).
    "llm_stream_pair_gate_boilerplate" -> 1.332, // r19 wrap closing run 2; decode-once pin (narrow post-kernel signature frame)
    "llm_image_index_probe_wide" -> 0.369, // r19 calm; r18: auto-width layout (sidecar-resolved nb), probe reads fewer saturated files
    "llm_stream_audio_gate" -> 0.709, // r19 calm-window (fresh machine)
    "llm_stream_image_gate" -> 0.718, // r19 calm; r18: auto-width layout
    "llm_video_index_probe_wide" -> 0.310, // r19 calm; r18: auto-width layout
    "llm_video_mjpeg_neardup" -> 3.641, // r19 wrap closing run; decode-once pin (narrow post-kernel signature frame): the media/text kernel runs once per query, not per join side
    "llm_video_mjpeg_phash" -> 2.555, // r19 calm-window (fresh machine)
    "llm_video_strided_index_probe_wide" -> 0.394, // r19 calm; r18: auto-width layout
    "a2_cms_topk" -> 0.920, // r19 calm-window (fresh machine)
    "analyst_trend" -> 0.121, // r19 calm-window (fresh machine)
    "dividend_asof" -> 0.158, // r19 calm-window (fresh machine)
    "dq_chi2_drift" -> 0.181, // r19 calm-window (fresh machine)
    "dq_ks_drift" -> 0.691, // r19 calm-window (fresh machine)
    "dq_mad_outliers_approx" -> 0.507, // r19 calm-window (fresh machine)
    "dq_psi_drift" -> 0.309, // r19 calm-window (fresh machine)
    "events_anomaly_mad" -> 0.535, // r19 calm-window (fresh machine)
    "events_ols_trend" -> 0.721, // r19 wrap closing run
    "graph_labelprop" -> 1.852, // r19 calm-window (fresh machine)
    "llm_sim_range" -> 0.143, // r19 calm-window (fresh machine)
    "llm_sim_range_ivf" -> 0.762, // r19 calm-window (fresh machine)
    "llm_sim_range_ivf_grown" -> 1.026, // r19 calm-window (fresh machine)
    "llm_stream_drift_monitor" -> 0.263, // r19 calm-window (fresh machine)
    "llm_stream_ingest_e2e" -> 5.936, // r19 calm; r18: DELIBERATE plan change - semantic stage on the multi-probe posture (index storage x1, probe width x(p+1)); 1.66x on the corpus-shaped fixture batch, priced in BASELINE.md round-18 posture row
    // Round-17 additions (recall contracts, cross-modal pair checks,
    // video ingest gate): min across two full calm-window runs
    // (/tmp/bench_full_r17{a,b}.raw), sf0.1 local[32], reps=2.
    "llm_lsh_recall_auto" -> 0.812, // r19 calm; r17
    "llm_lsh_multiprobe_recall" -> 1.144, // r19 calm; r17
    "llm_caption_boilerplate" -> 0.976, // r19 calm; r17
    "llm_pair_contamination" -> 2.306, // r19 calm; r17
    "llm_stream_video_gate" -> 0.622, // r19 calm; r18: auto-width layout
    "llm_stream_pii_redact" -> 0.183, // r19 calm-window (fresh machine)
    "llm_video_neardup" -> 0.324, // r19 final: function-level signature pin REVERTED (paired sf10 A/B measured it a scale loss for cheap kernels); floor restored to the pre-pin r19 calm best
    "llm_video_phash" -> 0.116, // r19 calm-window (fresh machine)
    "llm_video_strided_neardup" -> 0.545, // r20: floor restored to the pre-pin calm best - the in-library pin this 0.522 was measured with was REVERTED in r19 (no caller-side pin exists; hashes flow un-pinned into hammingNearDupPairsSetWide), so the pin-era floor was unattainable
    "llm_weighted_sample" -> 0.070, // r19 calm-window (fresh machine)
    "llm_image_neardup_wide" -> 1.25, // r19 final: function-level signature pin REVERTED (paired sf10 A/B measured it a scale loss for cheap kernels); floor restored to the pre-pin r19 calm best
    "llm_video_dedup_clusters_wide" -> 1.013, // r19 calm-window (fresh machine)
    "a1_yearly_rollup" -> 0.221, // r19 calm-window (fresh machine)
    "a2_approx_distinct" -> 0.339, // r19 calm-window (fresh machine)
    "a2_approx_percentile" -> 0.470, // r19 calm-window (fresh machine)
    "a2_cube" -> 0.308, // r19 calm-window (fresh machine)
    "a2_distinct_exact" -> 0.376, // r19 calm-window (fresh machine)
    "a2_grouping_sets" -> 0.256, // r19 calm-window (fresh machine)
    "a2_hll_sketch" -> 0.894,
    "a2_rollup" -> 0.258, // r19 calm-window (fresh machine)
    "api_earnings_estimates" -> 0.044, // r19 calm-window (fresh machine)
    "api_options_chain" -> 0.206, // r19 calm-window (fresh machine)
    "asof_join_lookup" -> 0.404, // r19 calm-window (fresh machine)
    "d1_fault_isolation" -> 0.146, // r19 calm-window (fresh machine)
    "d3_full_pipeline" -> 3.077, // r19 wrap closing run
    "dq_duplicate_keys" -> 0.154, // r19 calm-window (fresh machine)
    "dq_referential" -> 0.528, // r19 calm-window (fresh machine)
    "dq_rule_violations" -> 0.142, // r19 calm-window (fresh machine)
    "events_ab_lift" -> 0.340, // r19 calm-window (fresh machine)
    "events_anomaly_zscore" -> 0.263, // r19 calm-window (fresh machine)
    "events_corr" -> 0.450,
    "events_ewma" -> 0.204, // r19 calm-window (fresh machine)
    "events_from_json" -> 0.364,
    "events_funnel" -> 0.371, // r19 calm-window (fresh machine)
    "events_hourly_agg" -> 0.181, // r19 calm-window (fresh machine)
    "events_json_props" -> 0.314, // r19 calm-window (fresh machine)
    "events_retention" -> 0.351, // r19 calm-window (fresh machine)
    "events_session_assembly" -> 0.247, // r19 calm-window (fresh machine)
    "events_sessionize" -> 0.187,
    "f8_split_suffix" -> 0.064, // r19 calm-window (fresh machine)
    "graph_clustering" -> 1.662, // r19 calm; r11 second pass
    "graph_kcore" -> 1.465, // r19 calm; r11 second pass
    "graph_pagerank" -> 2.861,
    "graph_triangles" -> 1.354, // r19 calm; r11 second pass
    "histogram_prices" -> 0.340,
    "j1_glob_key_recovery" -> 0.248,
    "j2_semi_join" -> 0.294, // r19 calm-window (fresh machine)
    "j3_star_join" -> 0.673, // r19 calm-window (fresh machine)
    "j4_salted_join" -> 0.979,
    "j5_range_join_bucketed" -> 0.196, // r19 calm-window (fresh machine)
    "j6_bucketed_join" -> 0.784,
    "j7_fuzzy_join" -> 0.589, // r11 second pass
    "llm_ann_recall" -> 0.885, // r19 calm-window (fresh machine)
    "llm_audio_energy" -> 0.340, // r19 calm-window (fresh machine)
    "llm_audio_features" -> 0.332,
    "llm_audio_resample" -> 0.574, // r19 calm-window (fresh machine)
    "llm_bigram_surprisal" -> 0.748,
    "llm_bpe_encode" -> 0.588, // r19 calm; r11 array-native rewrite (was 2.301)
    "llm_bpe_merge2" -> 0.534, // r19 calm-window (fresh machine)
    "llm_bpe_pairs" -> 0.302,
    "llm_bpe_train" -> 0.597, // r19 calm; r11 array-native rewrite (was 1.137)
    "llm_cdc_chunks" -> 0.386,
    "llm_cdc_dedup" -> 0.642, // r19 calm-window (fresh machine)
    "llm_centroid_classify" -> 0.410, // r19 calm-window (fresh machine)
    "llm_chunk" -> 0.177,
    "llm_cluster_canonical" -> 1.151,
    "llm_cluster_split" -> 0.877,
    "llm_curation_pipeline" -> 0.703,
    "llm_containment" -> 1.104, // r19 calm; r11 second pass
    "llm_decontaminate" -> 0.386, // r19 calm-window (fresh machine)
    // round-11 additions: minima from the round's isolated reps=3 runs
    "llm_decontaminate_neardup" -> 0.688, // r19 calm-window (fresh machine)
    "llm_decontaminate_bloom" -> 0.528,
    "llm_dedup_clusters" -> 0.887,
    "llm_dedup_embedding" -> 0.167,
    "llm_dedup_exact" -> 0.203, // r19 calm-window (fresh machine)
    "llm_dedup_minhash_lsh" -> 0.362,
    "llm_dedup_ngram_jaccard" -> 0.836,
    "llm_dedup_simhash_pairs" -> 0.458, // r19 calm-window (fresh machine)
    "llm_index_compact" -> 0.458, // r19 calm; maintenance dataflow timed by design
    "llm_ivfpq_compact" -> 0.839, // r19 calm; r12: full lifecycle (PQ train + 3
    // appends + compaction + 2 probes) rebuilt per rep by design
    "llm_ivfpq_rebuild" -> 2.049, // r19 calm; r12: drift fixture + retrain + swap
    "j8_entity_resolution" -> 1.987, // r19 calm; r12: fuzzy join + closure rounds
    "llm_quality_clf_train" -> 3.604, // r19 calm; r17 calm (was 4.146 r12); the
    // r16 8.5-8.8 s driver readings adjudicated as window drift by an
    // isolated fresh-JVM probe (5.05 s) + two calm full runs (4.07/3.87)
    "llm_quality_clf_score" -> 0.511, // r19 calm; r12: train + broadcast score
    "llm_clf_auc" -> 0.811, // r19 calm; r12: train + score + rank statistic
    "llm_epoch_mix" -> 0.482, // r19 calm; r12
    "llm_stream_clf_gate" -> 0.515, // r19 calm; r12: artifact prebuilt, pure probe
    "llm_bpe_frozen_encode" -> 0.333, // r19 calm; r12: frozen rules, zero-shuffle
    "dq_k_anonymity" -> 0.115, // r19 calm; r12
    "dq_k_suppress" -> 0.145, // r19 calm; r12
    "dq_dp_noisy_count" -> 0.111, // r19 calm; r12
    "dq_benford" -> 0.199, // r19 calm; r12
    "events_drawdown" -> 0.256, // r19 wrap closing run
    "llm_semantic_dedup" -> 3.218, // r19 calm; inline: k-means fit + closure + contract
    "llm_semantic_dedup_index" -> 3.109, // r17 calm (was 4.135); the r16
    // 7.5 s calm reading adjudicated as drift (isolated probe 3.91 s)
    "llm_stream_quality_gate" -> 0.506, // r19 calm; r11 second pass
    "llm_stream_semantic_gate" -> 0.664, // r19 calm; r18: DELIBERATE plan change - multi-probe posture over the 4-table layout (see ingest_e2e note)
    "llm_domain_mix" -> 0.065,
    "llm_exactdup_index_probe" -> 0.430, // r19 calm-window (fresh machine)
    "llm_fingerprint" -> 0.248, // r19 calm-window (fresh machine)
    "llm_dsir_resample" -> 1.114, // r19 calm; r11 second pass
    "llm_dsir_weights" -> 0.838, // r19 calm; r11 second pass
    "llm_hard_negatives" -> 0.208,
    "llm_image_dedup_clusters" -> 1.968, // r19 final: function-level signature pin REVERTED (paired sf10 A/B measured it a scale loss for cheap kernels); floor restored to the pre-pin r19 calm best
    "llm_image_phash" -> 0.578, // r19 calm-window (fresh machine)
    "llm_ivf_recall" -> 0.676, // r19 calm-window (fresh machine)
    "llm_kn_surprisal" -> 0.970, // r19 calm; r11 second pass
    "llm_langid" -> 0.197,
    "llm_length_buckets" -> 0.223,
    "llm_minmax_scale" -> 0.188,
    "llm_mix_proportions" -> 0.224,
    "llm_multimodal_features" -> 0.243,
    "llm_neardup_index_probe" -> 1.696, // r19 calm-window (fresh machine)
    "llm_negative_sample" -> 0.152, // r19 calm-window (fresh machine)
    "llm_ngram_novelty" -> 0.494,
    "llm_normalize" -> 0.266,
    "llm_oov_rate" -> 0.352,
    "llm_pack_shards" -> 0.224,
    "llm_pii_redact" -> 0.470,
    "llm_quality" -> 0.182, // r19 calm-window (fresh machine)
    "llm_quality_gate" -> 0.450, // r19 calm-window (fresh machine)
    "llm_quality_quantiles" -> 0.085, // r19 calm-window (fresh machine)
    "llm_quality_sample" -> 0.230,
    "llm_quantize_int8" -> 0.281, // r19 calm-window (fresh machine)
    "llm_quota_sample" -> 0.097, // r19 calm-window (fresh machine)
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
    "llm_sim_topk_ivf_grown" -> 0.993, // r19 calm; r19 re-record (was 0.838) — cause above
    "llm_sim_topk_ivf_index" -> 0.840,
    "llm_sim_topk_lsh" -> 0.548,
    "llm_sim_topk_lsh_grown" -> 0.813, // r19 calm; r19 re-record (was 0.614) — cause above
    "llm_sim_topk_lsh_index" -> 0.570,
    "llm_sim_topk_pq" -> 1.772, // r19 calm; r11 second pass (training-inclusive)
    "llm_sim_topk_pq_index" -> 1.190, // r19 calm; r11 second pass
    "llm_sim_topk_sq8" -> 0.336,
    "llm_sim_topk_sq8_rerank" -> 0.376,
    "llm_simhash" -> 0.202, // r19 calm-window (fresh machine)
    "llm_simhash_index_probe" -> 0.438, // r19 calm-window (fresh machine)
    "llm_simhash_wide_index_probe" -> 0.413, // r19 calm-window (fresh machine)
    "llm_simhash_wide_pairs" -> 0.688, // r19 final: function-level signature pin REVERTED (paired sf10 A/B measured it a scale loss for cheap kernels); floor restored to the pre-pin r19 calm best
    "llm_source_overlap" -> 0.705,
    "llm_split_hash" -> 0.063,
    "llm_sq8_recall" -> 0.516,
    "llm_stream_dedup_gate" -> 0.672, // r19 calm-window (fresh machine)
    "llm_stream_neardup_gate" -> 0.585, // r19 calm-window (fresh machine)
    "llm_strip_boilerplate" -> 0.683,
    "llm_substring_clean" -> 0.780,
    "llm_substring_dup" -> 0.483,
    "llm_substring_spans" -> 0.529,
    "llm_tf_cosine" -> 0.439,
    "llm_tfidf" -> 0.431, // r19 calm-window (fresh machine)
    "llm_tokens" -> 0.172, // r19 calm-window (fresh machine)
    "llm_uniform_sample" -> 0.066, // r19 calm-window (fresh machine)
    "llm_unigram_surprisal" -> 0.400, // r19 calm-window (fresh machine)
    "llm_video_features" -> 0.080, // r19 calm-window (fresh machine)
    "llm_vocab_topk" -> 0.161,
    "llm_winnow" -> 0.276,
    "llm_winnow_pairs" -> 0.510, // r19 calm-window (fresh machine)
    "llm_zscore_scale" -> 0.291,
    "m2_standardize_combine" -> 0.649,
    "o1_union_by_name" -> 0.105,
    "o2_nway_union" -> 0.219,
    "o5_grouped_topk" -> 0.146, // r19 calm-window (fresh machine)
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
    "s16_schema_evolution" -> 0.284, // r19 calm-window (fresh machine)
    "s17_dynamic_overwrite" -> 0.368,
    "s1_csv_roundtrip" -> 0.768,
    "s2_w1_skiprows" -> 0.239,
    "s3_key_list" -> 0.322,
    "s4_cash_flow_width" -> 0.154,
    "s4_full_width_transpose" -> 0.168, // r19 calm-window (fresh machine)
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
    "st6_windowed_topk" -> 0.180, // r19 calm-window (fresh machine)
    "w2_keyed_window" -> 0.206,
    "warehouse_ddl_typed" -> 0.299, // r19 calm-window (fresh machine)
    "warehouse_upsert" -> 0.134, // r19 calm-window (fresh machine)
    "winsorize_prices" -> 0.617,
    "zorder_curve" -> 0.147)
}
