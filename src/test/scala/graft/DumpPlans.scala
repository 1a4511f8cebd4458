package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool (Test/runMain graft.DumpPlans): regenerates docs/PLANS.md with
  * the formatted physical plans of the headline queries, for plan-shape
  * review (pushdown, broadcast, partial aggregation, exchange count). */
object DumpPlans {
  val headline = Seq("a1_lineitem_pricing", "j1_join_agg", "j3_join_4way",
    "t5_changelog_count", "s3_changelog_latest", "t7_window_tumbling",
    "d4_ngram_jaccard", "d2_dedup_minhash", "e1_embed_nn", "o1_sort_limit",
    "cdc1_source_batch", "hll1_approx_distinct", "qz1_quantize_int8",
    "x6_repetition", "dc1_decontam", "pk1_pack",
    "dc2_decontam_bloom", "iv1_interval_join", "sd1_span_dedup",
    "pq1_ann", "pq2_ivfadc", "z1_zorder", "sm3_mixture_sample",
    "lm1_bigram_lm", "fz1_fuzzy_neighbors", "cs1_zipf", "ds1_dsir_select",
    "lm2_bigram_lm_capped", "ti1_tfidf_topk", "ws1_weighted_sample",
    "cp1_curation_pipeline", "rc1_recursive_closure", "t8_window_sliding",
    "q18_large_orders", "lm3_bigram_lm_trimmed", "ds2_dsir_capped",
    "m1_multimodal_meta", "f4_json_funcs",
    "bp1_boilerplate_strip", "u1_url_canon", "ep1_epoch_plan",
    "pr1_pagerank", "rt1_bm25_retrieval", "da1_domain_authority",
    "qc1_classifier_gate", "rp1_project_vectors", "js1_jsonl_roundtrip",
    "x7_compression", "wa1_warc_parse", "wf1_url_filter",
    "ht1_html_extract", "wp1_web_pipeline", "pf1_profile",
    "d6_dedup_keep_best", "dc3_semantic_decontam", "tk1_bpe_tokenize",
    "tk2_bpe_ids", "bt1_batch_assembly", "tp1_pretrain_pipeline",
    "sp2_split_by_group", "ug1_unigram_tokenize",
    "qc2_classifier_train", "sn1_snapshot_diff", "in1_incremental_curation",
    "or1_orc_roundtrip", "sh1_shard_roundtrip", "bk1_bucketed_join",
    "z2_compact", "u2_psl_domain", "pf2_profile_hll",
    "qc3_gate_at_quantile", "rj1_range_join_binned", "rj2_interval_overlap",
    "cv1_csv_roundtrip", "rs1_resample_gapfill", "as1_alpha_mixture",
    "am1_alpha_epoch_plan", "m3_audio_pcm_decode", "d2y_minhash_recall",
    "sc1_scd2_history", "sc2_pit_lookup",
    "m4_image_pixel_decode", "km1_kmeans_assign", "cdc4_schema_evolution",
    "au1_classifier_auc", "au2_calibration", "pt1_partition_pruning",
    "pt2_dynamic_pruning", "fz2_fuzzy_match", "hb1_hilbert",
    "tc1_triangles", "un1_unicode_nfc", "m5_video_sample_table",
    "q7_volume_shipping", "q10_returned_items", "w3_range_window",
    "z3_compact_incremental", "nn1_null_aware_anti", "au3_confusion",
    "dd1_corpus_changelog", "pd1_padding_stats", "qs2x_grouped_quantiles",
    "ses2_dynamic_gap", "q4_order_priority", "mh1_image_dhash",
    "mh2_image_neardup", "dq1_expectations", "ah1_audio_fingerprint",
    "q6_revenue_forecast", "q8_market_share", "q9_product_profit",
    "q13_cust_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_qty_revenue", "q19_disjunctive_pred",
    "q21_waiting_suppliers", "q22_dormant_customers",
    "cms1x_point_estimates", "kmv1x_mergeable_sketches",
    "bf1_bfs_distance", "wc2_incremental_components",
    "fn1_funnel_steps", "co1_cohort_retention", "hy1_hybrid_rrf",
    "pv1_k_anonymity", "pv2x_dp_noise_bound", "dr1_drift_tvd",
    "rt2_bm25_from_index", "ct1_containment",
    "mv1_rollup_rewrite", "ov1_partition_backfill", "ap1_agg_pushdown",
    "qb1x_quantile_bins", "cr1_correlations", "aqp1x_sampled_counts",
    "lk1_broadcast_range_lookup", "ts1_rolling_anomaly",
    "pa1_transition_counts", "at1_attribution", "qn1_quantile_normalize",
    "wm1_weighted_median", "np1_nucleus_select", "la1_lateness_census",
    "hn1_hard_negatives", "rb1_robots_gate", "fh1x_feature_hash_mass",
    "jc1x_join_cardinality", "ny1_neyman_allocation", "ab1_welch_t",
    "q2_min_cost_supplier", "q11_important_stock", "q12_priority_by_class",
    "q16_supplier_part_counts", "q20_promotion_suppliers",
    "ols1_linear_fit", "chi1_chisq_independence", "sky1_pareto_frontier",
    "tg1_target_encode_loo", "pp1_preference_pairs", "bars1_ohlc_bars",
    "gini1_length_concentration", "mw1_mann_whitney", "srk1_spearman",
    "pmi1_bigram_lift", "vad1_energy_segments", "vp1_vit_patches",
    "hp1_vocab_growth", "cdk1_content_chunks", "ph1_phrase_search",
    "twap1_time_weighted_avg", "ia1_interarrival_hist",
    "pt3_path_trigrams", "vo1_vocab_overlap", "sil1_kmeans_silhouette",
    "mnn1_mutual_nearest", "ent1_source_entropy", "mad1_robust_outliers",
    "ks1_kolmogorov_smirnov", "cpd1_cusum_changepoint",
    "li1_interpolate_grid", "dow1_seasonality", "dau1_growth_accounting",
    "pz1_two_proportion", "lcc1_local_clustering",
    "asr1_degree_assortativity", "xc1_cross_correlation",
    "psi1_population_stability",
    "na1_nelson_aalen", "bd1_benford_digits", "bs1_poisson_bootstrap",
    "ew1_ewma_hourly", "fi1_frequent_pairs", "cf1_conformal_interval",
    "pca1_covariance", "ppr1_personalized_pagerank",
    "dt1_decision_stump", "mi1_mutual_information",
    "iso1x_isotonic_calibration", "db1_dbscan_grid",
    "tm1_trimmed_mean", "ed1_embedding_drift", "knn1_loo_accuracy",
    "br1_brier_score", "lp1_label_propagation", "rn1_ransac_fit",
    "acf1_autocorrelation", "an1_anchor_text",
    "pca2_incremental_covariance", "kf1_kfold_assign",
    "kt1_kendall_tau", "ob1_observed_gate_metrics",
    "kcore1_k_core", "ndcg1_retrieval_eval", "nb1_neighborhood_function",
    "ktr1_k_truss", "sft1_turn_mask_offsets", "kc1_kcenter_coreset",
    "nb2_harmonic_centrality", "tx1_consistent_snapshot", "pv3_l_diversity",
    "gd1_deletion_cascade", "ir1_retrieval_pr")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb ++= "# PLANS — physical plan audit of headline queries\n\n"
    sb ++= "Regenerate with `sbt \"Test/runMain graft.DumpPlans\"`. Commentary\n"
    sb ++= "in COVERAGE.md / query scaladocs; the properties to check here:\n"
    sb ++= "filters/projections reach the parquet scan (PushedFilters,\n"
    sb ++= "ReadSchema), dimension joins are BroadcastHashJoin, aggregations\n"
    sb ++= "are partial+final HashAggregate pairs, and no plan contains an\n"
    sb ++= "unexpected SortMergeJoin or CartesianProduct.\n"
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= s"\n## $name\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"wrote docs/PLANS.md (${headline.size} plans)")
    spark.stop()
  }
}
