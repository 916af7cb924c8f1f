"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data operators (dedup / similarity / text analysis).
``oracle_sql()`` — matching DuckDB SQL per query (keys without an entry
get the driver's weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalake_iceberg_spark.queries import (
    analytics,
    approx,
    asof,
    corpus_audit,
    curation,
    dedup,
    dq,
    multimodal,
    pipeline_ops,
    similarity,
    stream_queries,
    textops,
    tpch_ext,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver grades the FIRST 50 entries only.
    # Round-6 rotation (the windowed set per round is committed to
    # ROTATION_LEDGER.json; tests/test_rotation_ledger.py enforces that
    # the ledger matches this ordering and that no entry goes more than
    # four recorded rounds without a driver grade): the window holds
    # (a) the 25 entries with no current driver row — the 22 never
    # driver-graded (the r4 cohort + the 7 r5-queued ops) plus the 3
    # formerly-`no_oracle` entries whose stale r3 rows predate their
    # oracles — (b) the 5 curation aggregates parked since r3,
    # (c) the oldest greens (the 12-entry dedup/similarity rotation
    # set, last graded r2), and (d) the 7 corpus audits new in r6.
    # r7 window MUST lead with the 15 entries whose last window is r2
    # or r1 (cadence test enforces): doc_fingerprint,
    # grouping_sets_revenue, lang_id, pivot_status_by_priority,
    # q2/q4/q6/q7/q8/q9/q11/q12, quality_score, rolling_revenue_7d,
    # top_parts_per_brand — then merge_upsert / stream_hourly /
    # stream_dedup / pack_sequences (last-r3) and fresh rotation.
    return {
        # --- flagship: graded every round ---
        "q1_pricing_summary": analytics.q1_pricing_summary,
        # --- never driver-graded: the r4 cohort ---
        "incremental_dedup": dedup.incremental_dedup,
        "kmeans_clusters": similarity.kmeans_clusters,
        "semantic_dedup": similarity.semantic_dedup,
        "ngram_lm_score": textops.ngram_lm_score,
        "chunk_documents": curation.chunk_documents,
        "weighted_sample": curation.weighted_sample,
        "ngram_contamination": curation.ngram_contamination,
        "zipf_stats": textops.zipf_stats,
        "mixture_weights": curation.mixture_weights,
        "quality_deciles": curation.quality_deciles,
        "boilerplate_ngrams": curation.boilerplate_ngrams,
        "ivf_recall": similarity.ivf_recall,
        # --- never driver-graded: queued in r5 ---
        "minhash_recall": dedup.minhash_recall,  # sampled-truth LSH recall audit
        "unpivot_event_metrics": pipeline_ops.unpivot_event_metrics,
        "cms_heavy_hitters": pipeline_ops.cms_heavy_hitters,
        "pq_quant_error": similarity.pq_quant_error,
        "pq_ann_topk": similarity.pq_ann_topk,
        "mad_outlier_days": pipeline_ops.mad_outlier_days,
        # --- never driver-graded: streaming parity ---
        "stream_running_stats": stream_queries.stream_running_stats,
        "stream_click_attribution": stream_queries.stream_click_attribution,
        "stream_session_stats": stream_queries.stream_session_stats,
        "stream_topk_trending": stream_queries.stream_topk_trending,
        # --- stale `no_oracle` r3 rows; oracles exist since r4 ---
        "approx_distinct_users": approx.approx_distinct_users,
        "approx_value_quantiles": approx.approx_value_quantiles,
        "mm_decode_features": multimodal.mm_decode_features,
        # --- curation aggregates parked since r3 ---
        "winsorized_value_stats": curation.winsorized_value_stats,
        "token_len_histogram": curation.token_len_histogram,
        "oov_rate": curation.oov_rate,
        "embedding_norm_stats": curation.embedding_norm_stats,
        "cube_revenue": curation.cube_revenue,
        # --- oldest greens: dedup/similarity set, last graded r2 ---
        "exact_dedup": dedup.exact_dedup,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dup_clusters": dedup.dup_clusters,
        "knn_bruteforce": similarity.knn_bruteforce,
        "ann_lsh_buckets": similarity.ann_lsh_buckets,
        "centroid_similarity": similarity.centroid_similarity,
        "embedding_neardup_pairs": similarity.embedding_neardup_pairs,
        "ivf_ann_topk": similarity.ivf_ann_topk,
        "mm_asset_stats": multimodal.mm_asset_stats,
        # --- new in r6: corpus-audit layer (graded immediately) ---
        "ngram_novelty": corpus_audit.ngram_novelty,
        "minhash_est_error": corpus_audit.minhash_est_error,
        "dup_graph_degree": corpus_audit.dup_graph_degree,
        "token_gini": corpus_audit.token_gini,
        "knn_label_purity": corpus_audit.knn_label_purity,
        "token_kl_shift": corpus_audit.token_kl_shift,
        "embedding_split_drift": corpus_audit.embedding_split_drift,
        # ---- entries past the driver's 50-entry window ----
        # r7 window leads: last-r2 TPC-H + text ops + last-r3
        # DML/stream/packing.
        "top_parts_per_brand": analytics.top_parts_per_brand,
        "doc_fingerprint": textops.fingerprint,
        "lang_id": textops.lang_id,
        "quality_score": textops.quality_score,
        "rolling_revenue_7d": analytics.rolling_revenue_7d,
        "grouping_sets_revenue": analytics.grouping_sets_revenue,
        "pivot_status_by_priority": analytics.pivot_status_by_priority,
        "q2_min_cost_supplier": tpch_ext.q2_min_cost_supplier,
        "q4_priority_semijoin": analytics.q4_priority_semijoin,
        "q6_forecast_revenue": analytics.q6_forecast_revenue,
        "q7_volume_shipping": analytics.q7_volume_shipping,
        "q8_market_share": tpch_ext.q8_market_share,
        "q9_nation_profit": tpch_ext.q9_nation_profit,
        "q11_important_stock": tpch_ext.q11_important_stock,
        "q12_priority_shipping": tpch_ext.q12_priority_shipping,
        "merge_upsert_orders": analytics.merge_upsert_orders,
        "stream_hourly_rollup": stream_queries.stream_hourly_rollup,
        "stream_dedup_count": stream_queries.stream_dedup_count,
        "pack_sequences": curation.pack_sequences,
        # Fresh r5-green cohort rides the tail; pinned by
        # tests/test_oracle_parity.py either way.
        "funnel_conversion": analytics.funnel_conversion,
        "retention_cohorts": analytics.retention_cohorts,
        "duplicate_span_fraction": dedup.duplicate_span_fraction,
        "gopher_quality": curation.gopher_quality,
        "event_spike_hours": pipeline_ops.event_spike_hours,
        "pmi_collocations": textops.pmi_collocations,
        "vocab_growth": textops.vocab_growth,
        "unigram_entropy": textops.unigram_entropy,
        "decayed_engagement": pipeline_ops.decayed_engagement,
        "props_pii_scan": pipeline_ops.props_pii_scan,
        "salted_user_stats": pipeline_ops.salted_user_stats,
        "sq8_quant_error": similarity.sq8_quant_error,
        "q3_shipping_priority": analytics.q3_shipping_priority,
        "q5_regional_revenue": analytics.q5_regional_revenue,
        "q10_returned_items": analytics.q10_returned_items,
        "dedup_latest_events": analytics.dedup_latest_events,
        "mm_frame_sample": multimodal.mm_frame_sample,
        "batch_stats_events": analytics.batch_stats_events,
        "surrogate_key_orders": analytics.surrogate_key_orders,
        "asof_purchase_click": asof.asof_purchase_click,
        "errors_context_window": asof.errors_context_window,
        "sessionize_events": analytics.sessionize_events,
        "purge_keep_latest": analytics.purge_keep_latest,
        "semi_anti_join_events": analytics.semi_anti_join_events,
        "value_percentiles": approx.value_percentiles,
        "hourly_rollup_events": analytics.hourly_rollup_events,
        "q13_order_distribution": tpch_ext.q13_order_distribution,
        "q14_promo_revenue": analytics.q14_promo_revenue,
        "q15_top_supplier": tpch_ext.q15_top_supplier,
        "q16_supplier_part_count": tpch_ext.q16_supplier_part_count,
        "q17_small_qty_revenue": tpch_ext.q17_small_qty_revenue,
        "q18_large_volume": analytics.q18_large_volume,
        "q19_disjunctive_revenue": analytics.q19_disjunctive_revenue,
        "q20_volume_suppliers": tpch_ext.q20_volume_suppliers,
        "q21_waiting_suppliers": tpch_ext.q21_waiting_suppliers,
        "q22_dormant_customers": analytics.q22_dormant_customers,
        "props_json_stats": pipeline_ops.props_json_stats,
        "hash_split_stats": pipeline_ops.hash_split_stats,
        "bigram_counts": pipeline_ops.bigram_counts,
        "regex_term_scan": pipeline_ops.regex_term_scan,
        "tfidf_top_terms": pipeline_ops.tfidf_top_terms,
        "token_stats": textops.token_stats,
        "dq_violations": dq.dq_violations,
        "column_profile": dq.column_profile,
        "term_scrub_stats": curation.term_scrub_stats,
        "filter_funnel": curation.filter_funnel,
        "shingle_repetition": curation.shingle_repetition,
        "stratified_sample_counts": curation.stratified_sample_counts,
        "contamination_overlap": curation.contamination_overlap,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": analytics.Q1_SQL,
        "q3_shipping_priority": analytics.Q3_SQL,
        "q5_regional_revenue": analytics.Q5_SQL,
        "q10_returned_items": analytics.Q10_SQL,
        "q4_priority_semijoin": analytics.Q4_SQL,
        "q6_forecast_revenue": analytics.Q6_SQL,
        "q7_volume_shipping": analytics.Q7_SQL,
        "q14_promo_revenue": analytics.Q14_SQL,
        "q18_large_volume": analytics.Q18_SQL,
        "q19_disjunctive_revenue": analytics.Q19_SQL,
        "q22_dormant_customers": analytics.Q22_SQL,
        "q2_min_cost_supplier": tpch_ext.Q2_SQL,
        "q8_market_share": tpch_ext.Q8_SQL,
        "q9_nation_profit": tpch_ext.Q9_SQL,
        "q11_important_stock": tpch_ext.Q11_SQL,
        "q12_priority_shipping": tpch_ext.Q12_SQL,
        "q13_order_distribution": tpch_ext.Q13_SQL,
        "q15_top_supplier": tpch_ext.Q15_SQL,
        "q16_supplier_part_count": tpch_ext.Q16_SQL,
        "q17_small_qty_revenue": tpch_ext.Q17_SQL,
        "q20_volume_suppliers": tpch_ext.Q20_SQL,
        "q21_waiting_suppliers": tpch_ext.Q21_SQL,
        "top_parts_per_brand": analytics.TOP_PARTS_SQL,
        "dedup_latest_events": analytics.DEDUP_LATEST_SQL,
        "purge_keep_latest": analytics.PURGE_KEEP_LATEST_SQL,
        "semi_anti_join_events": analytics.SEMI_ANTI_SQL,
        "batch_stats_events": analytics.BATCH_STATS_SQL,
        "hourly_rollup_events": analytics.HOURLY_ROLLUP_SQL,
        "surrogate_key_orders": analytics.SURROGATE_KEY_SQL,
        "merge_upsert_orders": analytics.MERGE_UPSERT_SQL,
        "grouping_sets_revenue": analytics.GROUPING_SETS_SQL,
        "sessionize_events": analytics.SESSIONIZE_SQL,
        "rolling_revenue_7d": analytics.ROLLING_REVENUE_SQL,
        "pivot_status_by_priority": analytics.PIVOT_STATUS_SQL,
        "asof_purchase_click": asof.ASOF_PURCHASE_CLICK_SQL,
        "errors_context_window": asof.ERRORS_CONTEXT_SQL,
        "value_percentiles": approx.VALUE_PERCENTILES_SQL,
        # self-checking sketches: output = exact value + within-tolerance
        # boolean computed in the same Spark job; the oracle asserts both
        "approx_distinct_users": approx.APPROX_DISTINCT_SQL,
        "approx_value_quantiles": approx.APPROX_QUANTILES_SQL,
        "props_json_stats": pipeline_ops.PROPS_JSON_SQL,
        "hash_split_stats": pipeline_ops.HASH_SPLIT_SQL,
        "bigram_counts": pipeline_ops.BIGRAM_SQL,
        "regex_term_scan": pipeline_ops.REGEX_SCAN_SQL,
        "tfidf_top_terms": pipeline_ops.TFIDF_SQL,
        "token_stats": textops.TOKEN_STATS_SQL,
        "quality_score": textops.QUALITY_SCORE_SQL,
        "lang_id": textops.LANG_ID_SQL,
        "doc_fingerprint": textops.FINGERPRINT_SQL,
        "incremental_dedup": dedup.INCREMENTAL_DEDUP_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "minhash_signatures": dedup.MINHASH_SIG_SQL,
        "minhash_lsh_pairs": dedup.MINHASH_LSH_SQL,
        "simhash": dedup.SIMHASH_SQL,
        "ngram_jaccard_pairs": dedup.NGRAM_JACCARD_SQL,
        "dup_clusters": dedup.DUP_CLUSTERS_SQL,
        "knn_bruteforce": similarity.KNN_BRUTEFORCE_SQL,
        "ann_lsh_buckets": similarity.ANN_LSH_SQL,
        "centroid_similarity": similarity.CENTROID_SIM_SQL,
        "embedding_neardup_pairs": similarity.EMBEDDING_NEARDUP_SQL,
        "ivf_ann_topk": similarity.IVF_ANN_SQL,
        "ivf_recall": similarity.IVF_RECALL_SQL,
        "kmeans_clusters": similarity.KMEANS_SQL,
        "semantic_dedup": similarity.SEMDEDUP_SQL,
        "ngram_lm_score": textops.NGRAM_LM_SQL,
        "chunk_documents": curation.CHUNK_DOCUMENTS_SQL,
        "weighted_sample": curation.WEIGHTED_SAMPLE_SQL,
        "ngram_contamination": curation.NGRAM_CONTAMINATION_SQL,
        "zipf_stats": textops.ZIPF_SQL,
        "funnel_conversion": analytics.FUNNEL_SQL,
        "retention_cohorts": analytics.RETENTION_SQL,
        "duplicate_span_fraction": dedup.DUPSPAN_SQL,
        "gopher_quality": curation.GOPHER_SQL,
        "event_spike_hours": pipeline_ops.EVENT_SPIKE_SQL,
        "pmi_collocations": textops.PMI_SQL,
        "vocab_growth": textops.VOCAB_GROWTH_SQL,
        "unigram_entropy": textops.UNIGRAM_ENTROPY_SQL,
        "decayed_engagement": pipeline_ops.DECAYED_ENGAGEMENT_SQL,
        "props_pii_scan": pipeline_ops.PROPS_PII_SQL,
        "salted_user_stats": pipeline_ops.SALTED_USER_STATS_SQL,
        "sq8_quant_error": similarity.SQ8_QUANT_SQL,
        "minhash_recall": dedup.MINHASH_RECALL_SQL,
        "unpivot_event_metrics": pipeline_ops.UNPIVOT_SQL,
        "cms_heavy_hitters": pipeline_ops.CMS_SQL,
        "stream_topk_trending": stream_queries.STREAM_TOPK_TRENDING_SQL,
        "pq_quant_error": similarity.PQ_QUANT_SQL,
        "pq_ann_topk": similarity.PQ_ANN_SQL,
        "mad_outlier_days": pipeline_ops.MAD_OUTLIER_SQL,
        "boilerplate_ngrams": curation.BOILERPLATE_SQL,
        "stream_click_attribution": stream_queries.STREAM_CLICK_ATTRIBUTION_SQL,
        "mm_asset_stats": multimodal.MM_ASSET_STATS_SQL,
        "mm_frame_sample": multimodal.MM_FRAME_SAMPLE_SQL,
        "dq_violations": dq.DQ_VIOLATIONS_SQL,
        "column_profile": dq.COLUMN_PROFILE_SQL,
        "stream_hourly_rollup": stream_queries.STREAM_HOURLY_ROLLUP_SQL,
        "stream_running_stats": stream_queries.STREAM_RUNNING_STATS_SQL,
        "stream_session_stats": stream_queries.STREAM_SESSION_STATS_SQL,
        "stream_dedup_count": stream_queries.STREAM_DEDUP_COUNT_SQL,
        # decode seam: the mapInPandas plan stays, but the fake codec is
        # md5-deterministic so the oracle reproduces it exactly
        "mm_decode_features": multimodal.MM_DECODE_SQL,
        "term_scrub_stats": curation.TERM_SCRUB_SQL,
        "filter_funnel": curation.FILTER_FUNNEL_SQL,
        "shingle_repetition": curation.SHINGLE_REPETITION_SQL,
        "stratified_sample_counts": curation.STRATIFIED_SAMPLE_SQL,
        "contamination_overlap": curation.CONTAMINATION_SQL,
        "winsorized_value_stats": curation.WINSORIZED_SQL,
        "token_len_histogram": curation.TOKEN_HISTOGRAM_SQL,
        "oov_rate": curation.OOV_RATE_SQL,
        "embedding_norm_stats": curation.EMBEDDING_NORM_SQL,
        "cube_revenue": curation.CUBE_REVENUE_SQL,
        "pack_sequences": curation.PACK_SEQUENCES_SQL,
        "mixture_weights": curation.MIXTURE_SQL,
        "quality_deciles": curation.QUALITY_DECILES_SQL,
        "ngram_novelty": corpus_audit.NGRAM_NOVELTY_SQL,
        "minhash_est_error": corpus_audit.MINHASH_EST_ERROR_SQL,
        "dup_graph_degree": corpus_audit.DUP_GRAPH_DEGREE_SQL,
        "token_gini": corpus_audit.TOKEN_GINI_SQL,
        "knn_label_purity": corpus_audit.KNN_LABEL_PURITY_SQL,
        "token_kl_shift": corpus_audit.TOKEN_KL_SHIFT_SQL,
        "embedding_split_drift": corpus_audit.EMBEDDING_SPLIT_DRIFT_SQL,
    }
