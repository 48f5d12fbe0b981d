"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from doc_quality_check_ray.pipelines import documents as D
from doc_quality_check_ray.pipelines import events as E
from doc_quality_check_ray.pipelines import oracle as O
from doc_quality_check_ray.pipelines import relational as R
from doc_quality_check_ray.pipelines import validate as V


def entry() -> Any:
    """Flagship pipeline: full validation sweep (row + key + conv checks)
    over transcripts derived from sf0.001 — returns the violation-row Dataset."""
    return V.q_all_violations("/root/testdata/sf0.001")


#: Every oracle-backed query the external driver has hash-verified (rows +
#: schema + value hash) across CORRECTNESS_r01–r04 — the cumulative record
#: ADVICE r4 asked for, so rotated-out regressions are tracked: the local
#: parity sweep (`tests/test_oracle_parity.py`, dtype-exact, same compare)
#: re-covers this whole set every round, and the meta-test below pins the
#: union of this set and the current window to the full oracle-backed
#: inventory once rotation completes.
_DRIVER_CHECKED_R1_R4 = [
    "d_bm25_topk", "d_chunk_documents", "d_cluster_balanced_sample",
    "d_cosine_near_dup", "d_curate_keep", "d_curriculum_order",
    "d_decontaminate", "d_dedup_keep", "d_dup_components",
    "d_dup_cluster_sizes", "d_edit_distance_pairs", "d_epoch_shuffle",
    "d_exact_dedup", "d_interleave_sources", "d_kmeans_assign",
    "d_kmeans_iter", "d_knn", "d_label_centroids", "d_label_text_stats",
    "d_line_dedup", "d_mix_manifest", "d_ngram_decontaminate",
    "d_ngram_jaccard", "d_pack_chunks", "d_quantize_embeddings",
    "d_sample_documents", "d_semantic_dedup", "d_snapshot_diff",
    "d_split_leakage_safe", "d_stratified_sample", "d_substring_dup_docs",
    "d_token_budget_sample", "d_weighted_sample", "e_asof_last_signup",
    "e_cohort_retention", "e_hourly_event_counts", "e_parse_props",
    "e_user_sessions", "mm_decode", "mm_frame_sample", "r_events_by_nation",
    "r_pricing_summary", "t_bigram_counts", "t_bigram_logprob",
    "t_c4_line_filter", "t_char_entropy", "t_distinct_terms",
    "t_doc_filter_verdicts", "t_domain_stats", "t_fingerprints",
    "t_keyword_in_context", "t_langid", "t_len_gini",
    "t_len_percentile_rank", "t_len_token_corr", "t_len_zscores",
    "t_ngram_novelty", "t_oov_rate", "t_pii_redact", "t_pmi_bigrams",
    "t_quality_gate", "t_repetition_scores", "t_source_js_divergence",
    "t_source_lang_rollup", "t_source_mix_weights", "t_subtoken_counts",
    "t_tfidf_top_terms", "t_token_entropy", "t_token_stats",
    "t_top_terms", "t_top_terms_by_source", "t_two_tier_scores",
    "t_type_token_ratio", "t_unicode_normalize", "t_unigram_logprob",
    "t_whitespace_anomalies", "t_inverted_index", "v_adjusted_scores",
    "v_all_violations", "v_artifact_rows", "v_column_stats",
    "v_conversation_verdicts", "v_drift_report", "v_duplicate_keys",
    "v_partition_verdicts", "v_role_distribution", "v_role_drift",
    "v_role_sequences", "v_row_violations", "v_text_len_quantiles",
    "v_threshold_sweep", "v_ts_quantiles", "v_ts_regressions",
    "v_turn_gaps", "v_verdicts", "v_worst_turns",
]

#: Round-5 rotation of the driver's first-50 correctness sample (VERDICT r4
#: #1): the 31 oracle-backed queries never driver-checked in r1–r4 — the
#: whole relational family, the remaining event queries, and the ``v_*``
#: transcript extras — which COMPLETES 128/128 cumulative driver
#: verification of the oracle-backed inventory, plus the new
#: ``d_interleave_starvation`` and 18 high-risk anchors (ADVICE r4: code
#: paths touched this round — the connected-components reducer/auto-cap,
#: the pruned+fingerprinted curation, the rb_bits-parameterized interleave,
#: multimodal — and the flagship validation family). Keys not listed keep
#: their original relative order after these.
_R5_FIRST_50 = [
    # -- never driver-checked: relational family (14)
    "r_pricing_summary", "r_events_by_nation", "r_priority_returns",
    "r_customer_order_counts", "r_shipping_priority", "r_top_suppliers",
    "r_promo_revenue", "r_local_supplier_volume", "r_nation_trade_volume",
    "r_shipmode_priority", "r_banded_revenue", "r_returned_item_customers",
    "r_min_price_supplier", "r_dormant_rich_customers",
    # -- never driver-checked: event family (4)
    "e_user_arrival_rate", "e_sliding_event_counts", "e_signup_attribution",
    "e_funnel_counts",
    # -- never driver-checked: transcript/document extras (15)
    "v_rolling_text_len", "v_len_outliers", "v_role_transitions",
    "v_response_latency", "v_repost_suppression", "v_dup_key_resolution",
    "v_missing_turn_ranges", "v_conversation_profile", "v_bucket_balance",
    "v_training_examples", "v_conversation_digest", "v_conversation_texts",
    "t_len_quantiles_by_source", "t_longest_docs_by_source",
    "d_dup_rate_by_source",
    # -- new this round (oracle-backed): interleave starvation counter and
    #    the per-source contribution cap (both enter the window so their
    #    first driver check happens the round they ship)
    "d_interleave_starvation", "d_source_cap", "v_tool_chain_stats",
    # -- anchors: code paths touched this round
    "d_dup_components", "d_dup_cluster_sizes", "d_dedup_keep",
    "d_substring_dup_docs", "d_mix_manifest", "d_curate_keep",
    "d_interleave_sources", "mm_decode", "mm_frame_sample",
    # -- anchors: flagship validation + dedup core
    "v_all_violations", "v_verdicts", "v_column_stats",
    "d_exact_dedup", "d_ngram_jaccard",
]

# v_text_len_quantiles and v_row_violations rotated out (driver-checked
# r3/r1, code paths untouched this round — the row-violation generation
# path stays window-covered via its superset v_all_violations) to make
# room for the late-round d_source_cap and v_tool_chain_stats, so new
# queries get their first driver check the round they ship.

# r_pricing_summary and r_events_by_nation were driver-checked in r1 before
# the relational family widened; they anchor the family here regardless.


def queries() -> dict[str, Callable[[str], Any]]:
    base = _query_registry()
    ordered = {k: base[k] for k in _R5_FIRST_50}
    ordered.update({k: v for k, v in base.items() if k not in ordered})
    return ordered


def _query_registry() -> dict[str, Callable[[str], Any]]:
    return {
        "v_row_violations": V.q_row_violations,
        "v_verdicts": V.q_verdicts,
        "v_duplicate_keys": V.q_duplicate_keys,
        "v_turn_gaps": V.q_turn_gaps,
        "v_column_stats": V.q_column_stats,
        "v_role_distribution": V.q_role_distribution,
        "v_all_violations": V.q_all_violations,
        "v_partition_verdicts": V.q_partition_verdicts,
        "v_role_drift": V.q_role_drift,
        "v_text_len_quantiles": V.q_text_len_quantiles,
        "v_ts_quantiles": V.q_ts_quantiles,
        "v_drift_report": V.q_drift_report,
        "v_artifact_rows": V.q_artifact_rows,
        # training-data operators over documents / embeddings
        "d_exact_dedup": D.q_exact_dedup,
        "d_minhash_pairs": D.q_minhash_pairs,
        "d_simhash_pairs": D.q_simhash_pairs,
        "d_ngram_jaccard": D.q_ngram_jaccard,
        "d_winnow_pairs": D.q_winnow_pairs,
        "d_knn": D.q_knn,
        "d_cosine_near_dup": D.q_cosine_near_dup,
        "d_lsh_near_dup": D.q_lsh_near_dup,
        "d_semantic_dedup": D.q_semantic_dedup,
        "d_ivf_knn": D.q_ivf_knn,
        "d_pq_knn": D.q_pq_knn,
        "d_kmeans_assign": D.q_kmeans_assign,
        "d_kmeans_iter": D.q_kmeans_iter,
        # driver-visible recall of every approximate operator vs its exact twin
        "d_minhash_recall": D.q_minhash_recall,
        "d_simhash_recall": D.q_simhash_recall,
        "d_lsh_recall": D.q_lsh_recall,
        "d_ivf_recall": D.q_ivf_recall,
        "d_pq_recall": D.q_pq_recall,
        "d_ivf_probe_sweep": D.q_ivf_probe_sweep,
        "d_winnow_recall": D.q_winnow_recall,
        "t_token_stats": D.q_token_stats,
        "t_langid": D.q_langid,
        "t_fingerprints": D.q_fingerprints,
        "t_top_terms": D.q_top_terms,
        "t_bigram_counts": D.q_bigram_counts,
        "t_pmi_bigrams": D.q_pmi_bigrams,
        "t_two_tier_scores": D.q_two_tier_scores,
        "t_subtoken_counts": D.q_subtoken_counts,
        "t_top_terms_by_source": D.q_top_terms_by_source,
        "d_sample_documents": D.q_sample_documents,
        "d_weighted_sample": D.q_weighted_sample,
        "d_source_cap": D.q_source_cap,
        "v_tdigest_quantile_error": V.q_tdigest_quantile_error,
        "d_decontaminate": D.q_decontaminate,
        "d_ngram_decontaminate": D.q_ngram_decontaminate,
        "d_dup_components": D.q_dup_components,
        "d_dup_cluster_sizes": D.q_dup_cluster_sizes,
        "d_dup_rate_by_source": D.q_dup_rate_by_source,
        "d_dedup_keep": D.q_dedup_keep,
        "d_pack_chunks": D.q_pack_chunks,
        "d_stratified_sample": D.q_stratified_sample,
        "d_cluster_balanced_sample": D.q_cluster_balanced_sample,
        "d_quantize_embeddings": D.q_quantize_embeddings,
        "t_token_entropy": D.q_token_entropy,
        "t_tfidf_top_terms": D.q_tfidf_top_terms,
        "d_epoch_shuffle": D.q_epoch_shuffle,
        "d_curriculum_order": D.q_curriculum_order,
        "d_interleave_sources": D.q_interleave_sources,
        "d_interleave_starvation": D.q_interleave_starvation,
        "d_token_budget_sample": D.q_token_budget_sample,
        "d_split_leakage_safe": D.q_split_leakage_safe,
        "d_label_centroids": D.q_label_centroids,
        "t_quality_gate": D.q_quality_gate,
        "d_mix_manifest": D.q_mix_manifest,
        "d_substring_dup_docs": D.q_substring_dup_docs,
        "t_domain_stats": D.q_domain_stats,
        "t_source_lang_rollup": D.q_source_lang_rollup,
        "t_len_zscores": D.q_len_zscores,
        "t_len_percentile_rank": D.q_len_percentile_rank,
        "d_label_text_stats": D.q_label_text_stats,
        "e_cohort_retention": E.q_cohort_retention,
        "t_distinct_terms": D.q_distinct_terms,
        "t_hll_distinct": D.q_hll_distinct,
        "d_bloom_decontaminate": D.q_bloom_decontaminate,
        "t_heavy_hitters": D.q_heavy_hitters,
        "t_heavy_hitters_recall": D.q_heavy_hitters_recall,
        "t_pii_redact": D.q_pii_redact,
        "t_c4_line_filter": D.q_c4_line_filter,
        "d_line_dedup": D.q_line_dedup,
        "d_snapshot_diff": D.q_snapshot_diff,
        "t_keyword_in_context": D.q_keyword_in_context,
        "t_unicode_normalize": D.q_unicode_normalize,
        "t_len_token_corr": D.q_len_token_corr,
        "d_edit_distance_pairs": D.q_edit_distance_pairs,
        "d_edit_distance_recall": D.q_edit_distance_recall,
        "d_bm25_topk": D.q_bm25_topk,
        "t_repetition_scores": D.q_repetition_scores,
        "t_doc_filter_verdicts": D.q_doc_filter_verdicts,
        "d_curate_keep": D.q_curate_keep,
        "t_unigram_logprob": D.q_unigram_logprob,
        "t_bigram_logprob": D.q_bigram_logprob,
        "t_oov_rate": D.q_oov_rate,
        "t_ngram_novelty": D.q_ngram_novelty,
        "t_source_js_divergence": D.q_source_js_divergence,
        "t_char_entropy": D.q_char_entropy,
        "t_type_token_ratio": D.q_type_token_ratio,
        "t_compression_ratio": D.q_compression_ratio,
        "t_len_gini": D.q_len_gini,
        "t_source_mix_weights": D.q_source_mix_weights,
        "t_whitespace_anomalies": D.q_whitespace_anomalies,
        "t_inverted_index": D.q_inverted_index,
        "mm_decode": D.q_mm_decode,
        "mm_frame_sample": D.q_mm_frame_sample,
        "d_chunk_documents": D.q_chunk_documents,
        # transcript-table extras
        "v_ts_regressions": V.q_ts_regressions,
        "v_role_sequences": V.q_role_sequences,
        "v_adjusted_scores": V.q_adjusted_scores,
        "v_conversation_verdicts": V.q_conversation_verdicts,
        "v_worst_turns": V.q_worst_turns,
        "v_threshold_sweep": V.q_threshold_sweep,
        "v_rolling_text_len": V.q_rolling_text_len,
        "v_len_outliers": V.q_len_outliers,
        "v_role_transitions": V.q_role_transitions,
        "v_tool_chain_stats": V.q_tool_chain_stats,
        "v_response_latency": V.q_response_latency,
        "v_repost_suppression": V.q_repost_suppression,
        "v_dup_key_resolution": V.q_dup_key_resolution,
        "v_missing_turn_ranges": V.q_missing_turn_ranges,
        "v_conversation_profile": V.q_conversation_profile,
        "v_bucket_balance": V.q_bucket_balance,
        "v_training_examples": V.q_training_examples,
        "v_conversation_digest": V.q_conversation_digest,
        "v_conversation_texts": V.q_conversation_texts,
        "t_len_quantiles_by_source": V.q_len_quantiles_by_source,
        "t_longest_docs_by_source": D.q_longest_docs_by_source,
        # event-stream operators
        "e_parse_props": E.q_parse_props,
        "e_user_sessions": E.q_user_sessions,
        "e_user_arrival_rate": E.q_user_arrival_rate,
        "e_asof_last_signup": E.q_asof_last_signup,
        "e_hourly_event_counts": E.q_hourly_event_counts,
        "e_sliding_event_counts": E.q_sliding_event_counts,
        "e_signup_attribution": E.q_signup_attribution,
        "e_funnel_counts": E.q_funnel_counts,
        # relational operators over the TPC-H-ish tables
        "r_pricing_summary": R.q_pricing_summary,
        "r_events_by_nation": R.q_events_by_nation,
        "r_priority_returns": R.q_priority_returns,
        "r_customer_order_counts": R.q_customer_order_counts,
        "r_shipping_priority": R.q_shipping_priority,
        "r_top_suppliers": R.q_top_suppliers,
        "r_promo_revenue": R.q_promo_revenue,
        "r_local_supplier_volume": R.q_local_supplier_volume,
        "r_nation_trade_volume": R.q_nation_trade_volume,
        "r_shipmode_priority": R.q_shipmode_priority,
        "r_banded_revenue": R.q_banded_revenue,
        "r_returned_item_customers": R.q_returned_item_customers,
        "r_min_price_supplier": R.q_min_price_supplier,
        "r_dormant_rich_customers": R.q_dormant_rich_customers,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "v_row_violations": O.sql_row_violations(),
        "v_verdicts": O.sql_verdicts(),
        "v_duplicate_keys": O.sql_duplicate_keys(),
        "v_turn_gaps": O.sql_turn_gaps(),
        "v_column_stats": O.sql_column_stats(),
        "v_role_distribution": O.sql_role_distribution(),
        "v_partition_verdicts": O.sql_partition_verdicts(),
        "v_all_violations": O.sql_all_violations(),
        "v_role_drift": O.sql_role_drift(),
        "v_drift_report": O.sql_drift_report(),
        "v_artifact_rows": O.sql_artifact_rows(),
        "d_exact_dedup": O.SQL_EXACT_DEDUP,
        "d_knn": O.sql_knn(D.KNN_QUERY_IDS, D.KNN_K),
        "d_cosine_near_dup": O.sql_cosine_near_dup(D.COSINE_THRESHOLD),
        "d_semantic_dedup": O.sql_semantic_dedup(D.COSINE_THRESHOLD),
        "d_ngram_jaccard": O.sql_ngram_jaccard(),
        "v_text_len_quantiles": O.sql_text_len_quantiles(),
        "v_ts_quantiles": O.sql_ts_quantiles(),
        "t_token_stats": O.sql_token_stats(),
        "t_langid": O.sql_langid(),
        "t_fingerprints": O.sql_fingerprints(),
        "t_top_terms": O.sql_top_terms(),
        "t_bigram_counts": O.sql_bigram_counts(D.BIGRAM_TOP_K),
        "t_pmi_bigrams": O.sql_pmi_bigrams(D.PMI_TOP_K, D.PMI_MIN_N),
        "d_kmeans_assign": O.sql_kmeans_assign(D.KMEANS_CENTROID_IDS),
        "d_kmeans_iter": O.sql_kmeans_iter(D.KMEANS_CENTROID_IDS),
        "t_two_tier_scores": O.sql_two_tier_scores(D.TWO_TIER_CUTOFF),
        "t_subtoken_counts": O.sql_subtoken_counts(D.SUBTOKEN_RE2),
        "t_top_terms_by_source": O.sql_top_terms_by_source(),
        "d_sample_documents": O.sql_sample_documents(D.SAMPLE_HEX_LT),
        "d_weighted_sample": O.sql_weighted_sample(D.WSAMPLE_SEED, D.WSAMPLE_K),
        "d_source_cap": O.sql_source_cap(D.SOURCE_CAP_SEED, D.SOURCE_CAP_K),
        "d_decontaminate": O.sql_decontaminate(D.SAMPLE_HEX_LT),
        "d_ngram_decontaminate": O.sql_ngram_decontaminate(
            D.SAMPLE_HEX_LT, D.NGRAM_DECON_K
        ),
        "d_dup_components": O.sql_dup_components(),
        "d_dup_cluster_sizes": O.sql_dup_cluster_sizes(),
        "d_dup_rate_by_source": O.sql_dup_rate_by_source(),
        "d_dedup_keep": O.sql_dedup_keep(),
        "d_pack_chunks": O.sql_pack_chunks(D.PACK_CHUNK, D.PACK_CAPACITY),
        "d_stratified_sample": O.sql_stratified_sample(D.STRATIFIED_K),
        "d_cluster_balanced_sample": O.sql_cluster_balanced_sample(
            D.KMEANS_CENTROID_IDS, D.CLUSTER_SAMPLE_K
        ),
        "d_quantize_embeddings": O.sql_quantize_embeddings(),
        "t_token_entropy": O.sql_token_entropy(),
        "t_tfidf_top_terms": O.sql_tfidf_top_terms(D.TFIDF_K),
        "d_epoch_shuffle": O.sql_epoch_shuffle(D.EPOCH_SHUFFLE_SEED),
        "d_curriculum_order": O.sql_curriculum_order(D.CURRICULUM_SEED),
        "d_interleave_sources": O.sql_interleave_sources(D.INTERLEAVE_SEED),
        "d_interleave_starvation": O.SQL_INTERLEAVE_STARVATION,
        "d_token_budget_sample": O.sql_token_budget_sample(
            D.BUDGET_SEED, D.TOKEN_BUDGET
        ),
        "d_split_leakage_safe": O.sql_split_leakage_safe(seed=D.SPLIT_SEED),
        "d_label_centroids": O.SQL_LABEL_CENTROIDS,
        "t_quality_gate": O.sql_quality_gate(D.QUALITY_GATE_Q),
        "d_mix_manifest": O.sql_mix_manifest(
            D.QUALITY_GATE_Q, seed=D.SPLIT_SEED
        ),
        "t_pii_redact": O.sql_pii_redact(),
        "t_c4_line_filter": O.sql_c4_line_filter(),
        "d_line_dedup": O.sql_line_dedup(),
        "d_snapshot_diff": O.SQL_SNAPSHOT_DIFF,
        "t_keyword_in_context": O.sql_keyword_in_context(
            D.KWIC_TERM, D.KWIC_WINDOW
        ),
        "t_unicode_normalize": O.sql_unicode_normalize(),
        "t_len_token_corr": O.sql_len_token_corr(),
        "d_edit_distance_pairs": O.sql_edit_distance_pairs(),
        "d_bm25_topk": O.sql_bm25_topk(D.BM25_QUERY_TERMS, D.BM25_TOPK),
        "t_domain_stats": O.sql_domain_stats(),
        "t_source_lang_rollup": O.sql_source_lang_rollup(),
        "t_len_zscores": O.sql_len_zscores(),
        "t_len_percentile_rank": O.sql_len_percentile_rank(),
        "d_label_text_stats": O.sql_label_text_stats(),
        "e_cohort_retention": E.SQL_COHORT_RETENTION,
        "d_substring_dup_docs": O.sql_substring_dup_docs(
            D.SUBSTR_K, D.SUBSTR_MIN_SHARED
        ),
        "t_distinct_terms": O.SQL_DISTINCT_TERMS,
        "t_repetition_scores": O.SQL_REPETITION_SCORES,
        "t_doc_filter_verdicts": O.sql_doc_filter_verdicts(
            D.FILTER_MIN_TOKENS, D.FILTER_TOP_FRAC
        ),
        "d_curate_keep": O.sql_curate_keep(
            D.FILTER_MIN_TOKENS, D.FILTER_TOP_FRAC, D.SAMPLE_HEX_LT
        ),
        "t_unigram_logprob": O.SQL_UNIGRAM_LOGPROB,
        "t_bigram_logprob": O.SQL_BIGRAM_LOGPROB,
        "t_oov_rate": O.sql_oov_rate(D.OOV_VOCAB_V),
        "t_ngram_novelty": O.SQL_NGRAM_NOVELTY,
        "t_source_js_divergence": O.sql_source_js_divergence(D.JS_VOCAB_V),
        "t_char_entropy": O.SQL_CHAR_ENTROPY,
        "t_type_token_ratio": O.SQL_TYPE_TOKEN_RATIO,
        "t_len_gini": O.SQL_LEN_GINI,
        "t_source_mix_weights": O.SQL_SOURCE_MIX_WEIGHTS,
        "t_whitespace_anomalies": O.sql_whitespace_anomalies(),
        "t_inverted_index": O.sql_inverted_index(D.POSTINGS_K),
        "e_hourly_event_counts": E.SQL_HOURLY_EVENT_COUNTS,
        "e_sliding_event_counts": E.SQL_SLIDING_EVENT_COUNTS,
        "r_pricing_summary": R.SQL_PRICING_SUMMARY,
        "r_events_by_nation": R.SQL_EVENTS_BY_NATION,
        "r_priority_returns": R.SQL_PRIORITY_RETURNS,
        "r_customer_order_counts": R.SQL_CUSTOMER_ORDER_COUNTS,
        "r_shipping_priority": R.SQL_SHIPPING_PRIORITY,
        "r_top_suppliers": R.SQL_TOP_SUPPLIERS,
        "r_promo_revenue": R.SQL_PROMO_REVENUE,
        "r_local_supplier_volume": R.SQL_LOCAL_SUPPLIER_VOLUME,
        "r_nation_trade_volume": R.SQL_NATION_TRADE_VOLUME,
        "r_shipmode_priority": R.SQL_SHIPMODE_PRIORITY,
        "r_banded_revenue": R.SQL_BANDED_REVENUE,
        "r_returned_item_customers": R.SQL_RETURNED_ITEM_CUSTOMERS,
        "r_min_price_supplier": R.SQL_MIN_PRICE_SUPPLIER,
        "r_dormant_rich_customers": R.SQL_DORMANT_RICH_CUSTOMERS,
        "mm_decode": O.sql_mm_decode(),
        "mm_frame_sample": O.sql_mm_frame_sample(),
        "d_chunk_documents": O.sql_chunk_documents(),
        "v_ts_regressions": O.sql_ts_regressions(),
        "v_role_sequences": O.sql_role_sequences(),
        "v_adjusted_scores": O.sql_adjusted_scores(),
        "v_conversation_verdicts": O.sql_conversation_verdicts(),
        "v_worst_turns": O.sql_worst_turns(),
        "v_threshold_sweep": O.sql_threshold_sweep(),
        "v_rolling_text_len": O.sql_rolling_text_len(),
        "v_len_outliers": O.sql_len_outliers(),
        "v_role_transitions": O.sql_role_transitions(),
        "v_tool_chain_stats": O.sql_tool_chain_stats(),
        "v_response_latency": O.sql_response_latency(),
        "v_repost_suppression": O.sql_repost_suppression(),
        "v_dup_key_resolution": O.sql_dup_key_resolution(),
        "v_missing_turn_ranges": O.sql_missing_turn_ranges(),
        "v_conversation_profile": O.sql_conversation_profile(),
        "v_bucket_balance": O.sql_bucket_balance(),
        "v_training_examples": O.sql_training_examples(
            V.TRAIN_EXAMPLE_MAX_TOKENS
        ),
        "v_conversation_digest": O.sql_conversation_digest(),
        "v_conversation_texts": O.sql_conversation_texts(),
        "t_len_quantiles_by_source": O.sql_len_quantiles_by_source(),
        "t_longest_docs_by_source": O.sql_longest_docs_by_source(D.TOPDOCS_K),
        "e_parse_props": E.SQL_PARSE_PROPS,
        "e_user_sessions": E.SQL_USER_SESSIONS,
        "e_user_arrival_rate": O.SQL_USER_ARRIVAL_RATE,
        "e_asof_last_signup": E.SQL_ASOF_LAST_SIGNUP,
        "e_signup_attribution": E.SQL_SIGNUP_ATTRIBUTION,
        "e_funnel_counts": E.SQL_FUNNEL_COUNTS,
    }
