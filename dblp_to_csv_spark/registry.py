"""Query registry: the single source of truth wiring operator implementations
to the driver harness (__spark_entry__.py) and to bench.py.

Every implemented operator from SURVEY.md §2 registers a named query here,
usually with a DuckDB-oracle ANSI SQL twin. Registration happens at import
time of the ``dblp_to_csv_spark.operators`` modules.

Hash-match contract (from the driver): the oracle comparison sorts columns by
name and hashes values order-insensitively, so

* every computed/aggregate column is aliased to the SAME name on both sides;
* float aggregates are rounded identically on both sides (sums of ~1e5 doubles
  agree to ~1e-9 relative between engines; rounding makes the hash stable);
* DuckDB integer sums are cast to BIGINT to match Spark's LongType.

Known theoretical edge (hypothesis-surfaced r9, RETIRED r10): at an EXACT
half boundary of the display rounding (e.g. a dyadic value like 0.0703125
rounded to 6 dp) Spark's round (BigDecimal of the shortest decimal repr)
and DuckDB's ROUND (scaled-double) can land one step apart. Transcendental
scores and 2-dp money sums cannot produce such values; where a computation
CAN (cents arithmetic; ratios of small integers — Jaccard/containment/
clustering coefficients/token ratios), the operator either converts to
integers BEFORE rounding (parts_abc_pareto) or uses tie-down rounding
(functions/rounding.py: round(x - 5e-13, d) + 0.0 on BOTH engines, pinned
on constructed boundary corpora in tests/test_rounding_ties.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryEntry] = {}

# Last round in which each query earned a green driver CORRECTNESS row
# (hash-match, or rows-only for the declared no-oracle queries) — computed
# from the union of CORRECTNESS_r*.json by scripts/refresh_driver_verified.py.
# The driver verifies only the first 50 entries of ``queries()`` per round
# and the testdata is regenerated between rounds, so ``all_queries()``
# enumerates the STALEST evidence first: never-verified queries, then by
# ascending last-green round. Queries with no DuckDB oracle sort last so
# the driver window never burns slots on rows-only ``err: no_oracle`` rows
# (VERDICT r6 items 1 and 5).
# Queries whose implementation changed AFTER their last green driver row,
# mapped to the round in whose session the reset was declared. The driver
# runs AFTER the session closes, so a green row in CORRECTNESS_r{declared}
# (or later) is evidence on the NEW implementation and clears the reset;
# greens from earlier rounds are evidence on the old code and are dropped
# by scripts/refresh_driver_verified.py so the name sorts as never-verified
# (first in the driver window). The script clears re-greened names
# automatically; tests/test_registry_evidence.py fails if a name outlives
# its declared round without re-greening (VERDICT r10 item 8).
# Entry format: one line per name — `"query_name": <declared round>,  # why`.
_EVIDENCE_RESET: dict[str, int] = {
    # r14 OPTIMIZATION round: plan-shape changes proven result-identical by
    # local oracle parity; declared so the driver window re-greens each on
    # the new plan (VERDICT r13 item 2's "resets for ANY touched query").
    # r14 session 6 (optimization continued)
}
# (r11: the entire 42-name r10 cohort — rounding conversions, zero-vector
# cosine guards, einsum UDF rewrite, NULL-hardened batch paths — re-greened
# in CORRECTNESS_r10 and was cleared by refresh_driver_verified.py.)
# (r10: scd2_user_state removed — the r9 driver window re-greened the
# current tiebreak implementation, VERDICT r9 "What's wrong" #1.)
# (round-9 vacuity audit: anti_join_customers_no_urgent and
# setop_except_urgent_unfinished are renames — never-verified by name —
# and outliers_by_mad was dropped from _LAST_GREEN_ROUND outright, so all
# three sort to the window head for re-verification.)

_LAST_GREEN_ROUND: dict[str, int] = {
    "ab_test_mann_whitney": 9,
    "ab_test_welch": 10,
    "acf_event_values": 14,
    "advanced_agg_gallery": 9,
    "anti_join_customers_no_urgent": 14,
    "apply_in_pandas_label_stats": 10,
    "approx_distinct_users": 6,
    "approx_percentile_prices": 6,
    "aqp_sample_estimates": 9,
    "argmax_order_per_customer": 10,
    "array_collapse_returnflags": 12,
    "array_functions_gallery": 9,
    "arrow_quantize_embeddings": 10,
    "asof_join_purchase_last_view": 13,
    "augment_span_corrupt": 14,
    "benford_digit_audit": 9,
    "bitwise_functions_gallery": 13,
    "bootstrap_mean_ci": 10,
    "bpe_apply_encode": 14,
    "bpe_merge_candidates": 13,
    "bpe_train_merges": 14,
    "broadcast_join_part_agg": 11,
    "changepoint_cusum_events": 9,
    "chunk_documents_overlapping": 14,
    "conditional_agg_orders": 9,
    "constraint_audit_orders": 13,
    "contrastive_pairs_dataset": 14,
    "cooccurrence_parts_pmi": 14,
    "cube_orders_status_priority": 11,
    "curate_source_cap": 14,
    "dataset_version_diff": 12,
    "date_functions_gallery": 9,
    "decontaminate_against_eval": 13,
    "decontaminate_bloom": 14,
    "decontaminate_semantic": 14,
    "dedup_audio_fingerprint": 13,
    "dedup_chunk_exact": 12,
    "dedup_chunk_rewrite": 13,
    "dedup_cluster_stats": 14,
    "dedup_connected_components": 14,
    "dedup_connected_components_star": 14,
    "dedup_containment_capped": 10,
    "dedup_containment_pairs": 10,
    "dedup_edit_distance_banded": 13,
    "dedup_embedding_cosine": 10,
    "dedup_embedding_cosine_bucketed": 10,
    "dedup_exact_documents": 12,
    "dedup_graph_pagerank": 14,
    "dedup_image_phash": 13,
    "dedup_intradoc_rewrite": 13,
    "dedup_jaccard_prefix_filter": 10,
    "dedup_keep_canonical": 14,
    "dedup_latest_order_per_customer": 12,
    "dedup_minhash_lsh": 14,
    "dedup_minhash_lsh_capped": 14,
    "dedup_minhash_lsh_df_capped": 14,
    "dedup_ngram_jaccard": 10,
    "dedup_ngram_jaccard_capped": 10,
    "dedup_semantic_semdedup": 14,
    "dedup_simhash": 12,
    "dedup_substring_rewrite": 14,
    "dedup_substring_spans": 14,
    "dict_encode_segments": 12,
    "distinct_customers_per_status": 11,
    "drift_chi2_by_window": 11,
    "drift_chi2_source_lang": 11,
    "drift_kl_unigram_langs": 11,
    "drift_ks_events_value": 11,
    "drift_mutual_information": 11,
    "drift_psi_events_value": 11,
    "dsir_importance_weights": 14,
    "embedding_label_centroids": 12,
    "embedding_norm_isotropy": 11,
    "embedding_random_projection": 13,
    "er_golden_record": 14,
    "er_match_pairs": 14,
    "eval_contamination_report": 12,
    "event_transition_matrix": 14,
    "event_validity_intervals": 13,
    "ewma_event_values": 13,
    "forward_fill_event_metric": 13,
    "from_json_events": 12,
    "full_outer_join_customer_activity": 12,
    "funnel_time_to_convert": 9,
    "funnel_view_cart_purchase": 12,
    "gapfill_hourly_events": 13,
    "graph_adamic_adar": 14,
    "graph_adamic_adar_capped": 9,
    "graph_bfs_deep": 14,
    "graph_bfs_distances": 14,
    "graph_clustering_coefficient": 14,
    "graph_coreness": 14,
    "graph_kcore": 14,
    "graph_label_propagation": 14,
    "graph_report": 14,
    "graph_triangle_count": 14,
    "graph_triangle_powerlaw": 14,
    "heavy_hitters_words": 10,
    "higher_order_functions_gallery": 13,
    "histogram_equiwidth_prices": 12,
    "incremental_agg_merge": 13,
    "integrity_audit": 13,
    "interval_overlap_join_bucketed": 13,
    "json_extract_events": 12,
    "lang_temperature_resample": 12,
    "lm_bigram_cross_entropy": 11,
    "map_functions_events": 10,
    "market_share_by_year": 11,
    "median_price_by_status": 11,
    "merge_upsert_orders": 13,
    "mix_upsample_langs": 13,
    "multimodal_decode_bmp": 11,
    "multimodal_decode_png": 12,
    "multimodal_decode_wav": 11,
    "multimodal_feature_extract": 10,
    "multimodal_frame_sample": 10,
    "multimodal_metadata": 13,
    "ngram_novelty_vs_reference": 12,
    "ntile_order_quartiles": 10,
    "null_safe_join_suppliers": 12,
    "orders_rfm_segments": 9,
    "outliers_by_mad": 9,
    "pack_concat_chunks": 11,
    "pack_length_buckets": 11,
    "pack_sequences_greedy": 5,
    "pandas_udf_vector_norm": 10,
    "parts_abc_pareto": 9,
    "pipeline_c4_keep": 11,
    "pivot_status_by_priority": 9,
    "posexplode_order_lines": 12,
    "pretrain_corpus_report": 14,
    "pricing_summary": 11,
    "privacy_k_anonymity_audit": 11,
    "privacy_k_anonymous_release": 11,
    "profile_documents": 13,
    "prune_empty_columns": 12,
    "quality_gopher_rules": 14,
    "quality_linear_score": 13,
    "quality_repetition_rules": 14,
    "quality_score_pr_curve": 14,
    "quartile_labels_by_cutpoint": 11,
    "rag_retrieve_chunks": 14,
    "range_join_events_binned": 9,
    "rank_functions_suppliers": 10,
    "regexp_functions_gallery": 9,
    "regression_moments_lineitem": 13,
    "retention_cohorts_weekly": 12,
    "retrieval_eval_bm25": 14,
    "revenue_by_nation": 11,
    "rolling_median_hourly": 9,
    "rollup_lineitem_status": 11,
    "salted_agg_event_types": 10,
    "sample_documents_hash": 11,
    "sample_stratified_by_lang": 11,
    "sample_weighted_priority": 14,
    "scalar_functions_gallery": 11,
    "scd2_point_in_time_join": 13,
    "scd2_user_state": 13,
    "search_bm25": 13,
    "search_hybrid_rrf": 10,
    "seasonal_decompose_events": 13,
    "segment_edges": 12,
    "semi_join_discounted_orders": 11,
    "session_window_events": 13,
    "sessionize_events": 13,
    "setop_except_urgent_unfinished": 14,
    "setop_intersect_nations": 11,
    "setop_multiset_all_nations": 13,
    "setop_union_nations": 11,
    "shard_rendezvous_assign": 10,
    "similarity_eval_recall": 10,
    "similarity_knn_graph_bucketed": 10,
    "similarity_topk_blas": 2,
    "similarity_topk_bruteforce": 10,
    "similarity_topk_ivf": 14,
    "similarity_topk_ivf_nprobe": 12,
    "similarity_topk_lsh_bucketed": 10,
    "similarity_topk_lsh_multiprobe": 10,
    "similarity_topk_pq": 14,
    "sketch_bottomk_quantiles": 11,
    "sketch_bottomk_quantiles_by_group": 11,
    "sketch_countmin_words": 9,
    "sketch_kmv_distinct": 10,
    "sketch_kmv_set_ops": 10,
    "skew_join_salted_events": 14,
    "skipgram_pairs_subsampled": 9,
    "skyline_documents": 14,
    "sliding_window_events": 13,
    "sorted_page_orders": 10,
    "split_leakage_free": 14,
    "split_train_val_test": 11,
    "sql_exists_subquery": 9,
    "sql_group_by_all_shorthand": 13,
    "sql_grouping_sets": 9,
    "sql_lateral_topk_nations": 12,
    "sql_parameterized_query": 13,
    "sql_pipe_syntax_pricing": 13,
    "sql_recursive_cte_months": 12,
    "sql_scalar_subquery": 9,
    "sql_udf_scalar_nested": 13,
    "sql_udf_table_valued": 13,
    "sql_variant_events": 12,
    "stats_agg_lineitem": 10,
    "string_functions_gallery": 9,
    "text_bpe_token_count": 12,
    "text_char_entropy": 13,
    "text_feature_hash_embedding": 13,
    "text_fingerprint": 12,
    "text_language_id": 12,
    "text_logprob_buckets": 11,
    "text_quality_score": 10,
    "text_redact_pii": 13,
    "text_repetition_score": 10,
    "text_tfidf_top_terms": 12,
    "text_token_stats": 10,
    "text_unigram_logprob": 12,
    "text_zipf_slope": 13,
    "theta_join_nation_pairs": 11,
    "token_budget_per_lang": 12,
    "top_orders_by_revenue": 11,
    "training_epoch_order": 14,
    "try_functions_gallery": 13,
    "tumbling_window_events": 13,
    "type_detect_ladder": 12,
    "type_unification_lattice": 12,
    "udaf_geomean_order_price": 12,
    "udtf_ngrams_polymorphic": 13,
    "udtf_tokenize_documents": 10,
    "union_by_name_schema_evolution": 11,
    "unpivot_order_status_counts": 9,
    "weighted_percentiles_price": 9,
    "window_lag_event_delta": 11,
    "window_range_frame": 9,
    "window_running_revenue": 11,
    "window_top_orders_per_customer": 11,
    "winsorize_event_values": 12,
    "xml_functions_gallery": 13,
}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryEntry(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", bench=bench, tags=tags
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effects: operator modules register their queries.
    import dblp_to_csv_spark.operators  # noqa: F401


def all_queries() -> dict[str, QueryEntry]:
    """All registered queries, stalest driver evidence first.

    Enumeration order matters: the driver's correctness harness checks a
    window of 50 queries per round in ``queries()`` order, and the testdata
    is regenerated between rounds. Ordering by ascending last-green round
    (never-verified first) rotates the window onto the queries whose
    evidence is oldest; oracle-less (rows-only) queries sort last so the
    window contains only hash-checkable rows. Ties preserve registration
    order.
    """
    _ensure_loaded()
    order = list(_REGISTRY)
    def sort_key(name: str) -> tuple[int, int, int]:
        e = _REGISTRY[name]
        no_oracle = 1 if e.oracle is None else 0
        # never verified OR reset this session → window head: a reset name
        # must re-green in its declared round's driver pass even when the
        # refresh script ran before the reset was declared.
        last_green = (
            -1 if name in _EVIDENCE_RESET else _LAST_GREEN_ROUND.get(name, -1)
        )
        return (no_oracle, last_green, order.index(name))
    return {n: _REGISTRY[n] for n in sorted(order, key=sort_key)}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in all_queries().items() if e.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items() if e.bench}
