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

# Query names with a green driver CORRECTNESS row (hash-match, or rows-only
# for the declared no-oracle queries) from rounds 1-2-4-5 — the union of
# CORRECTNESS_r{01,02,04,05}.json. The driver verifies only the first 50
# entries of ``queries()`` per round, so ``all_queries()`` enumerates
# not-yet-verified queries FIRST to close the evidence gap (VERDICT r2
# item 1); queries added after round 5 stay out of this set until they earn
# a green row.
_DRIVER_VERIFIED: frozenset[str] = frozenset({
    "advanced_agg_gallery",
    "anti_join_customers_without_orders",
    "apply_in_pandas_label_stats",
    "approx_distinct_users",
    "approx_percentile_prices",
    "argmax_order_per_customer",
    "array_collapse_returnflags",
    "array_functions_gallery",
    "asof_join_purchase_last_view",
    "broadcast_join_part_agg",
    "conditional_agg_orders",
    "cube_orders_status_priority",
    "date_functions_gallery",
    "decontaminate_against_eval",
    "dedup_connected_components",
    "dedup_connected_components_star",
    "dedup_containment_capped",
    "dedup_containment_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_bucketed",
    "dedup_exact_documents",
    "dedup_latest_order_per_customer",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_minhash_lsh_df_capped",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "dict_encode_segments",
    "distinct_customers_per_status",
    "event_validity_intervals",
    "from_json_events",
    "full_outer_join_customer_activity",
    "gapfill_hourly_events",
    "json_extract_events",
    "map_functions_events",
    "market_share_by_year",
    "median_price_by_status",
    "multimodal_decode_stub",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_metadata",
    "ntile_order_quartiles",
    "null_safe_join_suppliers",
    "outliers_by_mad",
    "pack_concat_chunks",
    "pack_sequences_greedy",
    "pandas_udf_vector_norm",
    "pipeline_c4_keep",
    "pivot_status_by_priority",
    "posexplode_order_lines",
    "pricing_summary",
    "prune_empty_columns",
    "quartile_labels_by_cutpoint",
    "range_join_events_binned",
    "rank_functions_suppliers",
    "regexp_functions_gallery",
    "revenue_by_nation",
    "rollup_lineitem_status",
    "salted_agg_event_types",
    "sample_documents_hash",
    "sample_stratified_by_lang",
    "scalar_functions_gallery",
    "segment_edges",
    "semi_join_discounted_orders",
    "sessionize_events",
    "setop_except_nations",
    "setop_intersect_nations",
    "setop_union_nations",
    "similarity_topk_blas",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_lsh_bucketed",
    "sliding_window_events",
    "sorted_page_orders",
    "split_train_val_test",
    "sql_exists_subquery",
    "sql_grouping_sets",
    "sql_scalar_subquery",
    "stats_agg_lineitem",
    "string_functions_gallery",
    "text_bpe_token_count",
    "text_fingerprint",
    "text_language_id",
    "text_quality_score",
    "text_redact_pii",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_unigram_logprob",
    "theta_join_nation_pairs",
    "top_orders_by_revenue",
    "tumbling_window_events",
    "type_detect_ladder",
    "type_unification_lattice",
    "udtf_tokenize_documents",
    "union_by_name_schema_evolution",
    "unpivot_order_status_counts",
    "window_lag_event_delta",
    "window_range_frame",
    "window_running_revenue",
    "window_top_orders_per_customer",
})


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
    """All registered queries, never-driver-verified first.

    Enumeration order matters: the driver's correctness harness checks a
    window of 50 queries per round in ``queries()`` order. Putting queries
    without a green CORRECTNESS row first guarantees every query accumulates
    driver evidence across rounds. Within each group, registration
    (insertion) order is preserved.
    """
    _ensure_loaded()
    pending = {n: e for n, e in _REGISTRY.items() if n not in _DRIVER_VERIFIED}
    verified = {n: e for n, e in _REGISTRY.items() if n in _DRIVER_VERIFIED}
    return {**pending, **verified}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in all_queries().items() if e.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items() if e.bench}
