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

# Query names with a green driver CORRECTNESS row from rounds 1-2
# (CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json). The driver verifies only the
# first 50 entries of ``queries()`` per round, so ``all_queries()`` enumerates
# not-yet-verified queries FIRST to close the evidence gap (VERDICT r2 item 1).
# ``dedup_simhash`` is deliberately omitted: its r2 row was rows-only
# (no_oracle) and round 3 gives it a DuckDB twin, so it must re-enumerate early
# for a fresh hash-match row.
_DRIVER_VERIFIED: frozenset[str] = frozenset({
    "anti_join_customers_without_orders",
    "approx_distinct_users",
    "approx_percentile_prices",
    "array_collapse_returnflags",
    "asof_join_purchase_last_view",
    "broadcast_join_part_agg",
    "cube_orders_status_priority",
    "dedup_connected_components",
    "dedup_containment_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_bucketed",
    "dedup_exact_documents",
    "dedup_latest_order_per_customer",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dict_encode_segments",
    "distinct_customers_per_status",
    "from_json_events",
    "full_outer_join_customer_activity",
    "json_extract_events",
    "map_functions_events",
    "market_share_by_year",
    "median_price_by_status",
    "multimodal_metadata",
    "null_safe_join_suppliers",
    "posexplode_order_lines",
    "pricing_summary",
    "prune_empty_columns",
    "revenue_by_nation",
    "rollup_lineitem_status",
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
    "text_bpe_token_count",
    "text_fingerprint",
    "text_language_id",
    "text_quality_score",
    "text_token_stats",
    "theta_join_nation_pairs",
    "top_orders_by_revenue",
    "tumbling_window_events",
    "type_detect_ladder",
    "type_unification_lattice",
    "union_by_name_schema_evolution",
    "window_lag_event_delta",
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
