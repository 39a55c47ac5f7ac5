"""Physical-plan quality gates for the headline queries: the properties that
make these plans scale (filter pushdown, column pruning, broadcast joins,
partial top-k, no cartesian products) are asserted here so a future refactor
that silently degrades a plan fails CI, not the bench.
"""

from __future__ import annotations

import re

import pytest

from dblp_to_csv_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read join-only columns like l_orderkey
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_orderkey" not in m.group(1)


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_window_topk_partial_limit(spark):
    plan = _plan(spark, "window_top_orders_per_customer")
    assert "WindowGroupLimit" in plan  # per-partition partial top-k


def test_no_cartesian_or_nested_loop_in_scale_paths(spark):
    """The designated scale paths must never degrade to all-pairs plans.
    (quartile_labels_by_cutpoint's 1-row broadcast NLJ is intentional and
    excluded.)"""
    for name in [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine_bucketed",
        "dedup_ngram_jaccard_capped",
        "dedup_containment_capped",
        "dedup_edit_distance_banded",
        "similarity_topk_lsh_bucketed",
        "range_join_events_binned",
        "asof_join_purchase_last_view",
    ]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_aggregates_are_partial_final(spark):
    """Hash aggregates must show the partial/final split (map-side combine),
    not a single-pass global aggregate."""
    for name in ["pricing_summary", "advanced_agg_gallery", "tumbling_window_events"]:
        plan = _plan(spark, name)
        assert plan.count("HashAggregate") >= 2, name


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "text_token_stats"])
def test_no_python_row_udfs_in_hot_paths(spark, name):
    """The dedup/text hot paths are pure Column expressions — no
    BatchEvalPython (row-at-a-time Python UDF) may appear."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval-shingle set must be the broadcast build side and the plan
    must push the eval/train doc_id split to the scans; no plain shuffle
    join of the corpus against the eval set."""
    plan = _plan(spark, "decontaminate_against_eval")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters" in plan


def test_pack_chunks_single_bucket_exchange(spark):
    """Concat-then-chunk packing must be one hashpartitioning exchange on the
    bucket key feeding one Window — no global (single-partition) sort."""
    plan = _plan(spark, "pack_concat_chunks")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_capped_minhash_variants_stay_equijoin(spark):
    for name in ["dedup_minhash_lsh_capped", "dedup_minhash_lsh_df_capped"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_repetition_and_stratified_are_scan_projections(spark):
    """No shuffle at all: these fuse into the document scan."""
    for name in ["text_repetition_score", "sample_stratified_by_lang"]:
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name


def test_gopher_rules_is_scan_projection(spark):
    """All four Gopher metrics are array expressions over one tokenization —
    the whole operator must fuse into the scan: no Python, and the ONLY
    exchange is the r15 size-gated scan fan-out (REPARTITION_BY_NUM on
    doc_id — guide §2.5; at scale the gate never fires and the plan is
    exchange-free again)."""
    plan = _plan(spark, "quality_gopher_rules")
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "REPARTITION_BY_NUM" in plan
    assert "BatchEvalPython" not in plan


def test_token_budget_single_lang_exchange(spark):
    """One hashpartitioning exchange on lang feeding one Window — no global
    sort, no second shuffle."""
    plan = _plan(spark, "token_budget_per_lang")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_temperature_resample_broadcasts_rates(spark):
    """The 5-row rate table must come back as a broadcast join — the corpus
    scan is never shuffled."""
    plan = _plan(spark, "lang_temperature_resample")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only hashpartitioning exchanges belong to the tiny per-lang rate
    # aggregate (partial/final pair), never a corpus re-shuffle
    assert plan.count("Exchange hashpartitioning") <= 2


def test_chunk_dedup_single_hash_shuffle(spark):
    """Chunk hashes are built inside the row (no token explode through a
    shuffle); the only exchange is the aggregate on chunk_hash."""
    plan = _plan(spark, "dedup_chunk_exact")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial/final agg pair


def test_logprob_buckets_windowless(spark):
    """Tertile labeling must use the broadcast-cutpoint idiom — no Window
    operator, no single-partition sort of the corpus."""
    plan = _plan(spark, "text_logprob_buckets")
    assert "Window" not in plan  # the cutpoints come from an aggregate, not ntile


def test_drift_stats_aggregate_before_ordering(spark):
    """Drift statistics must reduce the corpus to a tiny aggregated frame
    BEFORE any global ordering/all-pairs step: no cartesian products, no
    Python, and the corpus side only ever feeds hash aggregates."""
    for name in ["drift_ks_events_value", "drift_chi2_source_lang",
                 "embedding_label_centroids"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert plan.count("HashAggregate") >= 2, name  # partial/final split


def test_pipe_syntax_desugars_to_clause_plan(spark):
    """Pipe-syntax SQL must produce the same plan SHAPE as the clause form:
    pushdown reaches the scan and the aggregate splits partial/final — pipe
    stages desugar before Catalyst, so nothing may degrade."""
    plan = _plan(spark, "sql_pipe_syntax_pricing")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "CartesianProduct" not in plan


def test_novelty_broadcasts_reference_side(spark):
    """The reference shingle set must be the broadcast build side; the
    corpus's exploded shingles stream map-side (never shuffled wholesale)."""
    plan = _plan(spark, "ngram_novelty_vs_reference")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_upsample_corpus_never_shuffles(spark):
    """mix_upsample_langs: the rate table broadcasts onto the corpus scan
    and repetition is an in-row explode — the only exchanges belong to the
    tiny per-lang aggregate, never the corpus side (no SMJ)."""
    plan = _plan(spark, "mix_upsample_langs")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_chunk_rewrite_shuffles_hashes_only(spark):
    """dedup_chunk_rewrite: the ranking window partitions by chunk hash (no
    global/empty-frame window), chunk text never enters the shuffle (the
    exploded frame carries only doc_id/idx/hash), and no Python UDFs."""
    plan = _plan(spark, "dedup_chunk_rewrite")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # every Window operator is hash-partitioned (none global)
    for m in re.finditer(r"Window \[", plan):
        tail = plan[m.start() : m.start() + 400]
        assert "windowspecdefinition" in tail


def test_bloom_decontaminate_prefilter_shape(spark):
    """decontaminate_bloom: the Bloom probe is pure codegen bit arithmetic
    (xxhash64 inside a Filter, no Python anywhere), the exact verification
    join broadcasts the eval shingles, and the corpus side is never
    sort-merge-joined. The one BroadcastNestedLoopJoin is the 1-row bloom
    frame (intentional, same as quartile_labels_by_cutpoint)."""
    plan = _plan(spark, "decontaminate_bloom")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_pair_join_is_cell_equijoin(spark):
    """dedup_semantic_semdedup: the quadratic pair search must stay confined
    to the k-means cell — an equi-join on cell, never a CartesianProduct.
    (The centroid-assignment BroadcastNestedLoopJoins are k-row broadcasts
    by design.) The drop-set verdict applies via broadcast, not a corpus
    reshuffle."""
    plan = _plan(spark, "dedup_semantic_semdedup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_sql_udfs_inline_into_codegen(spark):
    """SQL UDFs are analysis-time macros: the plan must show the plain
    partial/final aggregate over inlined expressions — no Python evaluation
    node, no serialization boundary."""
    plan = _plan(spark, "sql_udf_scalar_nested")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_observed_keep_gate_metrics_ride_the_job(spark):
    """df.observe: the curation funnel's metrics (rows seen/kept, token
    yield) must come back from the SAME single pass that produced the kept
    rows — no second scan, no count job."""
    from dblp_to_csv_spark.operators.pipeline import observed_keep_gate

    df, obs = observed_keep_gate(spark, SF_SMOKE)
    kept_rows = df.count()
    m = obs.get
    assert m["rows_kept"] == kept_rows
    assert m["rows_seen"] >= m["rows_kept"] > 0
    assert m["tokens_kept"] >= 20 * m["rows_kept"]  # gate floor


def test_intradoc_rewrite_is_scan_fused(spark):
    """dedup_intradoc_rewrite: everything is in-row array arithmetic — the
    plan must contain NO Exchange and no Python."""
    plan = _plan(spark, "dedup_intradoc_rewrite")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_linear_score_is_scan_projection(spark):
    """The learned-quality scorer is weights-in-projection: no shuffle, no
    Python — the model runs inside the scan pass."""
    plan = _plan(spark, "quality_linear_score")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_profile_documents_is_one_aggregate_pass(spark):
    """The profiler computes every column's metrics in ONE aggregate over
    ONE scan — never a scan per column (the oracle's UNION ALL spelling is
    the semantic reference, not the plan)."""
    plan = _plan(spark, "profile_documents")
    assert plan.count("FileScan") == 1
    assert "BatchEvalPython" not in plan


def test_substring_dedup_shuffles_hashes_only(spark):
    """dedup_substring_spans / dedup_substring_rewrite: the canonical pick
    is a partial/final min-struct AGGREGATE (map-side combinable) — not a
    corpus-wide row_number window; the checkpointed duplicated-hash table
    attaches back via broadcast; the islands window in the spans report
    partitions by doc_id (no global window); document text never enters a
    shuffle (the exploded frame carries doc_id/pos/hash only); and no
    Python anywhere."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.functions.text import words
    from dblp_to_csv_spark.operators.curation import _span_window_base
    from dblp_to_csv_spark.sources.tables import load_table

    # The dup chain runs as a checkpointed pre-job, so assert its shape on
    # the chain itself: canonical-occurrence selection must be an aggregate
    # (partial_min over the (doc_id, pos) struct before the hash exchange),
    # never a corpus-wide window.
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", words("text").alias("w")
    )
    occ = _span_window_base(docs).select(
        "doc_id", F.posexplode("hashes").alias("pos", "h")
    )
    dup = (
        occ.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min(F.struct("doc_id", "pos")).alias("first"))
        .filter(F.col("cnt") > 1)
    )
    dup_plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in dup_plan
    assert "Window" not in dup_plan
    for name in ["dedup_substring_spans", "dedup_substring_rewrite"]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name
    # the rewrite path needs no window operator at all
    rewrite_plan = _plan(spark, "dedup_substring_rewrite")
    assert "Window" not in rewrite_plan


def test_triangle_count_equijoins_only(spark):
    """Triangle counting: wedge formation and closure are equi-joins on
    node keys — degree orientation must never degrade the plan to an
    all-pairs strategy, and the per-node count is partial/final. Since the
    r12 triangle_table artifact, the REGISTERED query's plan is just a
    scan of the materialized table — the gate inspects the compute frame
    (triangle_counts) that writes the artifact."""
    from dblp_to_csv_spark.operators.graph import triangle_counts

    df = triangle_counts(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_eval_contamination_broadcasts_eval_side(spark):
    """eval_contamination_report: both the corpus semi-join probe and the
    per-item coverage join must broadcast the (eval-sized) small side —
    the corpus shingle stream is never sort-merge-joined or reshuffled."""
    plan = _plan(spark, "eval_contamination_report")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_overlapping_chunker_is_scan_fused(spark):
    """chunk_documents_overlapping: pure in-row fan-out — no exchange, no
    Python; the explode and the chunk slices fuse into the document scan."""
    plan = _plan(spark, "chunk_documents_overlapping")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """Runtime Bloom-filter injection (InjectRuntimeFilter) — the
    100 TB semi-join-reduction move for the case broadcast can't cover:
    when a filtered dimension is too big to broadcast, Spark builds a
    Bloom filter from the creation side and injects a codegen
    might_contain(xxhash64(key)) predicate into the FACT SCAN stage, so
    most fact rows die before the shuffle. Off by default; pinned here so
    the engine's cluster conf recipe (SCALE.md §7) stays honest."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table, temp_conf

    with temp_conf(spark, "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"), \
         temp_conf(spark, "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"), \
         temp_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), \
         temp_conf(spark, "spark.sql.adaptive.enabled", "false"):
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(sel, li["l_orderkey"] == sel["o_orderkey"]).select(
            "l_orderkey", "l_quantity"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan
    assert "xxhash64" in plan


def test_bm25_no_explode_single_stats_broadcast(spark):
    """search_bm25's tf columns are in-row array filters — no posting-list
    Generate/explode, the corpus stats attach as ONE broadcast (the 1-row
    crossJoin pattern), and top-k is a partial TakeOrderedAndProject, not a
    global sort."""
    plan = _plan(spark, "search_bm25")
    assert "Generate" not in plan  # no posting-list explode
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row stats row
    assert "CartesianProduct" not in plan


def test_zipf_fit_aggregates_before_ordering(spark):
    """text_zipf_slope's only corpus-sized shuffle is the token count; the
    top-k cut is a partial TakeOrderedAndProject and the regression runs on
    the bounded frame."""
    plan = _plan(spark, "text_zipf_slope")
    assert "TakeOrderedAndProject" in plan
    # partial+final token count (map-side combine before the exchange)
    assert "partial_count" in plan


def test_source_cap_single_exchange(spark):
    """curate_source_cap is one hash exchange on source + one window —
    no joins, no global sort."""
    plan = _plan(spark, "curate_source_cap")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_ewma_single_window_exchange(spark):
    """ewma_event_values: K lag columns share ONE window spec — one hash
    exchange on user_id, one Window node, no self-joins."""
    plan = _plan(spark, "ewma_event_values")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_regression_moments_partial_final(spark):
    """regression_moments_lineitem reduces in one partial+final aggregate
    pass over a pruned 3-column scan."""
    plan = _plan(spark, "regression_moments_lineitem")
    assert "partial_regr_slope" in plan and "partial_regr_r2" in plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_orderkey" not in m.group(1)


def test_interval_overlap_is_bucket_equijoin(spark):
    """The interval predicate must ride a bucket EQUI-join (hash/SMJ with
    the overlap as residual condition), never degrade to the
    nested-loop/cartesian plan a bare inequality join produces."""
    plan = _plan(spark, "interval_overlap_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_prefix_filter_is_equijoin(spark):
    """The AllPairs prefix+positional candidate stage and the verify join
    must stay equi-joins — the whole point of the construction is never
    degrading to the all-pairs nested-loop plan."""
    plan = _plan(spark, "dedup_jaccard_prefix_filter")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_random_projection_is_scan_fused(spark):
    """embedding_random_projection is a pure in-row projection: the sign
    matrix constant-folds into the expression — no Exchange, no Join, no
    Generate, one FileScan."""
    plan = _plan(spark, "embedding_random_projection")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_epoch_order_single_window_exchange(spark):
    """training_epoch_order's only exchange is the per-(epoch, shard)
    window partitioning; shard assignment is an in-row hash, never a join;
    only doc_id is read from the corpus (payloads never move)."""
    plan = _plan(spark, "training_epoch_order")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1)


def test_merge_upsert_single_key_join(spark):
    """merge_upsert_orders applies the whole MERGE in ONE full-outer
    equi-join on the key; latest-wins dedup runs on the (delta-sized)
    change feed only. No nested-loop fallback anywhere."""
    plan = _plan(spark, "merge_upsert_orders")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FullOuter") == 1


def test_hybrid_rrf_arms_partial_topk(spark):
    """search_hybrid_rrf: both arm cuts are partial TakeOrderedAndProject
    (the row_number windows run on ≤ ARM_DEPTH rows after the cut, so the
    single-partition WindowExec is bounded, not corpus-sized); the only
    nested-loop joins are the two 1-row broadcasts (BM25 stats + query
    vector)."""
    plan = _plan(spark, "search_hybrid_rrf")
    assert plan.count("TakeOrderedAndProject") >= 2
    # Upper bound, not an exact count: an AQE/broadcast-threshold change may
    # legally convert a 1-row attach to a BroadcastHashJoin (ADVICE r8) —
    # the regression being guarded is a corpus-sized nested loop, which the
    # CartesianProduct assertion plus the bound still catch.
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in plan


def test_pq_trains_all_subspaces_in_one_chain(spark):
    """similarity_topk_pq trains the M codebooks in ONE frame partitioned
    by subspace id: no per-subspace serial jobs, the only nested-loop join
    is the broadcast of the per-query LUT maps, and nothing degrades to a
    cartesian product."""
    plan = _plan(spark, "similarity_topk_pq")
    assert "CartesianProduct" not in plan
    # <= 1 (the 8-row LUT attach): exact counts are brittle across AQE /
    # broadcast-threshold changes that convert the attach to a BHJ.
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_retrieval_eval_broadcast_postings(spark):
    """retrieval_eval_bm25 (r14 s6 shape): the corpus explode runs once,
    in the pruned-postings checkpoint build — the RETURNED plan reads that
    checkpoint, so its only Generate is the query-term explode; query
    terms / df / corpus stats attach by broadcast (query-count-sized), the
    gold score rides a window over query_id (candidate-set-sized, never a
    corpus sort), and the gold rank is a count — no nested-loop fallback
    beyond the 1-row stats attaches."""
    plan = _plan(spark, "retrieval_eval_bm25")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # 1-row stats attaches
    assert plan.count("Generate") <= 2  # query-term explode (+headroom)
    assert "SortMergeJoin" not in plan  # everything attaches by broadcast


def test_skyline_two_windows_no_join(spark):
    """skyline_documents: one narrow projection + the bucketed local sweep
    + the survivor-only global sweep — window exchanges only, no join, no
    quadratic dominance anywhere in the plan (that lives in the oracle)."""
    plan = _plan(spark, "skyline_documents")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan") == 1


def test_span_corrupt_is_scan_fused(spark):
    """augment_span_corrupt builds (input, target) pairs with in-row array
    expressions only — no Exchange, no Generate, one FileScan."""
    plan = _plan(spark, "augment_span_corrupt")
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert plan.count("FileScan") == 1


def test_contrastive_pairs_anchor_broadcast(spark):
    """contrastive_pairs_dataset: the anchors×pool fan-out rides a
    broadcast of the (duplicate-bounded) anchor set; the partner exclusion
    is an anti-join; the per-anchor cut is a WindowGroupLimit."""
    plan = _plan(spark, "contrastive_pairs_dataset")
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_seasonal_decompose_reduces_before_joining(spark):
    """seasonal_decompose_events: ONE corpus-sized (day) aggregate; the
    level/effect attach-backs are broadcasts over the days-sized frame —
    no sort-merge join, no corpus re-scan beyond the partial aggregate."""
    plan = _plan(spark, "seasonal_decompose_events")
    assert "SortMergeJoin" not in plan
    assert "partial_avg" in plan


def test_scd2_single_exchange_for_window_chain(spark):
    """The SCD2 build stacks two windows + an aggregate, all keyed on
    user_id: Catalyst must plan ONE shuffle for the whole chain."""
    plan = _plan(spark, "scd2_user_state")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1
    assert "CartesianProduct" not in plan


def test_ab_test_welch_pushes_arm_filter(spark):
    plan = _plan(spark, "ab_test_welch")
    assert "PushedFilters: [In(event_type" in plan


def test_countmin_sketch_broadcast_query_side(spark):
    """The CM query side (probes x cells) must broadcast — the corpus is
    touched only by the build and true-count aggregates."""
    plan = _plan(spark, "sketch_countmin_words")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_lm_bigram_no_allpairs_and_pruned_scan(spark):
    plan = _plan(spark, "lm_bigram_cross_entropy")
    assert "CartesianProduct" not in plan
    m = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert m and all("source" not in g and "lang" not in g for g in m)


def test_dsir_model_broadcast_onto_feature_stream(spark):
    """The 64-row bucket model joins back by broadcast; the only exchanges
    are the bucket-count and per-doc aggregates."""
    plan = _plan(spark, "dsir_importance_weights")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_kmv_sketch_partial_topk_shapes(spark):
    """KMV sketches must realize the bottom-k as partial per-partition
    work: WindowGroupLimit for the per-group sketch, TakeOrderedAndProject
    for the global one — never a single-partition global window."""
    plan = _plan(spark, "sketch_kmv_distinct")
    assert "WindowGroupLimit" in plan
    plan2 = _plan(spark, "sketch_kmv_set_ops")
    assert "TakeOrderedAndProject" in plan2
    assert "Window" not in plan2  # no global-window fallback


def test_aqp_single_scan_conditional_agg(spark):
    """Sample and exact aggregates must come from ONE scan (the sample is
    a conditional-aggregation flag, not a second read or a self-join)."""
    plan = _plan(spark, "aqp_sample_estimates")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan


def test_cooccurrence_prunes_before_pair_join(spark):
    """Market-basket PMI: the item-frequency table and quantile cutoff
    attach by broadcast, and the per-basket pair expansion is an EQUI-join
    on the basket key — never a cartesian."""
    plan = _plan(spark, "cooccurrence_parts_pmi")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_histogram_single_column_scans(spark):
    """Equi-width histogram: both passes (bounds, binning) read ONLY the
    measured column, and the bounds attach by broadcast (no sort-merge)."""
    plan = _plan(spark, "histogram_equiwidth_prices")
    assert "SortMergeJoin" not in plan
    for g in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "l_extendedprice" in g and "l_orderkey" not in g


def test_benford_pushes_filter_and_prunes(spark):
    plan = _plan(spark, "benford_digit_audit")
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    assert "SortMergeJoin" not in plan
    for g in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert g.count("o_") == 1  # only the measured column


def test_mann_whitney_single_scan_grouped_domain(spark):
    """Rank-sum via the grouped value histogram: one corpus scan with the
    arm filter pushed down; the only window runs over the distinct-value
    domain (post-aggregate), not the row stream."""
    plan = _plan(spark, "ab_test_mann_whitney")
    assert plan.count("Scan parquet") == 1
    assert "PushedFilters: [In(event_type" in plan


def test_scd2_pit_join_is_residual_equijoin(spark):
    """The PIT lookup must plan as an equi-join on user_id with the
    validity interval as a residual predicate — a BroadcastNestedLoopJoin
    here would mean the non-equi conjuncts swallowed the equi key."""
    plan = _plan(spark, "scd2_point_in_time_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[user_id.*LeftOuter",
        plan,
    ), plan


def test_changepoint_and_rolling_median_reduce_first(spark):
    """Both hourly-series diagnostics: ONE corpus scan, no joins — every
    window (centering, cumsum, argmax, percentile frame) runs on the
    reduced |types|x|hours| frame, partitioned by event_type."""
    for name in ["changepoint_cusum_events", "rolling_median_hourly"]:
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == 1, name
        assert "Join" not in plan, name


def test_rfm_scores_from_checkpointed_base(spark):
    """RFM: the per-customer base is parquet-checkpointed, so the returned
    plan must NOT rescan raw orders (o_totalprice never appears — the
    checkpoint carries the rounded `monetary`); cutpoints and the reference
    date attach as 1-row broadcasts, never a sort-merge join."""
    plan = _plan(spark, "orders_rfm_segments")
    assert "o_totalprice" not in plan
    assert "_rfm_base_" in plan
    assert "SortMergeJoin" not in plan


def test_skipgram_pairs_from_checkpointed_survivors(spark):
    """Skip-gram: the returned pair-build plan reads ONLY the checkpointed
    survivor stream (no `text` tokenize rescan) and the neighbor join is an
    equi-join on (doc_id, idx) — never a cartesian."""
    plan = _plan(spark, "skipgram_pairs_subsampled")
    assert "_sg_kept_" in plan
    for g in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "text" not in g
    assert "CartesianProduct" not in plan


def test_abc_pareto_reduces_to_parts_domain(spark):
    """ABC: one pruned fact scan into the partkey aggregate; the cumulative
    windows run on the parts DIMENSION domain after reduction."""
    plan = _plan(spark, "parts_abc_pareto")
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2  # partial/final split
    for g in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "l_orderkey" not in g and "l_quantity" not in g


def test_semantic_decon_scores_once_from_checkpoint(spark):
    """The broadcast-eval scoring pass over the training corpus runs ONCE
    (eagerly, into the checkpoint); the returned plan must read only the
    checkpointed per-vector argmax — no embeddings rescan, no cartesian."""
    plan = _plan(spark, "decontaminate_semantic")
    assert "CartesianProduct" not in plan
    assert "_semdecon_best_" in plan
    assert "embeddings" not in plan  # corpus scored during the checkpoint


def test_funnel_timing_single_scan_no_selfjoin(spark):
    """Funnel lag: one corpus scan into the user-keyed conditional-MIN
    aggregate; percentiles run on the reduced lag column — no self-joins,
    no window over the event stream."""
    plan = _plan(spark, "funnel_time_to_convert")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_weighted_percentiles_no_multiset_expansion(spark):
    """Weighted percentiles: ONE partial/final aggregate over the scan —
    the weighted multiset is never expanded (no explode of the corpus)."""
    plan = _plan(spark, "weighted_percentiles_price")
    assert plan.count("Scan parquet") == 1
    assert "partial_percentile" in plan  # map-side combine of the buffers
    # the only Generate is the 3-row unpack of the 1-row result — the
    # CORPUS is never exploded (no Generate below the partial aggregate)
    below_agg = plan.split("partial_percentile", 1)[1]
    assert "Generate" not in below_agg


def test_rendezvous_assign_single_exchange(spark):
    """Rendezvous shard assignment is an in-row argmax over the node list:
    exactly one hashpartitioning exchange (the final 8-row aggregate), no
    join operator, no Python anywhere."""
    plan = _plan(spark, "shard_rendezvous_assign")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_bmp_decode_is_shuffle_free_arrow_pipeline(spark):
    """Both multimodal BMP stages are narrow mapInPandas over input splits:
    no Exchange of any kind, no row-at-a-time Python — the Arrow batch
    operators are the only Python in the plan."""
    plan = _plan(spark, "multimodal_decode_bmp")
    # the only exchange allowed is the r15 size-gated scan fan-out (guide
    # §2.5) that spreads the single-row-group scan before the encode stage
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "REPARTITION_BY_NUM" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 2  # encode stage + decode stage


def test_jaccard_tie_nudge_stays_in_codegen(spark):
    """The r10 tie-down rounding is a scalar subtract inside the projection
    — it must not introduce Python or change the join structure of the
    exact-Jaccard plan (shuffle joins on shingle/doc keys only)."""
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wav_decode_is_shuffle_free_arrow_pipeline(spark):
    """The WAV twin holds the same contract as the BMP gate: two narrow
    mapInPandas stages, no Exchange, no row-at-a-time Python."""
    plan = _plan(spark, "multimodal_decode_wav")
    assert plan.count("Exchange") <= 1  # fan-out only; see the BMP gate
    if "Exchange" in plan:
        assert "REPARTITION_BY_NUM" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 2  # encode stage + decode stage


def test_length_buckets_window_runs_on_distinct_lengths(spark):
    """pack_length_buckets' cumulative window must consume the per-length
    AGGREGATE (distinct-length-sized), never corpus rows: the plan's window
    sits above a HashAggregate, and the corpus itself is never globally
    sorted (the only Sort feeds the metadata-sized window)."""
    plan = _plan(spark, "pack_length_buckets")
    assert "BatchEvalPython" not in plan
    assert "Window" in plan
    # the window's sort is on the aggregated (n_chars) frame: exactly one
    # single-partition exchange (the distinct-length frame), and it must
    # appear after aggregation in the tree, not over the scan
    win_pos = plan.index("Window")
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("HashAggregate", i)
    ]
    assert any(p > win_pos for p in agg_positions), (
        "no aggregate below the window — it would sort corpus rows"
    )


def test_pr_curve_single_pass_no_row_multiplication(spark):
    """quality_score_pr_curve computes all 27 threshold counters in ONE
    conditional aggregate: no Generate (explode) anywhere — score and label
    are in-row expressions — and no Python."""
    plan = _plan(spark, "quality_score_pr_curve")
    assert "BatchEvalPython" not in plan
    # the only Generate is stack() over the 1-row aggregate — NO explode
    # anywhere (score and label are in-row expressions)
    assert plan.count("Generate") == 1 and "Generate stack" in plan
    assert "Generate explode" not in plan
    assert "CartesianProduct" not in plan


def test_bottomk_sketch_partial_topk(spark):
    """sketch_bottomk_quantiles: the bottom-k draw must plan as
    TakeOrderedAndProject (per-partition local bottom-k, ≤k·partitions rows
    through the exchange) — never a global sort or single-partition window.
    The exact side is one ordinary aggregate; nothing Python."""
    plan = _plan(spark, "sketch_bottomk_quantiles")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_bottomk_group_sketch_windowgrouplimit(spark):
    """sketch_bottomk_quantiles_by_group: the per-group cut must execute as
    WindowGroupLimit (each partition forwards ≤k rows per group BEFORE the
    exchange — a 10^9-row hot group still ships ≤k·partitions rows), the
    same physical contract as the KMV sketch."""
    plan = _plan(spark, "sketch_bottomk_quantiles_by_group")
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


def test_version_diff_joins_fingerprints_only(spark):
    """dataset_version_diff: one full-outer EQUI-join of two (key, md5)
    projections — no nested-loop/cartesian degradation, document text
    never read into the join (column pruning drops everything but doc_id
    and text-for-md5 at the scans), no Python."""
    plan = _plan(spark, "dataset_version_diff")
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the join's shuffle carries fingerprints, not text: no scan reads
    # more than (doc_id, text) and text is consumed by md5 below the join
    for m in re.finditer(r"ReadSchema: ([^\n]*)", plan):
        assert "lang" not in m.group(1) and "source" not in m.group(1)


def test_psi_broadcasts_cutpoints_no_range_join(spark):
    """drift_psi_events_value: the 9 reference-decile cutpoints attach as a
    1-row broadcast and binning is an in-row fold — no range join, no
    Python; per-bin counts reduce before the statistic (drift contract)."""
    plan = _plan(spark, "drift_psi_events_value")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_mutual_information_single_corpus_scan(spark):
    """drift_mutual_information: the contingency cells materialize once
    (eager localCheckpoint) and all four consumers read the checkpoint —
    no corpus FileScan in the final plan (drift-family contract)."""
    plan = _plan(spark, "drift_mutual_information")
    assert "FileScan" not in plan
    assert "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


def test_k_anonymous_release_broadcasts_groups(spark):
    """privacy_k_anonymous_release: the passing-group table broadcasts back
    onto the corpus scan — the corpus never shuffles (no SortMergeJoin, no
    corpus-sized exchange on the probe side)."""
    plan = _plan(spark, "privacy_k_anonymous_release")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chi2_by_window_single_corpus_scan(spark):
    """drift_chi2_by_window: the (window, type) aggregate materializes once
    (eager localCheckpoint) and all three consumers — global mix, window
    totals, the left join back — read the checkpointed frame, so the final
    plan contains NO corpus FileScan at all (the one events scan ran inside
    the checkpoint job). A lazy obs referenced three times re-scanned events
    three times (r11 double-eval audit, ROADMAP 30)."""
    plan = _plan(spark, "drift_chi2_by_window")
    assert "FileScan" not in plan  # corpus scanned only in the checkpoint job
    assert "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


def test_lm_bigram_explodes_once_in_final_plan(spark):
    """lm_bigram_cross_entropy: the bigram count table PARQUET-checkpoints
    once (session_checkpoint_dir — not localCheckpoint, whose storage
    blocks would leak per invocation in a shared session) and the
    prev-context table is DERIVED from it (exact integer sums), so the
    final plan re-explodes the corpus only for the per-occurrence scoring
    stream plus the vocab count — two Generates, with both count tables
    reading the checkpoint files (was four corpus explodes before the r11
    double-eval audit)."""
    plan = _plan(spark, "lm_bigram_cross_entropy")
    assert plan.count("Generate explode") == 2  # scoring stream + vocab
    assert "_lm_bgc_" in plan  # count tables read the parquet checkpoint
    assert "BatchEvalPython" not in plan


def test_isotropy_single_scan(spark):
    """embedding_norm_isotropy: n_vectors rides the per-dim aggregate —
    exactly ONE scan of the embeddings table in the whole report."""
    plan = _plan(spark, "embedding_norm_isotropy")
    assert plan.count("FileScan") == 1
    assert "BatchEvalPython" not in plan


def test_kl_drift_aggregates_before_statistics(spark):
    """drift_kl_unigram_langs: one token explode feeds a term-keyed
    aggregate; everything after runs on the vocab-sized frame (broadcast
    totals, final 1-row aggregate) — no second corpus-sized shuffle, no
    Python."""
    plan = _plan(spark, "drift_kl_unigram_langs")
    assert "BatchEvalPython" not in plan
    assert plan.count("Generate explode") == 1  # the single token explode
    # totals come from a window over the vocab frame, never a second
    # corpus-sized pass (a lazy double-reference would re-explode)


def test_minhash_verification_broadcast_reuse(spark):
    """Below the verification byte gate (every test SF) both sides of the
    exact-Jaccard join broadcast the SAME docs_sh aggregate; the two build
    plans are canonically identical, so AQE stage reuse must compute the
    candidate-docs shingle-set aggregate ONCE (r14 s6: the final adaptive
    plan carries a ReusedExchange, and the cand probe side carries no
    Exchange at all — the old sort-merge tail shuffled cand twice)."""
    df = all_queries()["dedup_minhash_lsh"].fn(spark, SF_SMOKE)
    df.collect()  # finalize the adaptive plan on THIS DataFrame's QE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "SortMergeJoin" not in plan
