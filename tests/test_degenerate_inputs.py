"""Degenerate-input guards (r2 ADVICE closures): MAD = 0 must yield zero
outliers on both engines instead of diverging/erroring, and the BLAS top-k
must survive an empty query set and zero-row Arrow batches."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries


def _entry(name):
    return all_queries()[name]


@pytest.fixture()
def degenerate_sf(tmp_path):
    """A sf_dir whose events all share one value (MAD = 0) and whose
    embeddings table is EMPTY (no query vectors, no corpus)."""
    pd.DataFrame({"event_id": [1, 2, 3, 4], "value": [100.0] * 4}).to_parquet(
        tmp_path / "events.parquet"
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(empty, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_mad_zero_yields_no_outliers_spark(spark, degenerate_sf):
    entry = _entry("outliers_by_mad")
    assert entry.fn(spark, degenerate_sf).count() == 0


def test_mad_zero_yields_no_outliers_oracle(degenerate_sf):
    entry = _entry("outliers_by_mad")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degenerate_sf}/events.parquet')"
    )
    assert len(con.execute(entry.oracle).fetchall()) == 0


def test_blas_topk_empty_query_set(spark, degenerate_sf):
    entry = _entry("similarity_topk_blas")
    df = entry.fn(spark, degenerate_sf)
    assert df.count() == 0
    assert df.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_blas_topk_corpus_smaller_than_batch(spark, tmp_path):
    """3 query vectors, 1 extra corpus vector — exercises the scoring path
    with tiny/ragged Arrow batches (some partitions empty on local[8])."""
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 0.0]]
    pd.DataFrame({"vec_id": [0, 1, 2, 100], "embedding": vecs}).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    entry = _entry("similarity_topk_blas")
    rows = entry.fn(spark, str(tmp_path)).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    top = {r["neighbor_id"] for r in rows if r["query_id"] == 0 and r["rank"] == 1}
    assert top == {100}  # colinear with query 0 → cos=1.0 beats the others


@pytest.fixture()
def empty_docs_sf(tmp_path):
    """A sf_dir with an EMPTY documents table (schema intact) and an events
    table holding a single event type — the shapes that break naive
    aggregate/window/percentile logic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
            "user_id": [1, 1],
            "event_type": ["view", "view"],  # KS groups click/view: one side empty
            "value": [1.0, 2.0],
            "props": ['{"k": 1}', '{"k": 2}'],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.mark.parametrize(
    "name",
    [
        "quality_gopher_rules",
        "token_budget_per_lang",
        "lang_temperature_resample",
        "dedup_chunk_exact",
        "dedup_chunk_rewrite",
        "mix_upsample_langs",
        "ngram_novelty_vs_reference",
        "decontaminate_bloom",
        "dedup_intradoc_rewrite",
        "quality_linear_score",
        "text_logprob_buckets",
        "drift_chi2_source_lang",
        # session-4 additions: the whole BPE loop, the two-phase skyline,
        # span corruption, epoch ordering, and contrastive mining must all
        # degrade to empty frames (empty vocab, empty rule rows broadcast,
        # empty pair graph) rather than erroring
        "bpe_train_merges",
        "bpe_apply_encode",
        "skyline_documents",
        "augment_span_corrupt",
        "training_epoch_order",
        "contrastive_pairs_dataset",
        # round-9 additions: corpus-trained LM scoring, DSIR models, and
        # the count-min probe set must all degrade to empty (empty count
        # tables, empty bucket models, empty top-k) rather than erroring
        "lm_bigram_cross_entropy",
        "dsir_importance_weights",
        "sketch_countmin_words",
    ],
)
def test_curation_ops_survive_empty_documents(spark, empty_docs_sf, name):
    """Every curation/drift operator over documents must return an EMPTY
    frame (not error) on an empty corpus — percentile cutpoints, rate
    tables, and chi-square marginals all degenerate to empty/null inputs."""
    assert _entry(name).fn(spark, empty_docs_sf).count() == 0


def test_ks_drift_one_empty_group(spark, empty_docs_sf):
    """KS with one empty sample: ECDF denominator for the missing group is
    NULL/0 — the statistic row must come back without a division error and
    report n_b = 0 (no 'click' events in the fixture)."""
    rows = _entry("drift_ks_events_value").fn(spark, empty_docs_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    # exact fixture expectations: 0 'click' rows (group a), 2 'view' rows
    # (group b); the empty sample's flat-zero ECDF makes D read total drift
    assert r["n_a"] == 0 and r["n_b"] == 2
    assert r["ks_stat"] == 1.0


def test_chunk_dedup_partial_tail_parity(spark, tmp_path):
    """Docs whose word count is NOT a multiple of the chunk width, duplicated
    exactly: both engines must agree that the 5-word TAIL is not a chunk
    (DuckDB CAST(x/y AS INT) rounds 3.5 -> 4 and would emit a phantom
    partial chunk — pinned here with a 35-word duplicate pair)."""
    words35 = " ".join(f"w{i}" for i in range(35))
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [words35, words35, "short text here"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(words35)] * 2 + [15],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    entry = _entry("dedup_chunk_exact")
    got = entry.fn(spark, str(tmp_path)).orderBy("chunk_hash").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(entry.oracle + " ORDER BY chunk_hash").df()
    # exactly 3 full chunks duplicated across the identical pair; no 4th
    assert len(got) == 3
    assert got["chunk_hash"].tolist() == want["chunk_hash"].tolist()
    assert got["n_docs"].tolist() == [2, 2, 2]
    assert want["n_docs"].astype(int).tolist() == [2, 2, 2]


def test_gopher_rules_zero_word_doc_parity(spark, tmp_path):
    """A document with NO alphanumeric tokens: mean word length must be 0.0
    on both engines (DuckDB list_sum([]) is NULL, Spark's aggregate seed is
    0 — the oracle coalesces), top_word_ratio NULL on both, keep=false."""
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["!!! ??? ...", "the quick brown fox jumps over the lazy dog and then runs far away"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [11, 67],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    entry = _entry("quality_gopher_rules")
    got = entry.fn(spark, str(tmp_path)).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(entry.oracle + " ORDER BY doc_id").df()
    assert got["mean_word_len"].tolist()[0] == 0.0
    assert float(want["mean_word_len"].iloc[0]) == 0.0
    assert pd.isna(got["top_word_ratio"].iloc[0]) and pd.isna(want["top_word_ratio"].iloc[0])
    assert bool(got["keep"].iloc[0]) is False and not bool(want["keep"].iloc[0])
    assert bool(got["keep"].iloc[1]) and bool(want["keep"].iloc[1])


def test_semdedup_empty_embeddings(spark, degenerate_sf):
    """SemDeDup on an EMPTY embeddings table: no seeds → no cells → every
    stage degenerates to an empty frame with the right schema, not an
    error."""
    df = _entry("dedup_semantic_semdedup").fn(spark, degenerate_sf)
    assert df.count() == 0
    assert df.columns == ["vec_id", "cell", "kept"]


def test_profile_documents_empty_corpus(spark, empty_docs_sf):
    """Profiling an EMPTY table: one report row per column with zero
    counts and NULL min/max — not an error, not an empty frame."""
    rows = {r["column"]: r for r in _entry("profile_documents").fn(spark, empty_docs_sf).collect()}
    assert set(rows) == {"doc_id", "lang", "source", "n_chars"}
    for r in rows.values():
        assert r["n_nulls"] == 0 and r["n_distinct"] == 0
        assert r["min_value"] is None and r["max_value"] is None


def test_profile_frame_handles_dotted_column_names(spark):
    """profile_frame's 'any frame' contract: dotted column names (legal in
    parquet/JSON-derived schemas) must profile via backtick-quoted refs,
    not break column resolution."""
    from dblp_to_csv_spark.operators.statistics import profile_frame

    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "x"]).withColumnRenamed(
        "x", "meta.lang"
    )
    rows = {r["column"]: r for r in profile_frame(df).collect()}
    assert rows["meta.lang"]["n_nulls"] == 1
    assert rows["meta.lang"]["n_distinct"] == 1
    assert rows["id"]["n_distinct"] == 2


@pytest.fixture()
def empty_all_sf(tmp_path):
    """Empty documents + embeddings + orders with full production schemas —
    the empty-input sweep for the session-4 retrieval/PQ/CDC operators."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderstatus": pa.array([], type=pa.string()),
                "o_totalprice": pa.array([], type=pa.float64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
                "o_orderpriority": pa.array([], type=pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "l_partkey": pa.array([], type=pa.int64()),
                "l_suppkey": pa.array([], type=pa.int64()),
                "l_linenumber": pa.array([], type=pa.int32()),
                "l_quantity": pa.array([], type=pa.float64()),
                "l_extendedprice": pa.array([], type=pa.float64()),
                "l_discount": pa.array([], type=pa.float64()),
                "l_tax": pa.array([], type=pa.float64()),
                "l_returnflag": pa.array([], type=pa.string()),
                "l_linestatus": pa.array([], type=pa.string()),
                "l_shipdate": pa.array([], type=pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    return str(tmp_path)


@pytest.mark.parametrize(
    "name",
    [
        "rag_retrieve_chunks",
        "search_hybrid_rrf",
        "similarity_topk_pq",
        "embedding_random_projection",
        "merge_upsert_orders",
        "incremental_agg_merge",
    ],
)
def test_session4_ops_survive_empty_inputs(spark, empty_all_sf, name):
    """The retrieval, PQ, projection, and CDC operators must return empty
    frames on empty inputs — empty codebooks, empty BM25 stats rows, empty
    change feeds included (review r8 session 4)."""
    assert _entry(name).fn(spark, empty_all_sf).count() == 0


def test_constraint_audit_empty_orders_all_zero(spark, empty_all_sf):
    """constraint_audit_orders on an empty table reports the fixed 5
    constraint rows, each with zero violations (counts over empty)."""
    rows = {
        r["constraint_name"]: r["n_violations"]
        for r in _entry("constraint_audit_orders").fn(spark, empty_all_sf).collect()
    }
    assert len(rows) == 5 and set(rows.values()) == {0}


def test_scd2_and_transitions_on_minimal_log(spark, empty_docs_sf):
    """A 2-event single-user, single-type log: SCD2 collapses to ONE open
    version; the transition matrix is the single self-loop with p=1."""
    rows = _entry("scd2_user_state").fn(spark, empty_docs_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.version, r.state, r.is_current, r.n_events) == (1, "view", True, 2)
    assert r.valid_to is None

    tm = _entry("event_transition_matrix").fn(spark, empty_docs_sf).collect()
    assert len(tm) == 1
    assert (tm[0].prev_type, tm[0].next_type, tm[0].n) == ("view", "view", 1)
    assert tm[0].p_next_given_prev == 1.0


def test_welch_with_both_arms_absent(spark, empty_docs_sf):
    """No purchase/click rows at all: the 1-row readout must come back with
    NULL statistics (no division error), mirroring the oracle's shape."""
    rows = _entry("ab_test_welch").fn(spark, empty_docs_sf).collect()
    assert len(rows) == 1
    assert rows[0].t_stat is None and rows[0].n_a is None


def test_acf_single_pair_yields_null_corr(spark, empty_docs_sf):
    """Two hourly points -> lag-1 has ONE pair: corr of a single point is
    undefined and must surface as NULL, not NaN or an error."""
    rows = _entry("acf_event_values").fn(spark, empty_docs_sf).collect()
    by_lag = {r.lag: r for r in rows}
    assert by_lag[1].n_pairs == 1 and by_lag[1].acf is None


@pytest.mark.parametrize(
    "name",
    [
        # round-9 session-3 additions: empty baskets (null quantile cutoff),
        # empty price column (null bounds), empty digit stream — all must
        # degrade to empty frames rather than erroring on null arithmetic
        "cooccurrence_parts_pmi",
        "histogram_equiwidth_prices",
        "benford_digit_audit",
    ],
)
def test_association_stats_survive_empty_tables(spark, empty_all_sf, name):
    assert _entry(name).fn(spark, empty_all_sf).count() == 0


def test_mann_whitney_with_both_arms_absent(spark, empty_docs_sf):
    """No purchase/click rows: the 1-row readout surfaces NULL statistics
    (null sums propagate through the exact-integer rank arithmetic) rather
    than a division error — same contract as ab_test_welch."""
    rows = _entry("ab_test_mann_whitney").fn(spark, empty_docs_sf).collect()
    assert len(rows) == 1
    assert rows[0].n_a is None and rows[0].z is None


def test_scd2_pit_join_minimal_log(spark, tmp_path):
    """One user: a purchase BEFORE any state row must survive the left join
    with NULL state; a purchase after a state change must pick the run in
    effect AT ITS TIMESTAMP (not the latest one)."""
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # purchase before any state -> NULL
                    "2024-01-01 01:00:00",  # view state begins (v1)
                    "2024-01-01 02:00:00",  # purchase during 'view'
                    "2024-01-01 03:00:00",  # click state begins (v2)
                    "2024-01-01 04:00:00",  # purchase during 'click'
                ]
            ),
            "user_id": [7, 7, 7, 7, 7],
            "event_type": ["purchase", "view", "purchase", "click", "purchase"],
            "value": [1.0, 0.0, 2.0, 0.0, 3.0],
            "props": ["{}"] * 5,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    rows = {
        r.event_id: r
        for r in _entry("scd2_point_in_time_join").fn(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 3
    assert rows[1].state_at is None and rows[1].state_version is None
    assert (rows[3].state_at, rows[3].state_version) == ("view", 1)
    assert (rows[5].state_at, rows[5].state_version) == ("click", 2)


def test_cusum_and_rolling_median_minimal_series(spark, empty_docs_sf):
    """Two hourly points, one type: CUSUM peaks at the first hour with
    |S1| = |v1 - mean| = 0.5; the rolling median warms up from the single
    value to the two-point interpolated median."""
    cp = _entry("changepoint_cusum_events").fn(spark, empty_docs_sf).collect()
    assert len(cp) == 1
    assert cp[0].event_type == "view" and cp[0].n_hours == 2
    assert cp[0].max_abs_cusum == 0.5

    rm = (
        _entry("rolling_median_hourly")
        .fn(spark, empty_docs_sf)
        .orderBy("h")
        .collect()
    )
    assert [r.med5 for r in rm] == [1.0, 1.5]


def test_rfm_and_skipgram_survive_empty_tables(spark, empty_all_sf):
    """Empty orders: every RFM cutpoint is NULL and zero customers score.
    Empty documents: no tokens survive subsampling, zero pairs emit."""
    assert _entry("orders_rfm_segments").fn(spark, empty_all_sf).count() == 0
    assert _entry("skipgram_pairs_subsampled").fn(spark, empty_all_sf).count() == 0


def test_abc_pareto_empty_lineitem(spark, empty_all_sf):
    assert _entry("parts_abc_pareto").fn(spark, empty_all_sf).count() == 0


def test_histogram_constant_column_single_bin(spark, tmp_path):
    """All prices equal (width = 0): both engines must put every row in
    bin 0 with frac 1.0 instead of dividing by zero (Spark ANSI would
    raise; review r9 session 3)."""
    pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_partkey": [1, 2],
            "l_suppkey": [1, 1],
            "l_linenumber": [1, 1],
            "l_quantity": [1.0, 2.0],
            "l_extendedprice": [100.0, 100.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    entry = _entry("histogram_equiwidth_prices")
    rows = entry.fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert (rows[0].bin, rows[0].n, rows[0].frac) == (0, 2, 1.0)
    assert rows[0].bin_lo == 100.0 and rows[0].bin_hi == 100.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = con.execute(entry.oracle).fetchall()
    assert len(want) == 1 and want[0][0] == 0 and want[0][3] == 2


def test_mann_whitney_all_tied_null_z(spark, tmp_path):
    """Both arms present but every value identical: sigma2 == 0 exactly, so
    z must come back NULL on both engines, not an ANSI divide-by-zero
    (review r9 session 3)."""
    rows = [("purchase", 5.0)] * 4 + [("click", 5.0)] * 3
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)),
            "user_id": [1] * len(rows),
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    entry = _entry("ab_test_mann_whitney")
    got = entry.fn(spark, str(tmp_path)).collect()[0]
    assert (got.n_a, got.n_b, got.tie_groups) == (4, 3, 1)
    assert got.u_a == 6.0 and got.mean_u == 6.0 and got.z is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(entry.oracle).fetchall()[0]
    assert want[-1] is None  # z


def test_welch_all_tied_null_t(spark, tmp_path):
    """Both arms present, n>=2 each, but every value identical: both sample
    variances are exactly 0, so se2 == 0 and the Welch-Satterthwaite
    denominator == 0 — t_stat and welch_df must come back NULL on both
    engines, not an ANSI DIVIDE_BY_ZERO (advisor r9; same class as
    test_mann_whitney_all_tied_null_z)."""
    rows = [("purchase", 5.0)] * 4 + [("click", 5.0)] * 3
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)),
            "user_id": [1] * len(rows),
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    entry = _entry("ab_test_welch")
    got = entry.fn(spark, str(tmp_path)).collect()[0]
    assert (got.n_a, got.n_b) == (4, 3)
    assert got.mean_a == 5.0 and got.mean_b == 5.0 and got.mean_diff == 0.0
    assert got.t_stat is None and got.welch_df is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(entry.oracle).df().iloc[0]
    assert pd.isna(want["t_stat"]) and pd.isna(want["welch_df"])


def test_scd2_runs_tiebreak_on_event_id(spark, tmp_path):
    """Duplicate (user_id, ts) with different event types: run assignment
    must follow event_id order deterministically (the run_id running sum
    previously ordered by ts alone — review r9 session 3)."""
    ev = pd.DataFrame(
        {
            "event_id": [2, 1, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 01:00:00"]
            ),
            "user_id": [1, 1, 1],
            "event_type": ["click", "view", "click"],
            "value": [0.0, 0.0, 0.0],
            "props": ["{}"] * 3,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    rows = sorted(
        _entry("scd2_user_state").fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.version,
    )
    # event_id order: view(1) then click(2) then click(3) -> runs view, click
    assert [(r.version, r.state, r.n_events) for r in rows] == [
        (1, "view", 1),
        (2, "click", 2),
    ]


def test_semantic_decon_empty_embeddings(spark, empty_all_sf):
    assert _entry("decontaminate_semantic").fn(spark, empty_all_sf).count() == 0


def test_funnel_timing_no_conversions(spark, empty_docs_sf):
    """Views but zero purchases: 1-row readout with n_converted = 0,
    conversion_rate 0.0, NULL percentiles — never a division error."""
    rows = _entry("funnel_time_to_convert").fn(spark, empty_docs_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_entered, r.n_converted, r.conversion_rate) == (1, 0, 0.0)
    assert r.p50_sec is None and r.mean_sec is None


def test_weighted_percentiles_empty_lineitem(spark, empty_all_sf):
    assert (
        _entry("weighted_percentiles_price").fn(spark, empty_all_sf).count() == 0
    )


def test_funnel_timing_zero_entrants(spark, empty_all_sf):
    """Events exist but NO user ever viewed (purchase-only log): n_entered
    is 0 and conversion_rate must surface as NULL via try_divide, not an
    ANSI divide-by-zero (review r9 session 3)."""
    import os

    ev = pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-01-01"]),
            "user_id": [1],
            "event_type": ["purchase"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    ev.to_parquet(os.path.join(empty_all_sf, "events.parquet"))
    rows = _entry("funnel_time_to_convert").fn(spark, empty_all_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_entered, r.n_converted) == (0, 0)
    assert r.conversion_rate is None and r.p50_sec is None


def test_zero_embedding_cosine_null_not_crash(spark, tmp_path):
    """An all-zero embedding (real pipelines emit them for OOV/empty docs)
    has zero norm: cosine against it is undefined. Spark 4 ANSI double
    division by zero THROWS where DuckDB returns NULL (the ab_test_welch
    class, advisor r9) — the guarded norm must make the pair NULL/filtered
    on both engines instead of failing the job."""
    import numpy as np

    rng = np.random.default_rng(7)
    emb = [list(map(float, rng.normal(size=8))) for _ in range(4)]
    emb.append([0.0] * 8)  # the degenerate vector
    pd.DataFrame(
        {
            "vec_id": list(range(5)),
            "embedding": [np.array(e, dtype=np.float32) for e in emb],
            "label": [0, 0, 1, 1, 1],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    entry = _entry("dedup_embedding_cosine")
    got = entry.fn(spark, str(tmp_path)).toPandas()  # must not raise
    assert not (set(got.get("vec_a", [])) | set(got.get("vec_b", []))) & {4}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.execute(entry.oracle).df()
    assert len(got) == len(want)


def test_null_rows_never_kill_python_workers(spark, tmp_path):
    """Dirty corpora carry NULL text / NULL embeddings / NULL event types
    (OOV docs, failed feature extraction, schema drift). The Arrow-batched
    Python paths and the map build must degrade per-row (quarantine, NaN,
    skipped entry) — never kill the job (r10 all-NULL probe)."""
    import numpy as np

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["hello", None],
            "lang": ["en", None],
            "source": ["s", None],
            "n_chars": [5, None],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [np.array([3.0, 4.0], dtype=np.float32), None],
            "label": [0, None],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "user_id": [1, 1, 2],
            "event_type": ["click", None, None],
            "value": [1.0, None, None],
            "props": ["{}", None, None],
        }
    ).to_parquet(tmp_path / "events.parquet")
    sf = str(tmp_path)

    bmp = _entry("multimodal_decode_bmp").fn(spark, sf).toPandas().set_index("doc_id")
    assert bool(bmp.loc[1, "ok"]) and not bool(bmp.loc[2, "ok"])

    frames = _entry("multimodal_frame_sample").fn(spark, sf).toPandas()
    assert set(frames["doc_id"]) == {1}  # NULL doc contributes no frames

    feats = _entry("multimodal_feature_extract").fn(spark, sf).toPandas()
    assert set(feats["doc_id"]) == {1}

    norms = (
        _entry("pandas_udf_vector_norm").fn(spark, sf).toPandas().set_index("vec_id")
    )
    assert norms.loc[1, "l2_norm"] == 5.0
    assert pd.isna(norms.loc[2, "l2_norm"])

    quant = (
        _entry("arrow_quantize_embeddings").fn(spark, sf).toPandas().set_index("vec_id")
    )
    assert quant.loc[2, "q_codes"] == ""  # NULL vector -> empty code string

    maps = _entry("map_functions_events").fn(spark, sf).toPandas().set_index("user_id")
    assert maps.loc[1, "clicks"] == 1
    assert maps.loc[2, "clicks"] == 0  # only-NULL-typed user keeps a row
