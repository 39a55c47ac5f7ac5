"""Corpus-curation operators (SURVEY.md §2.4): the selection/weighting stages
between filtering and training — rule-based quality gating (Gopher-style),
per-language token budgeting, temperature resampling, chunk-level exact
duplication analysis, near-dup cluster accounting, and perplexity-bucket
labeling (CCNet-style head/middle/tail).

The reference (XMLToCSV.py:1-415) has no corpus-curation surface at all;
these exist because a 100 TB training-data pipeline is mostly THIS — deciding
what to keep, in what proportion, and what it costs to drop the rest.

Scale notes:
* Everything deterministic: sampling decisions are pure functions of ids
  (md5-uniform draws), so re-runs, retries, and engine swaps keep identical
  rows — the exactly-once property rand() cannot give.
* The only shuffles are per-key windows/aggregates on high-cardinality keys
  (lang, component, chunk hash); rate/cutpoint tables are 1-row-to-few-rows
  aggregates broadcast back — never a second pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.text import (
    BIGRAMS_SQL,
    STOPWORDS,
    WORDS_SQL,
    bigrams,
    shingles,
    words,
)
from dblp_to_csv_spark.functions.rounding import (
    ROUND_TIES_DOWN_SQL,
    round_ties_down,
)
from dblp_to_csv_spark.operators.dedup import _CC_ORACLE_CTES
from dblp_to_csv_spark.operators.dedup import (
    cc_labels_single_use as _cc_labels_single_use,
)
from dblp_to_csv_spark.operators.dedup import connected_components_min_label
from dblp_to_csv_spark.operators.text_analysis import text_unigram_logprob
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

_WORDS = WORDS_SQL.format(col="text")
_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shape, scaled to the
# synthetic corpus: docs are 10-110 words of lowercase tokens).
GOPHER_MIN_WORDS = 10
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_TOP_WORD_MAX = 0.2  # most-common word ≤ 20% of the doc
GOPHER_MIN_STOP_DISTINCT = 2  # ≥ 2 distinct stopwords present

LANG_TOKEN_BUDGET = 5_000  # tokens admitted per language
CHUNK_WORDS = 10  # non-overlapping exact-dup chunk width


def _gopher_m_sql(src: str) -> str:
    """The Gopher metric CTE body over a (doc_id, w) source — ONE
    definition shared by the standalone quality_gopher_rules oracle and the
    pretrain composite's q stage (review r8 session 3: a hand-copied
    variant of this predicate would silently diverge on the next threshold
    or tokenization change)."""
    return f"""
            SELECT doc_id,
                   len(w) AS n_words,
                   -- COALESCE: list_sum([]) is NULL in DuckDB, while Spark's
                   -- aggregate() starts from the 0 seed — align on 0.0
                   ROUND(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
                         * 1.0 / GREATEST(len(w), 1), 6) AS mean_word_len,
                   ROUND(list_max(list_transform(list_distinct(w),
                             x -> len(list_filter(w, y -> y = x))))
                         * 1.0 / GREATEST(len(w), 1), 6) AS top_word_ratio,
                   len(list_filter(list_distinct(w),
                       x -> list_contains([{_STOP_LIST}], x))) AS n_stop_distinct
            FROM {src}
    """


_GOPHER_KEEP_PRED = (
    f"(n_words >= {GOPHER_MIN_WORDS} "
    f"AND mean_word_len BETWEEN {GOPHER_MEAN_LEN_LO} AND {GOPHER_MEAN_LEN_HI} "
    f"AND top_word_ratio <= {GOPHER_TOP_WORD_MAX} "
    f"AND n_stop_distinct >= {GOPHER_MIN_STOP_DISTINCT})"
)


def _chunk_exprs(w):
    """Shared non-overlapping ``CHUNK_WORDS``-word chunking expressions —
    ``(n_chunks, idxs, chunk_hashes)`` over a token-array column. ONE
    definition for the three chunk operators (exact report, corpus rewrite,
    intra-doc rewrite) so boundary handling, the empty-array guard, and the
    md5-over-joined-words hash can never diverge between them."""
    n_chunks = (F.size(w) / CHUNK_WORDS).cast("int")
    idxs = F.when(
        F.size(w) >= CHUNK_WORDS, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunk_hashes = F.transform(
        idxs,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(w, i * CHUNK_WORDS + 1, CHUNK_WORDS))
        ),
    )
    return n_chunks, idxs, chunk_hashes

# Cluster-label frames are a vanishing fraction of the corpus on real data,
# but their size is bounded only by that assumption — a pathologically
# duplicated corpus makes them corpus-sized, and a FORCED broadcast then
# fails with an executor/driver OOM instead of degrading to a shuffle join.
# The frames come out of the CC loop checkpointed, so one count() is cheap;
# past the threshold we hand the join to AQE (which still broadcasts when
# runtime stats allow). Gate now shared with dedup.py's drop-set joins.
from dblp_to_csv_spark.operators.dedup import broadcast_if_small as _broadcast_if_small


@register(
    "quality_gopher_rules",
    tags=("pipeline", "text", "quality"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        m AS ({_gopher_m_sql("t")})
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
               top_word_ratio, CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct,
               {_GOPHER_KEEP_PRED} AS keep
        FROM m
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery: word count, mean word length, most-common-
    word dominance, and distinct-stopword presence → a keep verdict. The
    C4-shape gate (text_quality_score) tests ratios of the whole text; this
    one tests the WORD DISTRIBUTION, which is what catches machine-generated
    and keyword-stuffed pages.

    All four metrics are array expressions over one tokenization — a single
    narrow projection, no shuffle, fully inside codegen. The top-word scan is
    O(words²) per document (array_distinct × filter) — bounded by document
    length, linear in corpus size, and still cheaper than the explode +
    groupBy + window alternative, which would shuffle every token."""
    # fan-out-gated scan (guide §2.5): the battery is row-local (array
    # folds only), so partitioning cannot move a value.
    return gopher_metrics(
        fan_out_small(load_table(spark, sf_dir, "documents"), "doc_id")
    )


def gopher_metrics(docs_raw: DataFrame) -> DataFrame:
    """The Gopher battery over an arbitrary (doc_id, text) frame — shared by
    the registered query above and the incremental admission chain
    (admission_incremental.py), which must score each BATCH with the exact
    per-row expressions the batch flagship uses for sequential==batch
    parity."""
    docs = docs_raw.select("doc_id", words("text").alias("w"))
    w = F.col("w")
    n_words = F.size(w)
    denom = F.greatest(n_words, F.lit(1))
    mean_word_len = F.round(
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        * 1.0
        / denom,
        6,
    )
    # Most-common-word count as the MAX RUN LENGTH of the SORTED token
    # array (r14 optimization round, the quality_repetition_rules move):
    # array_sort + one O(m) fold replaces the O(distinct × m)
    # array_distinct × filter scan — the same integer (equal tokens are
    # adjacent exactly once after sorting; asserted value-equal on the full
    # sf0.1 corpus). Empty/NULL token arrays keep the array_max semantics
    # (NULL) via the size guard.
    _sorted_w = F.array_sort(w)
    _acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    _nrun = lambda acc, x: (  # noqa: E731
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
    )
    _top_count = F.aggregate(
        _sorted_w,
        _acc0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            _nrun(acc, x).alias("run"),
            F.greatest(acc["best"], _nrun(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_word_ratio = F.round(
        F.when(n_words > 0, _top_count) * 1.0 / denom,
        6,
    )
    n_stop_distinct = F.size(
        F.filter(F.array_distinct(w), lambda x: x.isin(*STOPWORDS))
    )
    m = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        top_word_ratio.alias("top_word_ratio"),
        n_stop_distinct.cast("long").alias("n_stop_distinct"),
    )
    return m.select(
        "*",
        (
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & F.col("mean_word_len").between(GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI)
            & (F.col("top_word_ratio") <= GOPHER_TOP_WORD_MAX)
            & (F.col("n_stop_distinct") >= GOPHER_MIN_STOP_DISTINCT)
        ).alias("keep"),
    )


@register(
    "token_budget_per_lang",
    tags=("pipeline", "sampling", "window"),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, CAST(len({_WORDS}) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, lang, n_tokens
        FROM (
            SELECT doc_id, lang, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS start_offset
            FROM t
        )
        WHERE start_offset < {LANG_TOKEN_BUDGET}
    """,
)
def token_budget_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: admit documents per language, in deterministic
    doc_id order, until the language's token budget is spent (a document
    whose first token lands inside the budget is admitted whole) — how a
    mixture spec ("50 B tokens of en, 10 B of de, …") turns into a concrete
    document set.

    One running-sum window per language partition, one filter — the shuffle
    key is lang, and each partition's prefix sum is independent. At 100 TB
    the per-lang scan parallelizes by pre-bucketing doc_id ranges (the
    budget check composes: bucket offsets are a 1-row-per-bucket aggregate,
    broadcast back — same shape as pack_concat_chunks)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(words("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        t.withColumn("start_offset", start)
        .filter(F.col("start_offset") < LANG_TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens")
    )


@register(
    "lang_temperature_resample",
    tags=("pipeline", "sampling"),
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang,
                   ROUND(sqrt((SELECT MIN(cnt) FROM counts) * 1.0 / cnt), 9)
                       AS keep_rate
            FROM counts
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r USING (lang)
        WHERE ('0x' || substr(md5('t|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0 < r.keep_rate
    """,
)
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling (α = 0.5): per-language keep rates
    ∝ count^(α−1), normalized so the smallest language keeps 100% —
    keep_rate(l) = sqrt(min_count / count(l)). The multilingual-balancing
    move (over-represented languages are downsampled toward the temperature
    distribution) that turns a crawl's natural skew into a training mix.

    Determinism across engines: the per-doc uniform draw is the first 32
    bits of md5('t|'+doc_id) scaled to [0,1) — exact integer construction,
    identical in Spark and DuckDB; the rate is rounded to 9 decimals so both
    engines compare against the same constant. The rate table is a per-lang
    aggregate (5 rows) broadcast back onto the scan — one aggregate pass,
    one map-side join, no corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("min_cnt"))
    rates = counts.crossJoin(F.broadcast(min_cnt)).select(
        "lang",
        F.round(F.sqrt(F.col("min_cnt") * 1.0 / F.col("cnt")), 9).alias("keep_rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("t|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / 4294967296.0
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(u < F.col("keep_rate"))
        .select("doc_id", "lang")
    )


@register(
    "dedup_chunk_exact",
    tags=("dedup", "text"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        chunks AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(w) >= {CHUNK_WORDS} THEN
                       list_transform(
                           -- integer division (//): CAST(x/y AS INT) ROUNDS in
                           -- DuckDB (3.5 -> 4) and would emit a phantom partial
                           -- chunk that Spark's truncating cast never builds
                           generate_series(0, CAST(len(w) // {CHUNK_WORDS} AS INT) - 1),
                           i -> md5(array_to_string(
                               list_slice(w, i * {CHUNK_WORDS} + 1,
                                          i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')))
                       ELSE [] END) AS chunk_hash
            FROM t
        )
        SELECT chunk_hash,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM chunks
        GROUP BY chunk_hash
        HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact duplication analysis: documents are cut into
    non-overlapping ``CHUNK_WORDS``-word chunks and chunks appearing in ≥ 2
    distinct documents are reported with their spread — the granular exact-
    substring dedup signal (Lee et al. 2022's motivation) at chunk
    resolution: document-level exact dedup misses pages that share
    boilerplate paragraphs inside otherwise-distinct text.

    Spark shape: chunk hashes are built INSIDE the row (transform over the
    token array — no token explode), so the only exploded/shuffled unit is
    the 32-byte chunk hash, ~1/{CHUNK_WORDS} of the token count; the
    aggregate is one hash-shuffle on chunk_hash with map-side partials. At
    100 TB this is the cheapest join-key granularity that still finds
    shared paragraphs."""
    # fan-out-gated scan (guide §2.5); chunk hashing + COUNT aggregates are
    # order-exact.
    docs = fan_out_small(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", words("text").alias("w"))
    w = F.col("w")
    n_chunks, idxs, chunk_hashes = _chunk_exprs(w)
    return (
        docs.select("doc_id", F.explode(chunk_hashes).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "dedup_cluster_stats",
    tags=("dedup", "graph", "iterative"),
    oracle=_CC_ORACLE_CTES
    + f"""
        , labels AS (
            SELECT doc_id, MIN(label) AS component FROM reach GROUP BY doc_id
        )
        SELECT l.component,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(d.n_chars) AS BIGINT) AS n_chars_total,
               CAST(COALESCE(SUM(CASE WHEN l.doc_id <> l.component
                                      THEN d.n_chars END), 0) AS BIGINT)
                   AS n_chars_dropped
        FROM labels l JOIN documents d USING (doc_id)
        GROUP BY l.component
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster accounting — the report every dedup pipeline ends
    with: per cluster (connected component over the MinHash-LSH pair graph,
    labeled by its canonical min doc_id), how many documents it holds and
    how many characters deduplication drops by keeping only the canonical.

    Builds on connected_components_min_label (same per-round join+min loop,
    parquet-checkpointed); the stats pass is one broadcast-sized join from
    the label frame (|docs in clusters|, a vanishing fraction of the corpus)
    back to the documents scan, then a per-component aggregate. Shares its
    WITH RECURSIVE oracle base with the CC registrations. The labels come
    through the single-use contract (r14 session 6): this query's one
    action consumes them exactly once, so the in-core union-find runs
    inside it — no labels_local parquet round-trip — and the broadcast
    hint is proven by the gate instead of counted."""
    labels, bcastable = _cc_labels_single_use(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return _cluster_stats_from_labels(
        F.broadcast(labels) if bcastable else _broadcast_if_small(labels),
        docs,
        hinted=True,
    )


def _cluster_stats_from_labels(
    labels: DataFrame, docs: DataFrame, hinted: bool = False
) -> DataFrame:
    """Per-component accounting from an existing (doc_id, component) label
    frame — shared by the registered query and ``curate_corpus``.
    ``hinted=True`` means the caller already attached the broadcast hint
    (or proved it must not be attached)."""
    return (
        (labels if hinted else _broadcast_if_small(labels))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("doc_id") != F.col("component"), F.col("n_chars")
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("n_chars_dropped"),
        )
    )


def _kept_docs_from_labels(
    labels: DataFrame, docs: DataFrame, drop_broadcastable: bool = False
) -> DataFrame:
    """Canonical-survivor docs (all columns) from an existing label frame —
    the ONE definition of the drop rule (doc_id != component), shared by
    the keep-canonical report and curate_corpus's rewrite input.
    ``drop_broadcastable=True``: the caller has PROVEN the drop set fits a
    broadcast (single-use CC gate), so skip broadcast_if_small's count()
    — on a lazy label frame that count would execute the in-core finisher
    an extra time."""
    drop = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    if drop_broadcastable:
        drop = F.broadcast(drop)
    else:
        drop = _broadcast_if_small(drop)
    return docs.join(drop, "doc_id", "left_anti")


def _keep_canonical_from_labels(
    labels: DataFrame, docs: DataFrame, drop_broadcastable: bool = False
) -> DataFrame:
    """Canonical-survivor selection from an existing label frame — shared by
    the registered query and ``curate_corpus``."""
    return _kept_docs_from_labels(
        labels, docs, drop_broadcastable=drop_broadcastable
    ).select("doc_id", "lang", "source")


def curate_corpus(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> dict[str, DataFrame]:
    """Production composite (ROADMAP item 12): ONE MinHash-LSH →
    connected-components chain serves every dedup report — returns
    ``{"labels": ..., "cluster_stats": ..., "keep_canonical": ...}`` all
    derived from a single label computation. The registered queries
    (`dedup_cluster_stats`, `dedup_keep_canonical`) intentionally share no
    state — each reruns the chain so the driver can verify them
    independently — but a real pipeline runs the chain once: the label
    frame comes out of the CC loop parquet-checkpointed, so every derived
    frame reads the checkpoint instead of recomputing pairs+clustering
    (~halves the wall-clock of running both reports at sf0.1).
    Output parity with the registered queries is pinned in
    tests/test_curate_composite.py.

    Round 8: the VERIFIED PAIR FRAME itself is now the shared checkpoint —
    one MinHash chain feeds connected components AND graph PageRank, so
    adding a graph report costs only its own iterations, never another
    pair search. The composite now also emits ``clean_corpus``: the
    canonical survivors additionally passed through the exact-substring
    rewrite (document-level near-dup drop, THEN passage-level cut — the
    order production pipelines use, since whole-doc dedup first shrinks
    the window-marking input)."""
    import os

    from dblp_to_csv_spark.operators.dedup import (
        dedup_graph_pagerank,
        minhash_lsh_pairs,
    )
    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, checkpoint_dir, "_curate_")
    pairs_path = os.path.join(base, "pairs")
    minhash_lsh_pairs(spark, sf_dir).write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    labels = connected_components_min_label(
        spark,
        sf_dir,
        checkpoint_dir=checkpoint_dir,
        pairs=pairs,
        # this composite's pairs checkpoint IS the shared artifact — the CC
        # loop must not re-write it (r14 session 6)
        pairs_checkpointed=True,
    )
    docs = load_table(spark, sf_dir, "documents")
    kept_docs = _kept_docs_from_labels(labels, docs)
    return {
        "labels": labels,
        "cluster_stats": _cluster_stats_from_labels(labels, docs),
        "keep_canonical": _keep_canonical_from_labels(labels, docs),
        "pagerank": dedup_graph_pagerank(
            spark, sf_dir, pairs=pairs, checkpoint_dir=checkpoint_dir
        ),
        "clean_corpus": substring_rewrite_frame(
            spark, kept_docs.select("doc_id", "text"), checkpoint_dir
        ),
    }


# tertile boundaries as exact-decimal literals so both engines interpolate
# from the same doubles
_TERTILES = ("0.3333333333333333", "0.6666666666666666")


@register(
    "text_logprob_buckets",
    tags=("pipeline", "text", "quality"),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS}) AS term FROM documents
        ),
        freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
        total AS (SELECT COUNT(*) AS n FROM tok),
        lp AS (
            SELECT tok.doc_id,
                   ROUND(AVG(-ln(freq.cnt * 1.0 / total.n)), 6) AS avg_neg_logprob
            FROM tok JOIN freq USING (term), total
            GROUP BY tok.doc_id
        ),
        cuts AS (
            SELECT ROUND(quantile_cont(avg_neg_logprob, {_TERTILES[0]}), 6) AS c1,
                   ROUND(quantile_cont(avg_neg_logprob, {_TERTILES[1]}), 6) AS c2
            FROM lp
        )
        SELECT lp.doc_id, lp.avg_neg_logprob,
               CASE WHEN lp.avg_neg_logprob <= cuts.c1 THEN 'head'
                    WHEN lp.avg_neg_logprob <= cuts.c2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM lp, cuts
    """,
)
def text_logprob_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: documents are labeled by
    which tertile of the corpus unigram-logprob distribution they fall in
    (head = most-fluent third). Pipelines train preferentially on head and
    middle; the bucket label is the standard quality stratum key.

    Reuses text_unigram_logprob's score (token explode → broadcast
    frequency join → per-doc aggregate), then cuts at exact tertiles via
    one 1-row percentile aggregate broadcast back — the same windowless
    cutpoint idiom as quartile_labels_by_cutpoint (no global Window, no
    single-reducer sort; the distribution pass is an aggregate, scale-safe).
    Cutpoints round to 6 decimals on both engines so boundary comparisons
    agree bit-for-bit.

    The score frame CHECKPOINTS before its two consumers (the cutpoint
    aggregate and the labeling pass): lp is lazy and its lineage tokenizes
    the corpus with a frequency self-reference — referenced twice it would
    run the whole chain twice (8 parquet scans / 4 explodes measured in
    r11; 2 scans / 2 explodes per pass after)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, None, "_logprob_")
    lp_path = os.path.join(base, "lp")
    text_unigram_logprob(spark, sf_dir).select(
        "doc_id", "avg_neg_logprob"
    ).write.mode("overwrite").parquet(lp_path)
    lp = spark.read.parquet(lp_path)
    cuts = lp.agg(
        F.round(
            F.expr(f"percentile(avg_neg_logprob, {_TERTILES[0]}D)"), 6
        ).alias("c1"),
        F.round(
            F.expr(f"percentile(avg_neg_logprob, {_TERTILES[1]}D)"), 6
        ).alias("c2"),
    )
    return lp.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_neg_logprob",
        F.when(F.col("avg_neg_logprob") <= F.col("c1"), "head")
        .when(F.col("avg_neg_logprob") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@register(
    "dedup_keep_canonical",
    tags=("dedup", "graph", "pipeline"),
    oracle=_CC_ORACLE_CTES
    + """
        , labels AS (
            SELECT doc_id, MIN(label) AS component FROM reach GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, d.source
        FROM documents d LEFT JOIN labels l USING (doc_id)
        WHERE l.doc_id IS NULL OR l.doc_id = l.component
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE output of the dedup pipeline: the corpus with every non-canonical
    near-duplicate removed — a document survives iff it is not in any
    near-dup cluster, or is its cluster's canonical (min doc_id) member.
    Composes pair-finding (MinHash-LSH) → clustering (connected components)
    → selection, the end-to-end chain the individual operators demonstrate
    piecewise.

    Scale shape: the label frame is |docs in clusters| (a vanishing fraction
    of the corpus) — it BROADCASTS, and the selection is one map-side
    left-anti-style filter over the corpus scan; the corpus itself never
    shuffles in the final step. Labels come through the single-use contract
    (r14 session 6): one consumer action, so the in-core union-find runs
    inside it with no labels_local round-trip, and the drop-set broadcast
    is proven by the gate instead of counted."""
    labels, bcastable = _cc_labels_single_use(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return _keep_canonical_from_labels(
        labels, docs, drop_broadcastable=bcastable
    ).select("doc_id", "lang", "source")


@register(
    "dedup_chunk_rewrite",
    tags=("dedup", "text", "pipeline"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        base AS (
            SELECT doc_id, w,
                   CAST(len(w) // {CHUNK_WORDS} AS INT) AS n_chunks
            FROM t
        ),
        ch AS (
            SELECT doc_id, u.i AS idx,
                   md5(array_to_string(
                       list_slice(w, u.i * {CHUNK_WORDS} + 1,
                                  u.i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')) AS h
            FROM base,
                 UNNEST(CASE WHEN n_chunks > 0
                        THEN generate_series(0, n_chunks - 1)
                        ELSE [] END) AS u(i)
        ),
        kept AS (
            SELECT doc_id, idx FROM (
                SELECT doc_id, idx,
                       ROW_NUMBER() OVER (PARTITION BY h
                                          ORDER BY doc_id, idx) AS rn
                FROM ch
            ) WHERE rn = 1
        ),
        agg AS (
            SELECT doc_id, list_sort(array_agg(idx)) AS kept_idx
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id,
               -- COALESCE: DuckDB's array_to_string is NULL on an EMPTY
               -- list where Spark's array_join is '' (fully-deduplicated
               -- doc with no tail)
               COALESCE(array_to_string(
                   list_concat(
                       flatten(list_transform(COALESCE(a.kept_idx, []),
                           i -> list_slice(b.w, i * {CHUNK_WORDS} + 1,
                                           i * {CHUNK_WORDS} + {CHUNK_WORDS}))),
                       list_slice(b.w, b.n_chunks * {CHUNK_WORDS} + 1, len(b.w))
                   ), ' '), '') AS text_clean,
               CAST(COALESCE(len(a.kept_idx), 0) AS BIGINT) AS n_chunks_kept,
               CAST(b.n_chunks - COALESCE(len(a.kept_idx), 0) AS BIGINT)
                   AS n_chunks_dropped
        FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_chunk_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk dedup as a REWRITE (the C4 line-dedup move at chunk
    resolution): every non-overlapping ``CHUNK_WORDS``-word chunk keeps only
    its globally FIRST occurrence (ordered by doc_id, then chunk index);
    later occurrences are cut out and each document's text is reassembled
    from its surviving chunks plus its always-kept sub-chunk tail.
    ``dedup_chunk_exact`` reports the duplication; this operator produces
    the cleaned corpus a pipeline actually trains on.

    Scale shape: chunk hashes are built in-row (transform over the token
    array, no token explode), so the ranking shuffle moves one 32-byte hash
    per chunk (~1/{CHUNK_WORDS} of token count); first-occurrence selection
    is a per-hash window (partitioned by hash — no global sort, bounded by
    the duplication factor per chunk); reassembly re-slices the ORIGINAL
    token array by kept index, so chunk text never round-trips through the
    shuffle. Docs with no chunks (< {CHUNK_WORDS} words) skip the shuffle
    path entirely via the left join."""
    # fan-out-gated scan (guide §2.5); the hash window's row_number order
    # is the total (doc_id, idx) — order-exact.
    docs = fan_out_small(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", words("text").alias("w"))
    w = F.col("w")
    n_chunks, idxs, chunk_hashes = _chunk_exprs(w)
    base = docs.select("doc_id", "w", n_chunks.alias("n_chunks"),
                       chunk_hashes.alias("hashes"))
    ch = base.select("doc_id", F.posexplode("hashes").alias("idx", "h"))
    first = Window.partitionBy("h").orderBy("doc_id", "idx")
    kept = (
        ch.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("kept_idx"))
    )
    joined = base.join(kept, "doc_id", "left")
    kept_idx = F.coalesce(F.col("kept_idx"), F.array().cast("array<int>"))
    kept_words = F.flatten(
        F.transform(kept_idx, lambda i: F.slice(w, i * CHUNK_WORDS + 1, CHUNK_WORDS))
    )
    tail = F.slice(w, F.col("n_chunks") * CHUNK_WORDS + 1, CHUNK_WORDS)
    n_kept = F.size(kept_idx).cast("long")
    return joined.select(
        "doc_id",
        F.array_join(F.concat(kept_words, tail), " ").alias("text_clean"),
        n_kept.alias("n_chunks_kept"),
        (F.col("n_chunks").cast("long") - n_kept).alias("n_chunks_dropped"),
    )


# deterministic upsampling draw prefix (independent of the 't|' resample draw)
_UPSAMPLE_SALT = "u|"


@register(
    "mix_upsample_langs",
    tags=("pipeline", "sampling"),
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang,
                   ROUND((SELECT MAX(cnt) FROM counts) * 1.0 / cnt, 9) AS r
            FROM counts
        ),
        epochs AS (
            SELECT d.doc_id, d.lang,
                   CAST(FLOOR(r.r) AS INT)
                   + CASE WHEN ('0x' || substr(md5('{_UPSAMPLE_SALT}'
                                || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                              / 4294967296.0
                              < ROUND(r.r - FLOOR(r.r), 9)
                          THEN 1 ELSE 0 END AS n_epochs
            FROM documents d JOIN rates r USING (lang)
        )
        SELECT doc_id, lang, CAST(u.e AS INT) AS epoch
        FROM epochs, UNNEST(generate_series(1, n_epochs)) AS u(e)
    """,
)
def mix_upsample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture upsampling by REPETITION: every language is repeated up to the
    largest language's document count — repeat factor r = max_count/count,
    emitted as floor(r) full epochs per document plus one extra epoch for a
    deterministic fraction (r - floor(r)) of documents. The standard
    low-resource-language move when a mixture spec wants more of a source
    than exists (the downsampling twin is ``lang_temperature_resample``);
    the epoch column keeps repeated rows distinguishable downstream
    (shuffling/packing stages treat (doc_id, epoch) as the row key).

    Determinism across engines: the extra-epoch draw is the first 32 bits of
    md5('{_UPSAMPLE_SALT}'+doc_id) scaled to [0,1) — an exact integer
    construction independent of the resample draw; rates round to 9
    decimals. Scale shape: the rate table is a per-lang aggregate broadcast
    back onto the scan, and repetition is an in-row sequence+explode — the
    corpus is read once and never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    max_cnt = counts.agg(F.max("cnt").alias("max_cnt"))
    rates = counts.crossJoin(F.broadcast(max_cnt)).select(
        "lang", F.round(F.col("max_cnt") * 1.0 / F.col("cnt"), 9).alias("r")
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_UPSAMPLE_SALT), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / 4294967296.0
    )
    n_epochs = F.floor(F.col("r")).cast("int") + F.when(
        draw < F.round(F.col("r") - F.floor(F.col("r")), 9), 1
    ).otherwise(0)
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("doc_id", "lang", F.explode(F.sequence(F.lit(1), n_epochs)).alias("epoch"))
    )


@register(
    "dedup_intradoc_rewrite",
    tags=("dedup", "text", "pipeline"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {{words}} AS w FROM documents),
        b AS (
            SELECT doc_id, w, CAST(len(w) // {CHUNK_WORDS} AS INT) AS n
            FROM t
        ),
        h AS (
            SELECT doc_id, w, n,
                   CASE WHEN n > 0 THEN list_transform(
                       generate_series(0, n - 1),
                       i -> md5(array_to_string(
                           list_slice(w, i * {CHUNK_WORDS} + 1,
                                      i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')))
                   ELSE [] END AS hs
            FROM b
        ),
        k AS (
            SELECT doc_id, w, n,
                   CASE WHEN n > 0 THEN list_filter(
                       generate_series(0, n - 1),
                       i -> list_position(hs, hs[i + 1]) = i + 1)
                   ELSE [] END AS kept
            FROM h
        )
        SELECT doc_id,
               COALESCE(array_to_string(list_concat(
                   flatten(list_transform(kept,
                       i -> list_slice(w, i * {CHUNK_WORDS} + 1,
                                       i * {CHUNK_WORDS} + {CHUNK_WORDS}))),
                   list_slice(w, n * {CHUNK_WORDS} + 1, len(w))), ' '), '')
                   AS text_clean,
               CAST(len(kept) AS BIGINT) AS n_chunks_kept,
               CAST(n - len(kept) AS BIGINT) AS n_chunks_dropped
        FROM k
    """.format(words=_WORDS),
)
def dedup_intradoc_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document repetition rewrite: within each document, every
    non-overlapping ``CHUNK_WORDS``-word chunk keeps only its first
    occurrence IN THAT DOCUMENT (self-plagiarized boilerplate, chorus
    repetition, scraper loops), and the text is reassembled from surviving
    chunks plus the sub-chunk tail — `dedup_chunk_rewrite`'s corpus-global
    first-occurrence policy restricted to the document itself.

    Scale shape: the best possible — ZERO shuffle. Chunk hashes, the
    first-occurrence test (array_position over the in-row hash list), and
    reassembly are all array expressions over one row; the operator fuses
    into the scan and costs one narrow pass no matter the corpus size
    (plan-gated no-Exchange). The hash list is STAGED as its own projection
    before the filter references it per index — the HOF no-CSE rule."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    w = F.col("w")
    n_chunks, idxs, chunk_hashes = _chunk_exprs(w)
    base = docs.select(
        "doc_id", "w", n_chunks.alias("n"), chunk_hashes.alias("hs"), idxs.alias("idxs")
    )
    kept = F.filter(
        F.col("idxs"),
        lambda i: F.array_position(F.col("hs"), F.element_at(F.col("hs"), i + 1))
        == (i + 1).cast("long"),
    )
    staged = base.select("doc_id", "w", "n", kept.alias("kept"))
    kept_words = F.flatten(
        F.transform(F.col("kept"), lambda i: F.slice(w, i * CHUNK_WORDS + 1, CHUNK_WORDS))
    )
    tail = F.slice(w, F.col("n") * CHUNK_WORDS + 1, CHUNK_WORDS)
    n_kept = F.size("kept").cast("long")
    return staged.select(
        "doc_id",
        F.array_join(F.concat(kept_words, tail), " ").alias("text_clean"),
        n_kept.alias("n_chunks_kept"),
        (F.col("n").cast("long") - n_kept).alias("n_chunks_dropped"),
    )


# fixed logistic weights for the quality scorer (a stand-in for a trained
# fastText/logreg quality model's coefficients)
QW_BIAS = -3.0
QW_LOG_TOKENS = 0.9
QW_STOP = 4.0
QW_PUNCT = -8.0

_QSCORE_SQL = f"""
    1.0 / (1.0 + exp(-({QW_BIAS}
        + {QW_LOG_TOKENS} * ln(len(w) + 1)
        + {QW_STOP} * (len(list_filter(w, x -> list_contains([{{stops}}], x)))
                       * 1.0 / GREATEST(len(w), 1))
        + {QW_PUNCT} * (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                        * 1.0 / GREATEST(length(text), 1)))))
"""


@register(
    "quality_linear_score",
    tags=("curation", "text", "ml"),
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {{words}} AS w FROM documents)
        SELECT doc_id,
               ROUND({_QSCORE_SQL}, 6) AS quality_score,
               ROUND({_QSCORE_SQL}, 6) >= 0.5 AS keep
        FROM t
    """.format(words=_WORDS, stops=_STOP_LIST),
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring, linear/logistic form: a trained quality
    classifier's coefficients (here fixed weights over log-token-count,
    stopword ratio, and punctuation ratio — the fastText-style feature
    family) applied as ONE sigmoid expression per document. This is how a
    learned quality filter actually runs at 100 TB: the model is kilobytes
    of weights compiled into the projection (or broadcast for wide models),
    scoring fuses into the scan — no shuffle, no Python, no inference
    service in the data path. The 6-dp rounding puts both engines' exp/ln
    on the same grid (the same discipline as text_unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", words("text").alias("w")
    )
    w = F.col("w")
    n_tokens = F.size(w)
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
        * 1.0
        / F.greatest(n_tokens, F.lit(1))
    )
    punct_ratio = F.length(
        F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", "")
    ) * 1.0 / F.greatest(F.length("text"), F.lit(1))
    logit = (
        F.lit(QW_BIAS)
        + QW_LOG_TOKENS * F.log(n_tokens + F.lit(1))
        + QW_STOP * stop_ratio
        + QW_PUNCT * punct_ratio
    )
    score = F.round(1.0 / (1.0 + F.exp(-logit)), 6)
    return docs.select(
        "doc_id", score.alias("quality_score"), (score >= 0.5).alias("keep")
    )


# --------------------------------------------------------------------------
# Exact substring (sliding-window) dedup — the suffix-array dedup family
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better") re-expressed as hash-window marking: every SPAN_WORDS-word
# sliding window that re-occurs ANYWHERE in the corpus (cross- or
# intra-document) keeps only its globally first occurrence; later
# occurrences mark their covered word positions for removal. Chunk dedup
# (above) only catches duplication aligned to fixed chunk boundaries;
# sliding windows catch duplicated passages at ANY offset — the actual
# boilerplate/quotation shape in web corpora.
# --------------------------------------------------------------------------
SPAN_WORDS = 8  # sliding-window width, in words


def _span_window_base(docs: DataFrame) -> DataFrame:
    """(doc_id, w, n_win, hashes) with one md5 per SPAN_WORDS-word sliding
    window, built in-row so the corpus text never enters a shuffle — only
    32-byte hashes do.

    Construction is ZIPPED SHIFTED SLICES, not per-window slicing: the
    token array is sliced SPAN_WORDS times per DOCUMENT (shift k, length
    n_win), arrays_zip aligns the shifts, and the per-window lambda only
    reads struct fields + concat_ws + md5. Higher-order functions are
    interpreted (no codegen, no CSE), so per-WINDOW work must be O(fields):
    the naive ``transform(sequence(...), i -> md5(concat_ws(slice(w, i+1,
    SPAN))))`` allocates a fresh sub-array per window and measured 8×
    slower at sf0.1 (8.0 s vs 1.0 s for 236k windows); a lead()-window
    formulation matches this speed but reshuffles the exploded corpus text
    by doc_id, which this shape exists to avoid."""
    w = F.col("w")
    n_win = F.greatest(F.size(w) - (SPAN_WORDS - 1), F.lit(0))
    staged = docs.select(
        "doc_id",
        "w",
        n_win.alias("n_win"),
        *[F.slice(w, k + 1, n_win).alias(f"_s{k}") for k in range(SPAN_WORDS)],
    )
    zipped = F.arrays_zip(*[f"_s{k}" for k in range(SPAN_WORDS)])
    hashes = F.transform(
        zipped,
        lambda s: F.md5(
            F.concat_ws(" ", *[s[f"_s{k}"] for k in range(SPAN_WORDS)])
        ),
    )
    return staged.select("doc_id", "w", "n_win", hashes.alias("hashes"))


def _substring_base_and_marked(spark: SparkSession, sf_dir: str):
    """sf_dir-loading wrapper around ``_substring_marked_from_docs`` —
    shared front half of the two registered substring-dedup queries."""
    # fan-out-gated scan (guide §2.5): the occurrence pass (tokenize +
    # window slices + per-window md5) otherwise runs in the single-row-group
    # scan's one task; every cross-row op downstream is order-exact
    # (count_distinct / MIN-struct / distinct on md5 keys).
    docs = fan_out_small(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", words("text").alias("w"))
    return _substring_marked_from_docs(spark, docs)


def _substring_marked_from_docs(
    spark: SparkSession, docs: DataFrame, checkpoint_dir: str | None = None
):
    """Front half of substring dedup over a (doc_id, w) token frame: the
    window base, and the (doc_id, pos) occurrences of every duplicated
    window EXCEPT its canonical (globally first by (doc_id, pos))
    occurrence.

    Plan shape: one corpus-sized shuffle of (hash) rows into a partial/final
    count + min-struct aggregate — the canonical pick is an associative MIN
    over (doc_id, pos) structs, NOT a row_number window, so map-side combine
    collapses each partition's occurrences before the exchange. The
    surviving duplicated-hash table is a vanishing fraction of the corpus
    (bounded by the duplication rate); it parquet-checkpoints ONCE (the
    MinHash candidate policy — both operators and the broadcast size gate
    consume it, and without the checkpoint every consumer re-runs the
    window+aggregate chain: measured 3× the whole-query time at sf0.1)
    and attaches back onto the occurrence stream via the size-gated
    broadcast join.

    Occurrence construction (r14 optimization round, guide §1.2/§2.3):
    * the zipped shifted-slice windows POSEXPLODE to rows BEFORE the md5,
      so the hash runs as one whole-stage-codegen row expression instead
      of an interpreted ``transform`` lambda — measured 4.05 → 1.6 s for
      the occurrence pass alone at sf0.1;
    * the window hash is narrowed to its 16-byte binary form
      (``unhex(md5_hex)`` — injective, so equality semantics are exactly
      the hex string's) before it enters the aggregate exchange, halving
      the bytes of the one corpus-sized shuffle;
    * the occurrence frame parquet-checkpoints ONCE and both consumers
      (the dup aggregate and the attach join) read it back — without this
      the optimizer's inferred size()>0 filter under the Generate inlines
      the tokenize+hash chain ~17× into one Filter node and the whole
      tokenize+md5 pass re-runs per consumer branch (measured: the
      registered rewrite query 9.3 → 4.9 s before the posexplode-first
      move; the three changes together land it ~3.5 s)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    ck_base = checkpoint_base(spark, checkpoint_dir, "_substr_")

    def checkpoint_then_gate(dup: DataFrame) -> DataFrame:
        # per-invocation unique base (checkpoint_base above), so a shared
        # checkpoint_dir across runs cannot clobber files an earlier
        # returned frame still reads
        dup_path = os.path.join(ck_base, "dup")
        dup.write.mode("overwrite").parquet(dup_path)
        return _broadcast_if_small(spark.read.parquet(dup_path))

    w = F.col("w")
    n_win = F.greatest(F.size(w) - (SPAN_WORDS - 1), F.lit(0))
    base = docs.select("doc_id", "w", n_win.alias("n_win"))
    staged = docs.select(
        "doc_id",
        *[F.slice(w, k + 1, n_win).alias(f"_s{k}") for k in range(SPAN_WORDS)],
    )
    zipped = F.arrays_zip(*[f"_s{k}" for k in range(SPAN_WORDS)])
    occ = staged.select(
        "doc_id", F.posexplode(zipped).alias("pos", "s")
    ).select(
        "doc_id",
        "pos",
        F.unhex(
            F.md5(
                F.concat_ws(
                    " ", *[F.col("s").getField(f"_s{k}") for k in range(SPAN_WORDS)]
                )
            )
        ).alias("h"),
    )
    occ_path = os.path.join(ck_base, "occ")
    occ.write.mode("overwrite").parquet(occ_path)
    occ = spark.read.parquet(occ_path)
    return base, noncanonical_marked(occ, prepare=checkpoint_then_gate)


def noncanonical_marked(occ: DataFrame, prepare=lambda dup: dup) -> DataFrame:
    """The canonical-pick rule in ONE place (batch query and incremental
    index path both call it): from a (doc_id, pos, h) occurrence frame,
    the occurrences of every duplicated hash EXCEPT its (doc_id, pos)-min
    first occurrence. ``prepare`` wraps the duplicated-hash table before
    the attach join — checkpoint + size-gated broadcast for the corpus
    queries, plain broadcast for the (batch-sized) incremental path."""
    # occurrence identity is the (doc_id, pos) PAIR (dupkey-sweep pin): a
    # verbatim duplicate-key row re-emits the same occurrences, which must
    # neither make a unique window look duplicated (count_distinct, not
    # count) nor emit the same marked occurrence twice into the run-length
    # window (distinct on the duplication-rate-sized marked frame)
    dup = (
        occ.groupBy("h")
        .agg(
            F.count_distinct(F.struct("doc_id", "pos")).alias("cnt"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .filter(F.col("cnt") > 1)
        .select("h", "first")
    )
    return (
        occ.join(prepare(dup), "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
        .distinct()
    )


def rewrite_from_marked(
    base: DataFrame, marked: DataFrame, attach=None
) -> DataFrame:
    """The position-mask rewrite in ONE place: collect each doc's duplicated
    window starts as a sorted array, cut every covered word in-row, and
    reassemble. ``attach`` wraps the per-doc start frame before the left
    join (defaults to the size-gated broadcast)."""
    if attach is None:
        attach = _broadcast_if_small
    starts_df = marked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dup_starts")
    )
    joined = base.join(attach(starts_df), "doc_id", "left")
    w = F.col("w")
    starts = F.coalesce(F.col("dup_starts"), F.array().cast("array<int>"))
    kept = F.filter(
        w,
        lambda x, j: ~F.exists(
            starts, lambda s: (s <= j) & (s >= j - (SPAN_WORDS - 1))
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        (F.size(w) - F.size(kept)).cast("long").alias("n_words_dropped"),
    )


# Shared oracle CTEs: tokenize -> sliding windows -> duplicated non-canonical
# occurrences. The oracle picks canonicals with a ROW_NUMBER window; the
# Spark path uses the associative min-struct aggregate — identical semantics
# ((doc_id, pos) lexicographic first), different physical strategy.
_SUBSTR_CTES = f"""
        t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        base AS (
            SELECT doc_id, w,
                   CASE WHEN len(w) >= {SPAN_WORDS}
                        THEN len(w) - {SPAN_WORDS - 1} ELSE 0 END AS n_win
            FROM t
        ),
        occ AS (
            -- DISTINCT: occurrence identity is the (doc_id, pos) pair —
            -- a duplicate-key row must not make its own windows look
            -- duplicated (dupkey-sweep pin; mirrors the Spark side's
            -- count_distinct + distinct marked frame)
            SELECT DISTINCT doc_id, u.i AS pos,
                   md5(array_to_string(
                       list_slice(w, u.i + 1, u.i + {SPAN_WORDS}), ' ')) AS h
            FROM base,
                 UNNEST(CASE WHEN n_win > 0
                        THEN generate_series(0, n_win - 1)
                        ELSE [] END) AS u(i)
        ),
        ranked AS (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
                   COUNT(*) OVER (PARTITION BY h) AS cnt
            FROM occ
        ),
        marked AS (SELECT doc_id, pos FROM ranked WHERE cnt > 1 AND rn > 1)
"""


@register(
    "dedup_substring_spans",
    tags=("dedup", "text"),
    oracle=f"""
        WITH {_SUBSTR_CTES},
        isl AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS grp
            FROM marked
        ),
        runs AS (
            SELECT doc_id, COUNT(*) AS run_len
            FROM isl GROUP BY doc_id, grp
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(SUM(run_len) AS BIGINT) AS n_dup_windows,
                   CAST(MAX(run_len) + {SPAN_WORDS - 1} AS BIGINT)
                       AS longest_dup_span
            FROM runs GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(b.n_win AS BIGINT) AS n_windows,
               COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
               COALESCE(p.longest_dup_span, 0) AS longest_dup_span
        FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage REPORT: per document, how many of its sliding
    {SPAN_WORDS}-word windows are non-canonical re-occurrences, and the
    longest contiguous duplicated passage (in words — a run of r consecutive
    duplicated window starts covers r + SPAN_WORDS - 1 words). The
    measurement pass a pipeline runs before deciding the removal threshold.

    Scale shape: see _substring_base_and_marked for the single hash shuffle
    + broadcast attach; the run-length (gaps-and-islands) window partitions
    by doc_id over the MARKED rows only — a duplication-rate-sized frame,
    not the corpus — and each doc's partition is at most its window count.
    No global window anywhere."""
    base, marked = _substring_base_and_marked(spark, sf_dir)
    per_doc_win = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        marked.withColumn("grp", F.col("pos") - F.row_number().over(per_doc_win))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(
            F.sum("run_len").alias("n_dup_windows"),
            (F.max("run_len") + (SPAN_WORDS - 1)).alias("longest_dup_span"),
        )
    )
    return base.join(runs, "doc_id", "left").select(
        "doc_id",
        F.col("n_win").cast("long").alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce(F.col("longest_dup_span"), F.lit(0)).cast("long")
            .alias("longest_dup_span"),
    )


@register(
    "dedup_substring_rewrite",
    tags=("dedup", "text", "pipeline"),
    oracle=f"""
        WITH {_SUBSTR_CTES},
        dropped AS (
            SELECT DISTINCT doc_id, u.j AS j
            FROM marked,
                 UNNEST(generate_series(pos, pos + {SPAN_WORDS - 1})) AS u(j)
        ),
        allw AS (
            -- DISTINCT (dupkey-sweep pin): the per-doc agg below must see
            -- each word position once even when a duplicate-key row fans
            -- base out — the Spark side rewrites each physical row in-row,
            -- so every copy reports the same per-doc numbers
            SELECT DISTINCT doc_id, u.j AS j, w[u.j + 1] AS word
            FROM base,
                 UNNEST(CASE WHEN len(w) > 0
                        THEN generate_series(0, len(w) - 1)
                        ELSE [] END) AS u(j)
        ),
        keptw AS (
            SELECT a.doc_id, a.j, a.word
            FROM allw a ANTI JOIN dropped d
              ON a.doc_id = d.doc_id AND a.j = d.j
        ),
        agg AS (
            SELECT doc_id,
                   array_to_string(array_agg(word ORDER BY j), ' ') AS text_clean,
                   COUNT(*) AS n_kept
            FROM keptw GROUP BY doc_id
        )
        SELECT b.doc_id,
               COALESCE(a.text_clean, '') AS text_clean,
               CAST(len(b.w) - COALESCE(a.n_kept, 0) AS BIGINT)
                   AS n_words_dropped
        FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as a REWRITE: every word covered by a
    non-canonical duplicated window is cut; each document is reassembled
    from its surviving words. Overlapping and adjacent duplicated windows
    merge naturally (the drop set is a union of covered positions), so a
    long duplicated passage disappears as one span while its first
    occurrence survives verbatim — the corpus-level guarantee of
    suffix-array dedup at window resolution.

    Scale shape: the duplicated-window starts come back per-doc as ONE
    sorted int array (collect_list over the marked frame — bounded by the
    doc's own window count), and the keep/drop decision per word is an
    in-row two-arg filter (position j survives iff no duplicated start lies
    in [j - SPAN_WORDS + 1, j]) — the document text itself never shuffles;
    the oracle's exploded dropped-set anti-join is the relational twin of
    the same mask."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    return substring_rewrite_frame(spark, docs)


def substring_rewrite_frame(
    spark: SparkSession, docs: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """The rewrite over an arbitrary document frame — (doc_id, text) or
    pre-tokenized (doc_id, w) — shared by the registered query and
    ``curate_corpus``'s passage-rewrite stage."""
    if "w" not in docs.columns:
        docs = docs.select("doc_id", words("text").alias("w"))
    base, marked = _substring_marked_from_docs(spark, docs, checkpoint_dir)
    return rewrite_from_marked(base, marked)


@register(
    "split_leakage_free",
    tags=("pipeline", "sampling", "dedup", "graph"),
    oracle=_CC_ORACLE_CTES
    + """
        , labels AS (
            SELECT doc_id, MIN(label) AS component FROM reach GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(l.component, d.doc_id) AS split_key,
               CASE WHEN substr(md5(CAST(COALESCE(l.component, d.doc_id)
                                         AS VARCHAR)), 1, 1) < 'c'
                         THEN 'train'
                    WHEN substr(md5(CAST(COALESCE(l.component, d.doc_id)
                                         AS VARCHAR)), 1, 1) < 'e'
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM documents d LEFT JOIN labels l USING (doc_id)
    """,
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: documents are bucketed by the
    md5 prefix of their near-dup CLUSTER canonical (connected component over
    the MinHash-LSH pair graph), not their own id — so a document and its
    near-duplicates always land in the SAME split. This closes the leakage
    hole ``split_train_val_test`` leaves open: a per-doc hash split puts two
    near-identical documents in train and test with probability
    2·p·(1−p), silently inflating eval scores. Isolated documents fall back
    to their own id (identical buckets to the plain split).

    Scale shape: the CC label frame (docs in clusters — a vanishing
    fraction of the corpus) comes out of the checkpointed min-label loop
    and attaches via the size-gated broadcast left join; the split decision
    itself is a pure projection. Same 75/12.5/12.5 hex thresholds as
    split_train_val_test."""
    labels = connected_components_min_label(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    joined = docs.join(_broadcast_if_small(labels), "doc_id", "left")
    key = F.coalesce(F.col("component"), F.col("doc_id"))
    h = F.substring(F.md5(key.cast("string")), 1, 1)
    return joined.select(
        "doc_id",
        key.alias("split_key"),
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
            .alias("split"),
    )


SOURCE_CAP = 15  # max docs admitted per source/domain


@register(
    "curate_source_cap",
    tags=("curation", "window", "sample"),
    oracle=f"""
        SELECT doc_id, source, kept FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) <= {SOURCE_CAP} AS kept
            FROM documents
        )
    """,
)
def curate_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain admission cap: keep at most SOURCE_CAP documents per
    source, chosen by md5(doc_id) priority — the crawl-curation move that
    stops boilerplate-heavy domains from dominating the training mix while
    staying deterministic (no rand(), same verdict on re-run; the md5
    priority is an unbiased uniform draw within each source, the
    sample_documents_hash discipline).

    Scale shape: one hash exchange on source feeding one row_number
    window — per-source partitions only (a hot domain is exactly what the
    cap bounds the DOWNSTREAM of; the window itself sees the domain's rows,
    which is the irreducible read). Emitting a kept verdict per doc (not
    just survivors) keeps the operator composable as a broadcast anti-join
    verdict, the corpus-never-reshuffles pattern the dedup family uses."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return docs.select(
        "doc_id",
        "source",
        (F.row_number().over(w) <= SOURCE_CAP).alias("kept"),
    )


def _pretrain_oracle() -> str:
    """The whole admission pipeline as one CTE chain. The MinHash→CC
    fragment is reused VERBATIM from the dedup module with its corpus
    rebound to the stage-3 survivors (``FROM documents`` → ``FROM
    eligible`` — asserted single occurrence, so the rebind is total)."""
    from dblp_to_csv_spark.functions.text import SHINGLES_SQL
    from dblp_to_csv_spark.operators.pipeline import EVAL_MOD

    cc = _CC_ORACLE_CTES.replace("FROM documents", "FROM eligible")
    assert _CC_ORACLE_CTES.count("FROM documents") == 1
    cc_list = cc.strip()
    assert cc_list.startswith("WITH RECURSIVE")
    cc_list = cc_list[len("WITH RECURSIVE"):]
    shingles_of_words = SHINGLES_SQL.format(words="words")
    # docs_u: the report is KEYED — a verbatim duplicate-key row is the
    # same document and must not fan the doc_id-keyed stage joins
    # (dupkey-sweep pin; the Spark side applies the same entry distinct).
    # conf: keys that survive the distinct with >1 row carry CONFLICTING
    # payloads — an ingest-contract violation the report QUARANTINES as
    # its own stage instead of pretending a winner (ROADMAP 31).
    return f"""
        WITH RECURSIVE
        docs_a AS (SELECT DISTINCT * FROM documents),
        conf AS (
            SELECT doc_id FROM docs_a GROUP BY doc_id HAVING COUNT(*) > 1
        ),
        docs_u AS (
            SELECT * FROM docs_a WHERE doc_id NOT IN (SELECT doc_id FROM conf)
        ),
        base AS (SELECT doc_id, source, text, doc_id % {EVAL_MOD} = 0 AS is_eval
                 FROM docs_u),
        cap AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) <= {SOURCE_CAP} AS cap_ok
            FROM base WHERE NOT is_eval
        ),
        qt AS (SELECT doc_id, {_WORDS} AS w FROM docs_u),
        qm AS ({_gopher_m_sql("qt")}),
        q AS (SELECT doc_id, {_GOPHER_KEEP_PRED} AS q_ok FROM qm),
        exact AS (
            SELECT b.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY md5(b.text) ORDER BY b.doc_id) = 1
                       AS exact_keep
            FROM base b JOIN cap USING (doc_id) JOIN q USING (doc_id)
            WHERE NOT b.is_eval AND cap.cap_ok AND q.q_ok
        ),
        eligible AS (
            SELECT b.doc_id, b.text
            FROM base b JOIN exact USING (doc_id)
            WHERE exact.exact_keep
        ),
        {cc_list},
        labels AS (SELECT doc_id, MIN(label) AS label FROM reach GROUP BY doc_id),
        canon AS (SELECT label, MIN(doc_id) AS canonical FROM labels GROUP BY label),
        nd AS (SELECT l.doc_id, l.doc_id <> cn.canonical AS nd_fail
               FROM labels l JOIN canon cn USING (label)),
        dw AS (SELECT doc_id, {_WORDS} AS words FROM docs_u),
        dsh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest({shingles_of_words}) AS shingle FROM dw)
        ),
        ev AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % {EVAL_MOD} = 0),
        cont AS (
            SELECT DISTINCT s.doc_id FROM dsh s JOIN ev USING (shingle)
            WHERE s.doc_id % {EVAL_MOD} <> 0
        )
        SELECT b.doc_id,
               CASE WHEN b.is_eval THEN 'eval_holdout'
                    WHEN cap.cap_ok IS NOT TRUE THEN 'source_cap'
                    WHEN q.q_ok IS NOT TRUE THEN 'quality'
                    WHEN exact.exact_keep IS NOT TRUE THEN 'exact_dup'
                    WHEN COALESCE(nd.nd_fail, FALSE) THEN 'near_dup'
                    WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
                    ELSE 'kept' END AS stage
        FROM base b
        LEFT JOIN cap USING (doc_id)
        LEFT JOIN q USING (doc_id)
        LEFT JOIN exact USING (doc_id)
        LEFT JOIN nd USING (doc_id)
        LEFT JOIN cont USING (doc_id)
        UNION ALL
        SELECT doc_id, 'conflicting_key' AS stage FROM conf
    """


@register(
    "pretrain_corpus_report",
    tags=("curation", "composite", "pipeline", "dedup"),
    oracle=_pretrain_oracle(),
)
def pretrain_corpus_report(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """THE pipeline: every document's fate through the full pretraining
    admission chain, with the FIRST failing stage named —
    conflicting_key (ingest-contract violation: >1 distinct payload under
    one doc_id, quarantined rather than arbitrated; ROADMAP 31) →
    eval_holdout → source_cap → quality (Gopher rules) → exact_dup →
    near_dup (MinHash-LSH → connected components, keep-canonical) →
    contaminated (eval n-gram overlap) → kept. Sequential semantics where
    they matter: the per-source cap competes only non-eval docs, exact
    dedup elects canonicals only among cap+quality survivors, and the
    near-dup chain runs over exactly the stage-3 survivor corpus (a cluster
    whose canonical was quality-rejected elects a NEW canonical — the
    verdicts are not independent filters).

    Scale shape: the per-doc verdict stages are one window each (source,
    content-hash); the survivor set parquet-checkpoints ONCE and feeds the
    one MinHash→CC chain (the curate_corpus discipline — pairs checkpoint,
    CC rounds checkpoint); the near-dup verdict and contamination flags
    attach back as small-side joins (size-gated broadcast), so the corpus
    text never reshuffles after tokenization. This is the production
    entry point; the standalone stage queries stay registered for
    independent driver verification."""
    import os

    from dblp_to_csv_spark.operators.dedup import (
        connected_components_min_label,
        minhash_lsh_pairs,
    )
    from dblp_to_csv_spark.operators.pipeline import (
        EVAL_MOD,
        decontaminate_against_eval,
    )
    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, checkpoint_dir, "_pretrain_")
    # entry distinct (dupkey-sweep pin): the report is keyed by doc_id — a
    # verbatim duplicate-key row is the same document, and leaving it in
    # would fan every stage join below multiplicatively; the oracle's
    # docs_u CTE is the twin. Exact-duplicate TEXT under different ids
    # stays — that is the exact_dup stage's job, not ingestion's.
    # CONFLICTING keys (>1 distinct payload per doc_id — the CDC-ingest
    # contract violation, ROADMAP 31) quarantine into their own stage
    # instead of electing an arbitrary winner: the conflict set is
    # violation-rate-sized, so it broadcasts back as an anti-join and the
    # corpus never reshuffles to apply the verdict.
    docs_a = load_table(spark, sf_dir, "documents").distinct()
    conf = (
        docs_a.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("doc_id")
    )
    docs = docs_a.join(_broadcast_if_small(conf), "doc_id", "anti")
    # The contamination stage depends ONLY on ``docs`` — not on the
    # cap/quality/exact/near-dup chain — so its checkpoint write runs
    # CONCURRENTLY with that whole chain from a second driver thread (the
    # graph_report coreness ∥ triangle pattern, guide §2.6): the report
    # pays max(chain, contamination) instead of the sum. Each thread
    # writes its own parquet path; Spark actions are thread-safe.
    from concurrent.futures import ThreadPoolExecutor

    cont_path = os.path.join(base, "cont")

    def _write_cont() -> None:
        decontaminate_against_eval(spark, sf_dir, docs=docs).select(
            "doc_id", F.lit(True).alias("contaminated")
        ).write.mode("overwrite").parquet(cont_path)

    pool = ThreadPoolExecutor(max_workers=1)
    f_cont = pool.submit(_write_cont)
    is_eval = (F.col("doc_id") % EVAL_MOD) == 0
    cap_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    cap = docs.filter(~is_eval).select(
        "doc_id", (F.row_number().over(cap_w) <= SOURCE_CAP).alias("cap_ok")
    )
    q = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_ok")
    ).distinct()  # per-row verdicts are identical for verbatim copies
    # the per-doc verdict frame is consumed by BOTH the survivor filter and
    # the final report — checkpoint it once so the O(words²) Gopher scan
    # and the per-source window run once per invocation, not three times
    # (review r8 session 3; the curate_corpus pairs-checkpoint discipline)
    v_path = os.path.join(base, "verdict0")
    (
        docs.select("doc_id", is_eval.alias("is_eval"))
        .join(cap, "doc_id", "left")
        .join(q, "doc_id", "left")
        .write.mode("overwrite")
        .parquet(v_path)
    )
    verdict0 = spark.read.parquet(v_path)
    surv1 = docs.select("doc_id", "text").join(
        verdict0.filter(
            ~F.col("is_eval") & F.col("cap_ok") & F.col("q_ok")
        ).select("doc_id"),
        "doc_id",
    )
    ex_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ex_path = os.path.join(base, "exact")
    surv1.select(
        "doc_id", "text", (F.row_number().over(ex_w) == 1).alias("exact_keep")
    ).write.mode("overwrite").parquet(ex_path)
    exact = spark.read.parquet(ex_path)
    eligible = exact.filter("exact_keep").select("doc_id", "text")
    # the CC loop checkpoints the pair frame itself — writing it here too
    # was a redundant write+read job pair (r14 session 6)
    labels = connected_components_min_label(
        spark,
        sf_dir,
        checkpoint_dir=checkpoint_dir,
        pairs=minhash_lsh_pairs(spark, sf_dir, docs=eligible),
    )
    canon = labels.groupBy("component").agg(F.min("doc_id").alias("canonical"))
    nd = labels.join(canon, "component").select(
        "doc_id", (F.col("doc_id") != F.col("canonical")).alias("nd_fail")
    )
    # checkpoint before the size-gated broadcast: the gate's count() would
    # otherwise re-run the whole decontamination chain (semdedup precedent).
    # The write itself was submitted before the chain above — join it here.
    f_cont.result()
    pool.shutdown()
    cont = spark.read.parquet(cont_path)

    def not_true(c):
        return ~F.coalesce(F.col(c), F.lit(False))

    return (
        verdict0.join(exact.select("doc_id", "exact_keep"), "doc_id", "left")
        .join(_broadcast_if_small(nd), "doc_id", "left")
        .join(_broadcast_if_small(cont), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_eval"), "eval_holdout")
            .when(not_true("cap_ok"), "source_cap")
            .when(not_true("q_ok"), "quality")
            .when(not_true("exact_keep"), "exact_dup")
            .when(F.coalesce(F.col("nd_fail"), F.lit(False)), "near_dup")
            .when(F.col("contaminated").isNotNull(), "contaminated")
            .otherwise("kept")
            .alias("stage"),
        )
        .unionAll(
            conf.select("doc_id", F.lit("conflicting_key").alias("stage"))
        )
    )


# --- Pareto/skyline document selection -------------------------------------

SKYLINE_BUCKETS = 32  # phase-1 local-skyline partitions


@register(
    "skyline_documents",
    tags=("curation", "window", "selection"),
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len({_WORDS}) AS BIGINT) AS n_tokens,
                   ROUND(len(list_distinct({_WORDS})) * 1.0
                         / GREATEST(len({_WORDS}), 1), 6) AS distinct_ratio
            FROM documents
        )
        SELECT doc_id, n_tokens, distinct_ratio
        FROM m a
        WHERE NOT EXISTS (
            SELECT 1 FROM m b
            WHERE b.n_tokens >= a.n_tokens
              AND b.distinct_ratio >= a.distinct_ratio
              AND (b.n_tokens > a.n_tokens
                   OR b.distinct_ratio > a.distinct_ratio)
        )
    """,
)
def skyline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO-FRONTIER (skyline) document selection: the documents not
    dominated on (n_tokens ↑, distinct_token_ratio ↑) — multi-objective
    curation's primitive ("longest AND most lexically diverse", no scalar
    weighting needed; Börzsönyi et al. 2001). A document is dominated if
    another is ≥ on both axes and > on at least one; ties on both axes all
    survive.

    Scale shape — the two-phase distributed skyline: phase 1 computes a
    LOCAL skyline inside each of SKYLINE_BUCKETS hash buckets (skyline of
    a union == skyline of the union of local skylines, for ANY split — so
    the bucketing needs no semantic meaning, only determinism for the
    oracle), phase 2 sweeps the tiny survivor union with one value-range
    window: ordered by x, frame x' > x, a row survives iff its y beats the
    frame max STRICTLY and equals the max within its own x. The corpus
    touches one narrow projection + one bucket window; the quadratic NOT
    EXISTS exists only in the oracle (ground truth), never the plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = words("text")
    m = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(w)) * 1.0 / F.greatest(F.size(w), F.lit(1)),
            6,
        ).alias("distinct_ratio"),
    )
    return pareto_skyline_2d(m, "doc_id", "n_tokens", "distinct_ratio")


def pareto_skyline_2d(
    df: DataFrame, id_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Two-phase distributed 2-D skyline over (x_col ↑, y_col ↑): rows not
    dominated (another row ≥ on both and > on one). Phase 1 sweeps each of
    SKYLINE_BUCKETS md5(id) buckets locally; phase 2 sweeps the survivor
    union. Correct for ANY split (skyline(∪) = skyline(∪ of local
    skylines)); equivalence to the brute-force dominance check is
    property-tested on random point sets in tests/test_skyline.py.
    ``x_col`` must be integer-valued (the strict-dominance frame is
    rangeBetween(1, ∞))."""

    def sweep(d: DataFrame, bucket_col: str | None = None) -> DataFrame:
        part = [bucket_col] if bucket_col else []
        # x' > x frame: window ordered by x ASC, range (x+1, ∞)
        w_gt = (
            Window.partitionBy(*part)
            .orderBy(x_col)
            .rangeBetween(1, Window.unboundedFollowing)
        )
        w_eq = Window.partitionBy(*part, x_col)
        best_gt = F.max(y_col).over(w_gt)
        best_eq = F.max(y_col).over(w_eq)
        return d.withColumn("bgt", best_gt).withColumn("beq", best_eq).filter(
            (F.col("bgt").isNull() | (F.col(y_col) > F.col("bgt")))
            & (F.col(y_col) == F.col("beq"))
        ).drop("bgt", "beq")

    local = sweep(
        df.withColumn(
            "bucket",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                    16,
                    10,
                ).cast("long"),
                F.lit(SKYLINE_BUCKETS),
            ),
        ),
        "bucket",
    ).drop("bucket")
    return sweep(local).select(id_col, x_col, y_col)


# --------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Hashed-n-gram bag models of a TARGET distribution
# (here: the English slice, standing in for "looks like the eval domain")
# and the RAW corpus; each document scores log w = Σ_features
# (log p_target(bucket) - log p_raw(bucket)). Resampling then keeps docs
# with Gumbel-perturbed top-k log-weights — the deterministic md5 variant
# of that draw is exactly sample_weighted_priority's construction, so this
# operator reports the weights (the model), not a second sampler.
# --------------------------------------------------------------------------
DSIR_BUCKETS = 64
DSIR_SMOOTH = 0.5
_DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance_weights",
    tags=("curation", "lm", "selection"),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_WORDS} AS w FROM documents
        ),
        feats AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(f), 1, 8))::BIGINT % {DSIR_BUCKETS}
                       AS b
            FROM (
                SELECT doc_id, lang,
                       UNNEST(list_concat(
                           w, {BIGRAMS_SQL.format(words="w")})) AS f
                FROM t
            )
        ),
        buckets AS (
            SELECT b,
                   COUNT(*) AS r_cnt,
                   COUNT(*) FILTER (lang = '{_DSIR_TARGET_LANG}') AS t_cnt
            FROM feats GROUP BY b
        ),
        totals AS (
            SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM buckets
        )
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_feats,
               ROUND(SUM(
                   ln((t_cnt + {DSIR_SMOOTH})
                      / (t_tot + {DSIR_SMOOTH} * {DSIR_BUCKETS}))
                 - ln((r_cnt + {DSIR_SMOOTH})
                      / (r_tot + {DSIR_SMOOTH} * {DSIR_BUCKETS}))
               ), 6) AS log_weight
        FROM feats
        JOIN buckets USING (b)
        CROSS JOIN totals
        GROUP BY doc_id, lang
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights: hashed unigram+bigram features (md5 →
    64 buckets — engine-portable, same slice trick as SimHash), add-k
    bag-of-buckets models for the target (lang='en') and raw corpora,
    per-doc log w = Σ_f [log p_target(b(f)) − log p_raw(b(f))].

    One explode over the corpus builds the feature stream; BOTH models come
    from a single hash aggregate over it (conditional count for the target
    side — the target is a slice of the same scan, not a second pass); the
    64-row bucket model and the 1-row totals broadcast back onto the
    stream. At 100 TB: two corpus-keyed shuffles (bucket counts collapse
    map-side to ≤64 rows/partition; the final per-doc sum shuffles on
    doc_id), everything else broadcast. Positive log_weight → doc looks
    more target-like than corpus-like; feed into weighted sampling
    (sample_weighted_priority) for the resampling step."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", words("text").alias("w"))
    feats = t.select(
        "doc_id",
        "lang",
        F.explode(F.concat(F.col("w"), bigrams(F.col("w")))).alias("f"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    # The bucket model is ≤ DSIR_BUCKETS rows; localCheckpoint it eagerly
    # (the drift-family cells pattern) so the three consumers (totals, the
    # broadcast model, and through them the scoring join) do not each
    # re-run the corpus feature explode + bucket aggregate — the lazy plan
    # carried three Generates over the documents scan for one logical
    # feature stream (r14 optimization round, guide §2.4).
    buckets = (
        feats.groupBy("b")
        .agg(
            F.count("*").alias("r_cnt"),
            F.count(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)).alias("t_cnt"),
        )
        .localCheckpoint(eager=True)
    )
    totals = buckets.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    model = F.broadcast(buckets.crossJoin(F.broadcast(totals)))
    contrib = F.log(
        (F.col("t_cnt") + DSIR_SMOOTH)
        / (F.col("t_tot") + DSIR_SMOOTH * DSIR_BUCKETS)
    ) - F.log(
        (F.col("r_cnt") + DSIR_SMOOTH)
        / (F.col("r_tot") + DSIR_SMOOTH * DSIR_BUCKETS)
    )
    return (
        feats.join(model, "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(F.sum(contrib), 6).alias("log_weight"),
        )
    )


# Evaluation thresholds for the quality-score PR curve (inclusive >=)
QPR_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


@register(
    "quality_score_pr_curve",
    tags=("curation", "quality", "ml", "eval"),
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
        s AS (
            SELECT doc_id, ROUND({_QSCORE_SQL}, 6) AS score FROM t
        ),
        m AS ({_gopher_m_sql("t")}),
        lab AS (SELECT doc_id, {_GOPHER_KEEP_PRED} AS label FROM m),
        j AS (SELECT score, label FROM s JOIN lab USING (doc_id)),
        g AS (
            SELECT th,
                   CAST(SUM(CASE WHEN score >= th AND label
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN score >= th AND NOT label
                            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN score < th AND label
                            THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM unnest([{", ".join(str(t) for t in QPR_THRESHOLDS)}]) AS u(th)
                 LEFT JOIN j ON TRUE  -- empty corpus still yields 9 rows
            GROUP BY th
        )
        SELECT th AS threshold, tp, fp, fn,
               CASE WHEN tp + fp > 0 THEN
                   {ROUND_TIES_DOWN_SQL.format(expr="tp * 1.0 / (tp + fp)", scale=6)}
               END AS precision,
               CASE WHEN tp + fn > 0 THEN
                   {ROUND_TIES_DOWN_SQL.format(expr="tp * 1.0 / (tp + fn)", scale=6)}
               END AS recall
        FROM g
    """.format(stops=_STOP_LIST),
)
def quality_score_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-calibration report for the quality scorer: precision and
    recall of `quality_linear_score` at nine thresholds against the Gopher
    rule battery's keep verdict as the (weak) reference label — the eval a
    pipeline runs before picking a quality-filter cutoff.

    Scale shape: score and label fuse into one corpus scan each (both are
    in-row expressions), one doc_id equi-join, then ONE conditional
    aggregate computes all 27 counters (9 thresholds x tp/fp/fn) in a
    single pass — no row multiplication, no per-threshold jobs; the stack
    to report rows runs on the 1-row result. Precision/recall are
    small-integer ratios, so they round through the tie-down convention
    (functions/rounding.py) on both engines."""
    scored = quality_linear_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    labels = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("label")
    )
    j = scored.join(labels, "doc_id")
    aggs = []
    for i, t in enumerate(QPR_THRESHOLDS):
        pred = F.col("quality_score") >= F.lit(float(t))
        lab = F.col("label")
        aggs += [
            # coalesce: sums over an EMPTY corpus are NULL, the oracle's
            # threshold-anchored LEFT JOIN counts 0 — emit 0 on both
            F.coalesce(F.sum((pred & lab).cast("long")), F.lit(0)).alias(
                f"tp_{i}"
            ),
            F.coalesce(F.sum((pred & ~lab).cast("long")), F.lit(0)).alias(
                f"fp_{i}"
            ),
            F.coalesce(F.sum((~pred & lab).cast("long")), F.lit(0)).alias(
                f"fn_{i}"
            ),
        ]
    one = j.agg(*aggs)
    stack_args = ", ".join(
        f"cast({t} as double), tp_{i}, fp_{i}, fn_{i}"
        for i, t in enumerate(QPR_THRESHOLDS)
    )
    rows = one.select(
        F.expr(
            f"stack({len(QPR_THRESHOLDS)}, {stack_args}) "
            "as (threshold, tp, fp, fn)"
        )
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        round_ties_down(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        round_ties_down(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6),
    )
    return rows.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        precision.alias("precision"),
        recall.alias("recall"),
    )


# --- Gopher repetition battery (r14) ----------------------------------------

REP_TOP2_MAX = 0.05  # most-common 2-gram ≤ 5% of 2-gram occurrences
REP_TOP3_MAX = 0.04  # most-common 3-gram ≤ 4% of 3-gram occurrences
REP_DUP2_MAX = 0.15  # ≤ 15% of 2-gram occurrences are repeats

_G2 = (
    f"CASE WHEN len({_WORDS}) >= 2 THEN "
    f"list_transform(generate_series(1, len({_WORDS})-1), "
    f"i -> {_WORDS}[i] || ' ' || {_WORDS}[i+1]) "
    "ELSE [] END"
)
_G3 = (
    f"CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(generate_series(1, len({_WORDS})-2), "
    f"i -> {_WORDS}[i] || ' ' || {_WORDS}[i+1] || ' ' || {_WORDS}[i+2]) "
    "ELSE [] END"
)


@register(
    "quality_repetition_rules",
    tags=("curation", "quality"),
    oracle=f"""
        WITH g AS (
            SELECT doc_id, {_G2} AS g2, {_G3} AS g3 FROM documents
        ),
        m AS (
            SELECT doc_id,
                {ROUND_TIES_DOWN_SQL.format(
                    expr="COALESCE(list_max(list_transform(list_distinct(g2),"
                    " x -> len(list_filter(g2, y -> y = x)))), 0) * 1.0"
                    " / GREATEST(len(g2), 1)",
                    scale=6,
                )} AS top2_frac,
                {ROUND_TIES_DOWN_SQL.format(
                    expr="COALESCE(list_max(list_transform(list_distinct(g3),"
                    " x -> len(list_filter(g3, y -> y = x)))), 0) * 1.0"
                    " / GREATEST(len(g3), 1)",
                    scale=6,
                )} AS dup3_top_frac,
                {ROUND_TIES_DOWN_SQL.format(
                    expr="(len(g2) - len(list_distinct(g2))) * 1.0"
                    " / GREATEST(len(g2), 1)",
                    scale=6,
                )} AS dup2_frac
            FROM g
        )
        SELECT doc_id, top2_frac, dup3_top_frac, dup2_frac,
               (top2_frac <= {REP_TOP2_MAX}
                AND dup3_top_frac <= {REP_TOP3_MAX}
                AND dup2_frac <= {REP_DUP2_MAX}) AS keep
        FROM m
    """,
)
def quality_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPETITION half of the Gopher rule battery (Rae et al. 2021,
    §A1.1): most-common-2-gram fraction, most-common-3-gram fraction, and
    duplicate-2-gram occurrence fraction → a keep verdict. The existing
    quality_gopher_rules tests the word DISTRIBUTION; this one catches
    looping generators and boilerplate stuffing, which dominate-word tests
    miss when the repeated unit is a phrase rather than a word.

    Same plan shape as quality_gopher_rules: all three metrics are array
    expressions over one staged tokenization — a single narrow projection,
    no shuffle, still cheaper at 100 TB than explode + groupBy + window,
    which would shuffle every n-gram occurrence. The top-n-gram count is
    the MAX RUN LENGTH of the SORTED n-gram array (r14 optimization
    round): array_sort + one O(m) aggregate fold replaces the original
    O(distinct × m) array_distinct × filter scan — provably the same
    number (equal elements are adjacent exactly once after sorting;
    asserted value-equal on the full sf0.1 corpus, measured 3.24 → 1.26 s
    interleaved best-of-3). Ratios round tie-safe (round_ties_down) since
    small-integer fractions can land exactly on half boundaries."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    g = docs.select(
        "doc_id",
        bigrams(F.col("w")).alias("g2"),
        shingles(F.col("w"), 3).alias("g3"),
    )

    def top_frac(col):
        s = F.array_sort(col)
        acc0 = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )
        nrun = lambda acc, x: (  # noqa: E731
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        )
        folded = F.aggregate(
            s,
            acc0,
            lambda acc, x: F.struct(
                x.alias("prev"),
                nrun(acc, x).alias("run"),
                F.greatest(acc["best"], nrun(acc, x)).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        return round_ties_down(
            folded * 1.0 / F.greatest(F.size(col), F.lit(1)), 6
        )

    m = g.select(
        "doc_id",
        top_frac(F.col("g2")).alias("top2_frac"),
        top_frac(F.col("g3")).alias("dup3_top_frac"),
        round_ties_down(
            (F.size("g2") - F.size(F.array_distinct("g2")))
            * 1.0
            / F.greatest(F.size("g2"), F.lit(1)),
            6,
        ).alias("dup2_frac"),
    )
    return m.select(
        "*",
        (
            (F.col("top2_frac") <= REP_TOP2_MAX)
            & (F.col("dup3_top_frac") <= REP_TOP3_MAX)
            & (F.col("dup2_frac") <= REP_DUP2_MAX)
        ).alias("keep"),
    )
