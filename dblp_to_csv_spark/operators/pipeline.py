"""Training-data pipeline composition (SURVEY.md §2.4): the stages a corpus
pipeline chains BETWEEN the individual operators — deterministic sampling,
train/val/test splitting, and the composed keep/drop gate (quality × language
× dedup) — each oracle-checked.

Scale notes (100 TB):
* Sampling and splitting are HASH-based, never rand(): deterministic across
  runs/engines/retries (a re-run of a failed task must sample the same rows —
  rand() breaks exactly-once semantics), cheap (one md5 per row, no shuffle),
  and consistent (a doc keeps its split forever as the corpus grows — the
  property that prevents train/test leakage across dataset versions).
* The composed gate is one projection + one window — predicates fuse into a
  single pass over the scan; the dedup-canonical check shuffles once on the
  content fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.text import (
    SHINGLES_SQL,
    STOPWORDS,
    WORDS_SQL,
    shingles,
    words,
)
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

_WORDS = WORDS_SQL.format(col="text")
_SHINGLES = SHINGLES_SQL.format(words="words")
_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# hex-prefix thresholds: md5 first char < '2' → 2/16 = 12.5% sample;
# split by first char: 0-b train (75%), c-d val (12.5%), e-f test (12.5%)
SAMPLE_HEX_LT = "2"


@register(
    "sample_documents_hash",
    tags=("pipeline", "sampling"),
    oracle=f"""
        SELECT doc_id, length(text) AS n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{SAMPLE_HEX_LT}'
    """,
)
def sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample: keep rows whose md5(doc_id) hex prefix is
    below a threshold — the consistent-sampling idiom (same rows selected on
    every run, every engine, every retry; rate tunes by threshold). This is
    what replaces `rand() < p` in a pipeline that must be reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < SAMPLE_HEX_LT
    ).select("doc_id", F.length("text").cast("long").alias("n_chars"))


@register(
    "split_train_val_test",
    tags=("pipeline", "sampling"),
    oracle="""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed train/val/test assignment (75/12.5/12.5 by md5 hex
    prefix): a document's split is a pure function of its id, so it can
    never migrate between splits as the corpus grows or the job re-runs —
    the leakage-prevention property random splits lack."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.select(
        "doc_id",
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test").alias("split"),
    )


@register(
    "pipeline_c4_keep",
    bench=True,
    tags=("pipeline", "text", "dedup"),
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
        m AS (
            SELECT doc_id, text,
                   len(w) AS n_tokens,
                   len(list_filter(w, x -> list_contains([{_STOP_LIST}], x)))
                       * 1.0 / GREATEST(len(w), 1) AS stop_ratio,
                   length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                       * 1.0 / GREATEST(length(text), 1) AS punct_ratio,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens
        FROM m
        WHERE n_tokens >= 20
          AND punct_ratio < 0.1
          AND stop_ratio >= 0.05
          AND doc_id = canonical_id
    """,
)
def pipeline_c4_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style keep gate — quality (length + punctuation) ×
    language (stopword-ratio) × exact-dedup canonical — as ONE query: the
    scalar predicates fuse into a single projection over the scan; the
    dedup-canonical check is a min-over-fingerprint window (one shuffle on
    md5(text), the same 32-byte key dedup_exact_documents groups on). This
    is the end-to-end corpus filter, not a demo of one operator."""
    # fan-out-gated scan (guide §2.5): the single-row-group corpus parquet
    # would otherwise tokenize + regex-scan every document in one task; the
    # only cross-row operation is a MIN-over-md5 window (string/int — exact).
    docs = fan_out_small(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", "text", words("text").alias("w"))
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
    canonical = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    return (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            stop_ratio.alias("stop_ratio"),
            punct_ratio.alias("punct_ratio"),
            canonical.alias("canonical_id"),
        )
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("punct_ratio") < 0.1)
            & (F.col("stop_ratio") >= 0.05)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "n_tokens")
    )


# every 10th doc_id stands in for the held-out benchmark set
EVAL_MOD = 10
PACK_BUDGET = 2048  # tokens per training context window


def _exploded_shingles(
    df: DataFrame, with_doc_id: bool, distinct_in_doc: bool = False
) -> DataFrame:
    """words → shingles as STAGED projections. Load-bearing: HOF-built
    arrays get no common-subexpression elimination, so the inline
    ``shingles(words(text))`` form re-runs the tokenizer for every array
    reference inside the shingle builder (SCALE.md §5; measured ~2× on
    decontamination at sf0.1 — the same trap the MinHash path documents)."""
    cols = ["doc_id"] if with_doc_id else []
    staged = df.select(*cols, words("text").alias("w"))
    sh = shingles(F.col("w"))
    if distinct_in_doc:
        sh = F.array_distinct(sh)
    return staged.select(*cols, F.explode(sh).alias("shingle"))


@register(
    "decontaminate_against_eval",
    tags=("pipeline", "dedup", "join"),
    oracle=f"""
        WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM w)
        ),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0)
        SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    """,
)
def decontaminate_against_eval(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    at least one word shingle with the held-out eval set (here: every
    ``EVAL_MOD``-th doc_id stands in for the benchmark), reporting how many
    distinct shingles overlap — the n-gram-overlap test run before training
    so eval questions never leak into the corpus (production uses 8-13-gram
    windows; the shared 3-gram helper keeps the oracle in lock-step).

    Scale shape: the eval set is tiny relative to the corpus (benchmarks are
    thousands of docs against billions), so its distinct-shingle set is
    BROADCAST and the contamination check is a map-side hash join over the
    exploded training shingles — the 100 TB side is NEVER shuffled wholesale
    (deduplication of its shingles happens as count-DISTINCT per doc AFTER
    the join, over matched rows only, a vanishing fraction of the corpus).

    ``docs`` lets a composite pass a pre-filtered corpus (the pretrain
    report's conflict-quarantined frame) instead of re-loading the raw
    table."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    tr = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0), with_doc_id=True
    )
    ev = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0), with_doc_id=False
    ).distinct()
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


BLOOM_MIN_BITS = 1 << 16
BLOOM_MAX_BITS = 1 << 24  # 16 Mbit = 2 MB of broadcast at most
BLOOM_HASHES = 5


def _bloom_bits(n_items: int) -> int:
    """Power-of-two filter size ≈ 16 bits/item (fp ≈ 0.1% at k=5), clamped.
    Sizing only affects the prefilter's selectivity, never the result — the
    exact verify-join removes every false positive."""
    return min(BLOOM_MAX_BITS, max(BLOOM_MIN_BITS, 1 << (16 * n_items).bit_length()))


def _bloom_hit_sql(bloom_bits: int) -> str:
    """SQL predicate: all BLOOM_HASHES bit positions of `shingle` are set in
    the broadcast `bloom` array (32 bits per BIGINT word, so no sign
    headaches). Pure JVM expressions — no join, no Python — evaluated inside
    whole-stage codegen for every corpus shingle."""
    checks = []
    for i in range(BLOOM_HASHES):
        p = f"pmod(xxhash64({i}, shingle), {bloom_bits})"
        checks.append(
            f"(shiftright(element_at(bloom, CAST(shiftright({p}, 5) AS INT) + 1),"
            f" CAST(({p} % 32) AS INT)) & 1) = 1"
        )
    return " AND ".join(checks)


@register(
    "decontaminate_bloom",
    tags=("pipeline", "dedup", "sketch"),
    oracle=f"""
        WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM w)
        ),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0)
        SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a BLOOM-FILTER prefilter — the runtime-filter
    twin of `decontaminate_against_eval`, same exact result (Bloom filters
    have no false negatives; the false positives are discarded by the exact
    verification join that follows), so the same SQL oracle hash-checks it.

    Spark shape: the eval set's distinct shingles are folded into a
    65,536-bit Bloom filter (5 × xxhash64 positions; built driver-side from
    a BOUNDED collect — the distinct set-bit positions, capped at
    BLOOM_BITS rows, ~16 KB as 32-bits-per-word BIGINTs) and broadcast as a
    one-row frame. Every corpus shingle probes the filter with pure codegen
    bit arithmetic — zero shuffle, zero Python — and only the surviving
    sliver reaches the exact broadcast semi-join + per-doc aggregate.

    Why it matters at 100 TB: the eval shingle SET can be tens of millions
    of strings (too big to broadcast-hash cheaply), but its Bloom image is
    kilobytes at any practical size (scale BLOOM_BITS with the set). The
    corpus-side explode never leaves the scan stage for the ~99% of
    shingles the filter rejects — this is Spark's own InjectRuntimeFilter
    bloom pattern, made explicit because the eval side arrives as data, not
    as a join Spark can infer the filter from."""
    docs = load_table(spark, sf_dir, "documents")
    ev = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0), with_doc_id=False
    ).distinct()
    # size the filter to the eval set (~16 bits/item): an under-sized bloom
    # saturates and degrades to "prefilter passes everything" — still exact,
    # all cost, no pruning. The item count is a column-pruned UPPER BOUND on
    # distinct shingles: one shingle per word start, words average ≥6 chars
    # incl. the separator in English-like text, so Σ n_chars / 4 over-counts
    # by ~1.5x (ADVICE r7: the previous /10 could UNDERSHOOT ~2x and run the
    # filter at ~8 bits/item). Sizing stays a metadata-cheap aggregate, not
    # a tokenize pass; oversizing only lowers the fp rate. Eval-side
    # tokenization then runs exactly twice (bit-fold build + verify-join
    # build), same as the broadcast-set twin plus one.
    # The sizing aggregate rides the SAME job as the word fold (r14
    # session 6): the 1-row Σ n_chars frame broadcasts into the position
    # explode and ``_bloom_bits`` is replicated in SQL —
    # length(bin(x)) = x.bit_length() for x ≥ 1, with the shift exponent
    # clamped at 25 so shiftleft never wraps sign (beyond 25 the outer
    # least() picks BLOOM_MAX_BITS anyway) — so sizing + build is ONE
    # action instead of two sequential jobs. The collected rows carry the
    # bits value back for the probe expression and the word-array length.
    sized = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .agg(F.coalesce(F.sum("n_chars"), F.lit(0)).alias("n_est"))
        .selectExpr(
            f"least(CAST({BLOOM_MAX_BITS} AS BIGINT), "
            f"greatest(CAST({BLOOM_MIN_BITS} AS BIGINT), "
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(least(length(bin(16 * (n_est div 4 + 1))), 25) AS INT))"
            ")) AS bits"
        )
    )
    # fold positions into 32-bit words JVM-side (bit_or partial aggregate):
    # the driver collects ≤ bits/32 words, never the raw position stream
    word_rows = (
        ev.crossJoin(F.broadcast(sized))
        .select(
            F.explode(
                F.array(
                    *[
                        F.expr(f"pmod(xxhash64({i}, shingle), bits)")
                        for i in range(BLOOM_HASHES)
                    ]
                )
            ).alias("p"),
            "bits",
        )
        .groupBy(F.shiftright("p", 5).alias("widx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))"
            ).alias("w"),
            F.first("bits").alias("bits"),
        )
        .collect()
    )
    # empty eval shingle set → no rows → the old n_est=0 sizing (MIN bits)
    bloom_bits = int(word_rows[0]["bits"]) if word_rows else BLOOM_MIN_BITS
    bloom_words = [0] * (bloom_bits // 32)
    for r in word_rows:
        bloom_words[r["widx"]] = r["w"]
    bloom = spark.createDataFrame([(bloom_words,)], "bloom array<bigint>")
    tr = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0), with_doc_id=True
    )
    return (
        tr.crossJoin(F.broadcast(bloom))
        .filter(F.expr(_bloom_hit_sql(bloom_bits)))
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


# per-language keep thresholds on the md5 hex prefix: en is over-represented
# in the synthetic corpus, so it samples at 2/16 while the rest keep 8/16
LANG_HEX_LT = {"en": "2"}
DEFAULT_HEX_LT = "8"


@register(
    "sample_stratified_by_lang",
    tags=("pipeline", "sampling"),
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              < CASE WHEN lang = 'en' THEN '{LANG_HEX_LT["en"]}'
                     ELSE '{DEFAULT_HEX_LT}' END
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates (rebalance
    an English-heavy crawl without touching low-resource languages) applied
    through the same md5-prefix idiom as ``sample_documents_hash`` — so the
    kept set is stable across runs/engines AND across rate changes in other
    strata. One narrow projection + filter, no shuffle; the rate table is a
    CASE expression, not a join."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    threshold = F.when(
        F.col("lang") == "en", LANG_HEX_LT["en"]
    ).otherwise(DEFAULT_HEX_LT)
    return docs.filter(h < threshold).select("doc_id", "lang")


def assign_pack_chunks(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Concat-then-chunk packing policy over any (doc_id, text) frame:
    hash-bucket, order by doc_id, running-token prefix sum per bucket, and
    assign each document the ``budget``-token context window its first
    token lands in. Shared by the registered query and pipeline
    compositions (tests/test_pipeline_end_to_end.py) so the policy cannot
    fork."""
    t = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.size(words("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("chunk_id"),
    )


@register(
    "pack_concat_chunks",
    tags=("pipeline", "window"),
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
                   CAST(len({_WORDS}) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, bucket, n_tokens,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {PACK_BUDGET}) AS BIGINT) AS chunk_id
        FROM t
    """,
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-then-chunk style: documents are concatenated
    in a deterministic order and cut into fixed ``PACK_BUDGET``-token
    context windows; each document is assigned the chunk its first token
    lands in. This is the GPT-style packing that wastes no tokens (documents
    may straddle a boundary), as opposed to bin-packing which never splits.

    Scale shape: documents are hash-bucketed (16-way md5 prefix) so the
    running-token-offset window runs per bucket — independent partitions,
    no global sort, no single-reducer window. Each bucket is one shuffle
    partition's worth of ordered prefix-sum; at 100 TB you raise the bucket
    count, not the algorithm."""
    return assign_pack_chunks(load_table(spark, sf_dir, "documents"))


@register(
    "pack_sequences_greedy",
    tags=("pipeline", "udf"),
    # no oracle by declared design: next-fit is a running accumulation WITH
    # RESET — not expressible as a window function; parity vs a pure-Python
    # reference is pinned in tests/test_packing.py instead
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, bin-packing style: documents are packed whole into
    ``PACK_BUDGET``-token bins by deterministic next-fit (per hash bucket,
    in doc_id order: open a new bin whenever the next document would
    overflow the current one). The no-split alternative to
    ``pack_concat_chunks`` — no document straddles a context boundary, at
    the cost of padding waste; a doc longer than the budget gets a bin of
    its own.

    Spark shape: the per-bin state machine is inherently sequential, so it
    runs as ``applyInPandas`` over hash buckets — each bucket is one Arrow
    batch packed in one pass, buckets in parallel; the only shuffle is the
    groupBy on the bucket key. At 100 TB you raise the bucket count so each
    stays executor-sized; global bin ids are (bucket, pack_id) pairs, never
    a sequential counter across the corpus."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.size(words("text")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fill, current = [], 0, 0
        for t_ in pdf["n_tokens"]:
            if fill > 0 and fill + t_ > PACK_BUDGET:
                current += 1
                fill = 0
            fill += t_
            pack_ids.append(current)
        pdf["pack_id"] = pack_ids
        return pdf

    return t.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket string, n_tokens long, pack_id long"
    )


@register(
    "ngram_novelty_vs_reference",
    tags=("pipeline", "text", "join"),
    oracle=f"""
        WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM w)
        ),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0)
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(ev.shingle) AS BIGINT) AS n_shared,
               ROUND(1.0 - COUNT(ev.shingle) * 1.0 / COUNT(*), 6) AS novelty
        FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle
        WHERE s.doc_id % {EVAL_MOD} <> 0
        GROUP BY s.doc_id
    """,
)
def ngram_novelty_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring: for every training document, the fraction of
    its DISTINCT word shingles absent from the reference set (the held-out
    eval split, as in ``decontaminate_against_eval``) — the scoring twin of
    decontamination: instead of flagging contaminated docs, every doc gets a
    [0,1] novelty used for weighting/curriculum (novelty 1.0 = fully new
    text, near 0 = mostly memorized/boilerplate n-grams).

    Scale shape: identical to decontamination — the reference shingle set is
    tiny and BROADCAST; the corpus's shingles stream through a map-side left
    join (membership probe) and collapse in one per-doc aggregate; the
    rounded ratio keeps both engines' division on the same 6-dp grid."""
    docs = load_table(spark, sf_dir, "documents")
    tr = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0),
        with_doc_id=True,
        distinct_in_doc=True,
    )
    ev = (
        _exploded_shingles(
            docs.filter(F.col("doc_id") % EVAL_MOD == 0), with_doc_id=False
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # count_distinct, not count: the oracle's `SELECT DISTINCT doc_id,
    # shingle` spans ROWS — a duplicate-key doc contributes its shingles
    # once, where per-row counts would double them (dupkey-sweep pin); the
    # distinct collapses inside the one per-doc aggregate, the corpus-side
    # join stays map-side broadcast
    n_sh = F.count_distinct("shingle")
    n_hit = F.count_distinct(F.when(F.col("hit") == 1, F.col("shingle")))
    return (
        tr.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            n_sh.alias("n_shingles"),
            n_hit.alias("n_shared"),
            F.round(1.0 - n_hit * 1.0 / n_sh, 6).alias("novelty"),
        )
    )


def observed_keep_gate(spark: SparkSession, sf_dir: str):
    """The C4-style keep gate with PIPELINE METRICS riding the same job
    (``df.observe``): rows scanned, rows kept, and total kept tokens are
    accumulated by the executors during the one pass the query already
    makes — no second count job, no extra scan. This is how a 100 TB
    curation run reports its funnel (input → kept, token yield) for free;
    at scale the same Observations feed a QueryExecutionListener instead of
    a blocking ``.get``.

    Returns (DataFrame, Observation): run the frame through any action,
    then read ``observation.get`` for
    {"rows_seen": ..., "rows_kept": ..., "tokens_kept": ...}."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", words("text").alias("w")
    )
    n_tokens = F.size(F.col("w"))
    keep = (n_tokens >= 20) & (
        F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
        * 1.0
        / F.greatest(F.length("text"), F.lit(1))
        < 0.1
    )
    obs = Observation("keep_gate")
    observed = docs.withColumn("keep", keep).observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count(F.when(F.col("keep"), 1)).alias("rows_kept"),
        F.sum(F.when(F.col("keep"), n_tokens).otherwise(0)).alias("tokens_kept"),
    )
    return (
        observed.filter(F.col("keep")).select("doc_id", n_tokens.alias("n_tokens")),
        obs,
    )


WEIGHTED_SAMPLE_K = 100  # docs selected by the weighted priority sample
_U32 = 4294967296.0  # 2^32, the md5-prefix uniform's denominator


@register(
    "sample_weighted_priority",
    tags=("pipeline", "sampling"),
    oracle=f"""
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               ROUND(
                   -ln((('0x' || substr(md5('w|' || CAST(doc_id AS VARCHAR)),
                                        1, 8))::BIGINT + 0.5) / {_U32})
                   / GREATEST(n_chars, 1), 9) AS priority
        FROM documents
        ORDER BY priority, doc_id
        LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    exponential-key form): each document draws a deterministic uniform
    u = (md5-prefix + 0.5)/2^32 and gets priority -ln(u)/weight (weight =
    n_chars: longer documents are proportionally likelier); the global
    WEIGHTED_SAMPLE_K smallest priorities ARE a weighted sample without
    replacement — the distributed reservoir: no sequential scan, no state,
    any K, retry-stable.

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps a K-row heap and the driver merges heaps, so the corpus
    is never globally sorted and the shuffle moves K rows per partition.
    The priority is rounded to 9 dp (both engines' ln differ by ≤1 ulp;
    rounding puts them on the same grid — the lang_temperature_resample
    discipline) and ties at the selection boundary break by doc_id
    identically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        aes_priority_frame(docs)
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )


def aes_priority_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_chars, priority) with the deterministic A-ES
    priority — shared by the registered query above and the incremental
    reservoir (operators/incremental.py::reservoir_sample_append), whose
    sequential==batch contract needs the identical expression."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / _U32
    priority = F.round(
        -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 9
    )
    return docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        priority.alias("priority"),
    )


@register(
    "eval_contamination_report",
    tags=("pipeline", "dedup", "join"),
    oracle=f"""
        WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM w)
        ),
        ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
        tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
        matched AS (SELECT DISTINCT e.shingle FROM ev e JOIN tr USING (shingle))
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(m.shingle) AS BIGINT) AS n_contaminated,
               ROUND(COUNT(m.shingle) * 1.0 / COUNT(*), 6)
                   AS contamination_frac
        FROM ev e LEFT JOIN matched m ON m.shingle = e.shingle
        GROUP BY e.doc_id
    """,
)
def eval_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVAL-side view of decontamination: per benchmark item (the
    ``EVAL_MOD`` stand-in set), what fraction of its distinct shingles
    occurs anywhere in the training corpus — the severity report that
    decides whether to drop the eval item (hopelessly leaked) or just the
    matching training docs (``decontaminate_against_eval``'s output).
    Benchmark cards report exactly this number.

    Scale shape: the ROLES of decontamination invert but the broadcast
    direction does not — the eval shingle set is still the small side, so
    it broadcasts and the corpus-sized training shingle stream semi-joins
    against it map-side; only MATCHED shingles (≤ eval set size) survive
    to the distinct + the per-item coverage join. The corpus never
    shuffles; eval docs too short to shingle produce no rows (their
    contamination is undefined, not zero)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD == 0),
        with_doc_id=True,
        distinct_in_doc=True,
    )
    tr = _exploded_shingles(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0), with_doc_id=False
    )
    matched = (
        tr.join(F.broadcast(ev.select("shingle").distinct()), "shingle", "left_semi")
        .distinct()
        .withColumnRenamed("shingle", "m_shingle")
    )
    j = ev.join(
        F.broadcast(matched), ev["shingle"] == matched["m_shingle"], "left"
    )
    # count_distinct (dupkey-sweep pin): the oracle's DISTINCT (doc_id,
    # shingle) spans rows, so a duplicate-key eval doc contributes its
    # shingles once — per-row counts would double both sides of the ratio
    hit = F.count_distinct("m_shingle")
    n_sh = F.count_distinct("shingle")
    return j.groupBy("doc_id").agg(
        n_sh.cast("long").alias("n_shingles"),
        hit.cast("long").alias("n_contaminated"),
        F.round(hit * 1.0 / n_sh, 6).alias("contamination_frac"),
    )


CHUNK_TOKENS = 32  # overlapping-chunk width (tokens)
CHUNK_STRIDE = 24  # stride between chunk starts (25% overlap)


# Shared chunk-fan-out CTE: `chunks(doc_id, chunk_idx, cw, n_tokens)` with
# cw the chunk's token LIST — consumed by the chunker oracle (serialized to
# chunk_text) and by the chunk-granular BM25 oracle (tf over cw).
_CHUNKS_SQL = f"""
        t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        b AS (
            SELECT doc_id, w,
                   CASE WHEN len(w) = 0 THEN 0
                        WHEN len(w) <= {CHUNK_TOKENS} THEN 1
                        ELSE CAST(CEIL((len(w) - {CHUNK_TOKENS})
                                       * 1.0 / {CHUNK_STRIDE}) AS INT) + 1
                   END AS n_chunks
            FROM t
        ),
        chunks AS (
            SELECT doc_id, u.i AS chunk_idx,
                   list_slice(w, u.i * {CHUNK_STRIDE} + 1,
                              u.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS cw,
                   CAST(LEAST({CHUNK_TOKENS},
                              len(w) - u.i * {CHUNK_STRIDE}) AS BIGINT)
                       AS n_tokens
            FROM b, UNNEST(CASE WHEN n_chunks > 0
                           THEN generate_series(0, n_chunks - 1)
                           ELSE [] END) AS u(i)
        )
"""


def chunk_token_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk fan-out as a TOKEN-ARRAY frame (doc_id, chunk_idx, cw,
    n_tokens) — the Spark twin of the `chunks` CTE in _CHUNKS_SQL. Shared
    by the serializing chunker below and the chunk-granular BM25 retrieval
    (review r8 session 4: rag_retrieve_chunks previously re-split the
    space-joined chunk_text, paying a join+regex per row and silently
    depending on tokens never containing spaces)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    w = F.col("w")
    n = F.size(w)
    n_chunks = (
        F.when(n == 0, F.lit(0))
        .when(n <= CHUNK_TOKENS, F.lit(1))
        .otherwise(
            F.ceil((n - CHUNK_TOKENS) * 1.0 / CHUNK_STRIDE).cast("int") + 1
        )
    )
    staged = docs.select("doc_id", "w", n_chunks.alias("n_chunks"))
    idxs = F.when(
        F.col("n_chunks") > 0, F.sequence(F.lit(0), F.col("n_chunks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return staged.select(
        "doc_id", "w", F.explode(idxs).alias("chunk_idx")
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(w, F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS).alias(
            "cw"
        ),
        F.least(
            F.lit(CHUNK_TOKENS), F.size(w) - F.col("chunk_idx") * CHUNK_STRIDE
        ).cast("long").alias("n_tokens"),
    )


@register(
    "chunk_documents_overlapping",
    tags=("pipeline", "text"),
    oracle=f"""
        WITH {_CHUNKS_SQL}
        SELECT doc_id, chunk_idx,
               array_to_string(cw, ' ') AS chunk_text, n_tokens
        FROM chunks
    """,
)
def chunk_documents_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-stride document chunking — the retrieval/context-prep
    twin of sequence packing: each document becomes ceil((n−size)/stride)+1
    chunks of CHUNK_TOKENS tokens starting every CHUNK_STRIDE (25%
    overlap), so no boundary sentence is ever lost to a hard cut. The
    standard RAG-ingest shape (chunk → embed → index); `pack_concat_chunks`
    is the training-shape sibling (non-overlapping, budget-packed).

    Scale shape: pure in-row fan-out — chunk starts come from a sequence
    over the doc's own token array and each chunk re-slices that array, so
    the operator fuses into the scan with no shuffle at all (plan-gated);
    output size is the retrieval-index size by design (~n/stride chunks
    per doc). The final chunk is the natural short tail; a document
    shorter than one chunk yields exactly itself."""
    return chunk_token_frame(spark, sf_dir).select(
        "doc_id",
        "chunk_idx",
        F.array_join("cw", " ").alias("chunk_text"),
        "n_tokens",
    )


# --- Deterministic training order (epoch shuffle + shard assignment) -------

EPOCH_COUNT = 2
EPOCH_SHARDS = 8


@register(
    "training_epoch_order",
    tags=("pipeline", "sampling", "window"),
    oracle=f"""
        WITH ep AS (
            SELECT d.doc_id, e.epoch,
                   md5(CAST(e.epoch AS VARCHAR) || ':'
                       || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
            FROM documents d,
                 UNNEST(generate_series(0, {EPOCH_COUNT - 1})) AS e(epoch)
        )
        SELECT CAST(epoch AS BIGINT) AS epoch,
               ('0x' || substr(shuffle_key, 1, 4))::BIGINT
                   % {EPOCH_SHARDS} AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY epoch,
                       ('0x' || substr(shuffle_key, 1, 4))::BIGINT
                           % {EPOCH_SHARDS}
                   ORDER BY shuffle_key, doc_id
               ) AS shard_pos,
               doc_id
        FROM ep
    """,
)
def training_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-EPOCH training order: every document gets, for each
    epoch, a shard (hash of an epoch-salted md5 key — different epochs
    permute differently, which is the point of epoch reshuffling) and a
    position within that shard (ordered by the same key). Reproducible
    training runs need exactly this: a seed-free, engine-independent
    permutation a re-run or a resumed job regenerates bit-identically —
    rand() cannot (task retries re-draw), and a global sort per epoch would
    serialize the corpus.

    Scale shape: the shuffle key and shard are in-row md5 expressions; the
    only exchange is the per-(epoch, shard) window — EPOCH_SHARDS
    independent sorts of corpus/EPOCH_SHARDS rows each, exactly the layout
    a sharded training-data writer wants (one output file per shard, rows
    pre-ordered). Only ids move; document payloads join back by doc_id at
    write time (or never move, if the writer emits id manifests)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ep = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(e) for e in range(EPOCH_COUNT)])
        ).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(":", F.col("epoch"), F.col("doc_id"))
        ).alias("shuffle_key"),
    )
    shard = (
        F.conv(F.substring("shuffle_key", 1, 4), 16, 10).cast("long")
        % EPOCH_SHARDS
    )
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return (
        ep.withColumn("shard", shard)
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "shard",
            F.row_number().over(w).cast("long").alias("shard_pos"),
            "doc_id",
        )
    )


# --- Span-corruption example construction (T5-style denoising) -------------

SPAN_MASK_HEX_LT = "2"  # md5(doc:pos) first hex < '2' → ~12.5% token mask rate


@register(
    "augment_span_corrupt",
    tags=("pipeline", "augmentation", "scalar"),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {WORDS_SQL.format(col="text")} AS w FROM documents
        ),
        m AS (
            SELECT doc_id, w,
                   list_transform(range(1, len(w) + 1),
                       i -> substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(i AS VARCHAR)), 1, 1)
                            < '{SPAN_MASK_HEX_LT}') AS msk
            FROM t
        ),
        r AS (
            SELECT doc_id, w, msk,
                   list_filter(range(1, len(w) + 1),
                       i -> msk[i] AND (i = 1 OR NOT msk[i - 1])) AS starts
            FROM m
        )
        SELECT doc_id,
               COALESCE(array_to_string(
                   list_filter(
                       list_transform(range(1, len(w) + 1),
                           i -> CASE
                               WHEN NOT msk[i] THEN w[i]
                               WHEN COALESCE(list_position(starts, i), 0) > 0
                               THEN '<extra_id_'
                                    || CAST(list_position(starts, i) AS VARCHAR)
                                    || '>'
                               ELSE NULL END),
                       x -> x IS NOT NULL), ' '), '') AS input_text,
               COALESCE(array_to_string(
                   flatten(list_transform(starts, s ->
                       list_prepend(
                           '<extra_id_'
                           || CAST(list_position(starts, s) AS VARCHAR) || '>',
                           w[s:COALESCE(list_min(list_filter(
                                   range(1, len(w) + 1),
                                   p -> p > s AND NOT msk[p])),
                               len(w) + 1) - 1]))), ' '), '') AS target_text,
               CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_masked,
               CAST(len(starts) AS BIGINT) AS n_spans
        FROM r
    """,
)
def augment_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION example construction (the T5 denoising objective,
    Raffel et al. 2020 §3.1.4) built entirely in the engine: ~12.5% of
    tokens mask deterministically (md5(doc_id:pos) — reproducible across
    runs/retries/engines, the same exactly-once argument as the samplers),
    adjacent masked tokens coalesce into spans, the input keeps one
    '<extra_id_k>' sentinel per span, and the target is the concatenation
    of each sentinel plus its dropped tokens — (input_text, target_text)
    pairs ready for a seq2seq trainer, plus mask accounting.

    Scale shape: pure in-row array expressions over the tokenized
    projection (mask vector → run starts → two rebuilds); no shuffle, no
    UDF, no explode — the whole construction runs at scan speed and
    composes with pack_concat_chunks / training_epoch_order for the full
    examples-to-shards pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", words("text").alias("w"))
    n = F.size("w")
    # empty-token guard: sequence(1, 0) yields the DESCENDING [1, 0] (the
    # char-entropy bug class) and element_at(msk, 0) then aborts the query
    # with INVALID_INDEX_OF_ZERO — a doc with no [a-z0-9] chars must yield
    # an empty example row, matching the oracle's empty range(1, 1)
    pos = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    mask_at = lambda i: F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id"), i.cast("string"))), 1, 1
    ) < SPAN_MASK_HEX_LT
    m = t.select(
        "doc_id", "w", F.transform(pos, mask_at).alias("msk")
    )
    msk = lambda i: F.element_at(F.col("msk"), i)
    r = m.select(
        "doc_id",
        "w",
        "msk",
        F.filter(
            pos,
            lambda i: msk(i) & ((i == 1) | ~msk(i - 1)),
        ).alias("starts"),
    )
    sentinel = lambda i: F.concat(
        F.lit("<extra_id_"),
        F.array_position(F.col("starts"), i).cast("string"),
        F.lit(">"),
    )
    input_text = F.array_join(
        F.filter(
            F.transform(
                pos,
                lambda i: F.when(~msk(i), F.element_at(F.col("w"), i)).when(
                    F.array_position(F.col("starts"), i) > 0, sentinel(i)
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    span_end = lambda s: F.coalesce(
        F.array_min(
            F.filter(
                pos,
                lambda p: (p > s) & ~msk(p),
            )
        ),
        F.size("w") + 1,
    )
    target_text = F.array_join(
        F.flatten(
            F.transform(
                F.col("starts"),
                lambda s: F.concat(
                    F.array(sentinel(s)),
                    F.slice(F.col("w"), s, span_end(s) - s),
                ),
            )
        ),
        " ",
    )
    return r.select(
        "doc_id",
        input_text.alias("input_text"),
        target_text.alias("target_text"),
        F.size(F.filter(F.col("msk"), lambda x: x)).cast("long").alias("n_masked"),
        F.size("starts").cast("long").alias("n_spans"),
    )


# --- Contrastive pair mining (embedding-trainer dataset construction) ------

NEG_PER_ANCHOR = 3
NEG_POOL_HEX_LT = "4"  # md5(doc_id) first hex < '4' → 25% negative pool


def _contrastive_oracle() -> str:
    from dblp_to_csv_spark.operators.dedup import _CC_ORACLE_CTES

    return f"""
        {_CC_ORACLE_CTES},
        positives AS (
            SELECT p.doc_a AS anchor_id, p.doc_b AS other_id,
                   CAST(1 AS BIGINT) AS label, j.jaccard AS pair_score
            FROM pairs p JOIN jac j USING (doc_a, doc_b)
        ),
        anchors AS (SELECT DISTINCT doc_a AS anchor_id FROM pairs),
        pool AS (
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  < '{NEG_POOL_HEX_LT}'
        ),
        partners AS (
            SELECT doc_a AS a, doc_b AS o FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        negcand AS (
            SELECT an.anchor_id, p.doc_id AS other_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY an.anchor_id
                       ORDER BY md5(CAST(an.anchor_id AS VARCHAR) || ':'
                                    || CAST(p.doc_id AS VARCHAR)), p.doc_id
                   ) AS rn
            FROM anchors an CROSS JOIN pool p
            WHERE p.doc_id <> an.anchor_id
              AND NOT EXISTS (SELECT 1 FROM partners pa
                              WHERE pa.a = an.anchor_id
                                AND pa.o = p.doc_id)
        )
        SELECT anchor_id, other_id, label, pair_score FROM positives
        UNION ALL
        SELECT anchor_id, other_id, CAST(0 AS BIGINT),
               CAST(NULL AS DOUBLE)
        FROM negcand WHERE rn <= {NEG_PER_ANCHOR}
    """




@register(
    "contrastive_pairs_dataset",
    tags=("pipeline", "dedup", "ml"),
    oracle=_contrastive_oracle(),
)
def contrastive_pairs_dataset(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """CONTRASTIVE-PAIR dataset construction for embedding finetuning:
    positives are the verified MinHash near-dup pairs (label 1, with their
    exact Jaccard as pair_score); negatives are NEG_PER_ANCHOR
    deterministically-drawn documents per anchor (label 0) from a 25%
    md5-sampled pool, excluding the anchor itself and any of its near-dup
    partners — the mined-positives + random-negatives recipe (SimCSE/E5
    shape) run entirely in the engine, reproducible across runs and
    retries because every draw is an md5 rank.

    Scale shape: the positive side IS the dedup scale path (banded
    signatures, checkpointed candidates, verify on candidates only —
    checkpointed once here, consumed three times); the anchor set is
    bounded by the duplicate population (broadcast), the negative pool is
    a hash-sampled narrow projection of the corpus, and the per-anchor
    cut is a WindowGroupLimit top-k, so negatives cost anchors × pool/16
    candidate rows — never corpus²."""
    import os

    from dblp_to_csv_spark.operators.dedup import minhash_lsh_pairs
    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, checkpoint_dir, "_contrast_")
    pairs_path = os.path.join(base, "pairs")
    minhash_lsh_pairs(spark, sf_dir).write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    positives = pairs.select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("other_id"),
        F.lit(1).cast("long").alias("label"),
        F.col("jaccard").alias("pair_score"),
    )
    anchors = pairs.select(F.col("doc_a").alias("anchor_id")).distinct()
    pool = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < NEG_POOL_HEX_LT
        )
    )
    partners = pairs.select(
        F.col("doc_a").alias("p_a"), F.col("doc_b").alias("p_o")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("p_a"), F.col("doc_a").alias("p_o"))
    )
    cand = (
        pool.crossJoin(F.broadcast(anchors))
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .join(
            partners,
            (F.col("anchor_id") == F.col("p_a"))
            & (F.col("doc_id") == F.col("p_o")),
            "left_anti",
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(F.concat_ws(":", F.col("anchor_id"), F.col("doc_id"))), "doc_id"
    )
    negatives = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NEG_PER_ANCHOR)
        .select(
            "anchor_id",
            F.col("doc_id").alias("other_id"),
            F.lit(0).cast("long").alias("label"),
            F.lit(None).cast("double").alias("pair_score"),
        )
    )
    return positives.unionAll(negatives)


# --- Chunk-granular retrieval (the RAG unit) -------------------------------

RAG_TOP = 20


def _rag_oracle() -> str:
    from dblp_to_csv_spark.operators.text_analysis import (
        BM25_TERMS,
        _bm25_sql_parts,
    )

    _, score, matched = _bm25_sql_parts()
    tf_cols = ", ".join(
        f"len(list_filter(cw, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    return f"""
        WITH {_CHUNKS_SQL},
        tf AS (
            SELECT doc_id, chunk_idx, n_tokens AS dl, {tf_cols} FROM chunks
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl, {df_cols}
            FROM tf
        )
        SELECT doc_id, chunk_idx,
               ROUND({score}, 6) + 0.0 AS bm25,
               CAST({matched} AS BIGINT) AS n_terms_matched
        FROM tf, stats
        ORDER BY ROUND({score}, 6) DESC, doc_id, chunk_idx
        LIMIT {RAG_TOP}
    """


@register(
    "rag_retrieve_chunks",
    tags=("pipeline", "text", "search"),
    oracle=_rag_oracle(),
)
def rag_retrieve_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-granular retrieval — the actual RAG unit (retrieve passages,
    not documents): BM25 over the overlapping-chunk table, with the corpus
    statistics (N, avgdl, df) computed at CHUNK granularity, top-RAG_TOP
    chunks returned with their parent doc_id. Composes the chunker with
    the shared BM25 scorer (`bm25_score_frame`) — the same definitionally-
    shared lexical arm as search_bm25 and the hybrid RRF.

    Scale shape: the chunk fan-out is in-row (no shuffle), per-chunk tf is
    an in-row array filter, chunk-corpus stats are ONE broadcast row, and
    the cut is TakeOrderedAndProject on the rounded score with
    (doc_id, chunk_idx) tie-break — identical plan family to search_bm25,
    at ~n/stride × the row count."""
    from dblp_to_csv_spark.operators.text_analysis import (
        bm25_score_frame,
        term_tf_columns,
    )

    chunks = chunk_token_frame(spark, sf_dir)
    tf = chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("n_tokens").alias("dl"),
        *term_tf_columns("cw"),
    )
    return (
        bm25_score_frame(tf, ["doc_id", "chunk_idx"])
        .orderBy(F.desc("bm25"), "doc_id", "chunk_idx")
        .limit(RAG_TOP)
    )


# --------------------------------------------------------------------------
# Skip-gram training-pair construction with word2vec frequency subsampling.
# --------------------------------------------------------------------------
SKIPGRAM_WINDOW = 2
SUBSAMPLE_T = 0.001


@register(
    "skipgram_pairs_subsampled",
    tags=("text", "training", "join"),
    oracle=f"""
        WITH d AS (SELECT doc_id, {{words}} AS ws FROM documents),
        tok0 AS (
            SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS pos
            FROM d
        ),
        tok AS (SELECT doc_id, pos, ws[pos] AS word FROM tok0),
        freq AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
        total AS (SELECT COUNT(*) AS total FROM tok),
        kept AS (
            SELECT doc_id, pos, word,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS idx
            FROM tok JOIN freq USING (word), total
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                       || CAST(pos AS VARCHAR) || ':' || word), 1, 8))::BIGINT
                   / 4294967296.0
                 < SQRT(CAST({SUBSAMPLE_T} AS DOUBLE) * total.total / freq.cnt)
        ),
        offs AS (SELECT UNNEST([{", ".join(str(i) for i in range(1, SKIPGRAM_WINDOW + 1))}]) AS d),
        adj AS (
            SELECT a.word AS w_a, b.word AS w_b
            FROM kept a
            CROSS JOIN offs o
            JOIN kept b ON b.doc_id = a.doc_id AND b.idx = a.idx + o.d
        ),
        pairs AS (
            SELECT w_a AS center, w_b AS context FROM adj
            UNION ALL
            SELECT w_b AS center, w_a AS context FROM adj
        )
        SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY center, context
    """.format(words=_WORDS),
)
def skipgram_pairs_subsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) training-pair counts with word2vec
    frequency subsampling (Mikolov et al. 2013): each token occurrence
    survives with P = sqrt(t / f(w)) under a DETERMINISTIC md5 draw keyed on
    (doc, position, word) — identical across engines, runs, and task
    retries, the exactly-once property rand() cannot give. Survivors are
    re-indexed per document (the compaction that widens effective context
    past dropped stopwords — the word2vec behavior) and paired with
    neighbors at offsets 1..SKIPGRAM_WINDOW=2 in BOTH directions, then
    collapsed to the (center, context, n) co-occurrence table that SGNS and
    GloVe consume.

    At 100 TB: the frequency table is the corpus vocabulary — broadcast
    onto the token stream; the corpus total comes from SUMMING the
    vocabulary table (no second corpus pass); the neighbor join is an
    EQUI-join on (doc, idx+d) against a 2-row broadcast offset frame — the
    ACF shifted-join shape, never a per-document quadratic window; pair
    counts collapse map-side to ≤|vocab|² rows. The subsampled survivor
    stream feeds BOTH sides of the neighbor join, so it is
    parquet-checkpointed once: two corpus scans total (vocab build, pair
    build) regardless of window size."""
    from dblp_to_csv_spark.session import session_checkpoint_dir

    # fan-out-gated scan (guide §2.5): counts + md5 draws + integer
    # neighbor equi-join — order-exact.
    docs = fan_out_small(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    freq = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("pos").cast("string"),
                        "word",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    kept = (
        tok.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .filter(
            u < F.sqrt(F.lit(SUBSAMPLE_T) * F.col("total") / F.col("cnt"))
        )
        .select(
            "doc_id",
            "word",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("pos"))
            .alias("idx"),
        )
    )
    kept_dir = session_checkpoint_dir("_sg_kept_")
    kept.write.mode("overwrite").parquet(kept_dir)
    kept = spark.read.parquet(kept_dir)
    offs = spark.range(1, SKIPGRAM_WINDOW + 1).select(F.col("id").alias("d"))
    shifted = kept.crossJoin(F.broadcast(offs)).select(
        "doc_id",
        (F.col("idx") + F.col("d")).alias("idx"),
        F.col("word").alias("w_a"),
    )
    adj = shifted.join(
        kept.select("doc_id", "idx", F.col("word").alias("w_b")),
        ["doc_id", "idx"],
    )
    pairs = adj.select(
        F.col("w_a").alias("center"), F.col("w_b").alias("context")
    ).unionAll(
        adj.select(F.col("w_b").alias("center"), F.col("w_a").alias("context"))
    )
    return pairs.groupBy("center", "context").agg(
        F.count("*").alias("n_pairs")
    )


# --------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment — Thaler & Ravishankar
# 1998, the consistent-placement idiom behind distributed object stores and
# shard routers. Each key goes to argmax over nodes of h(key, node); when a
# node leaves, ONLY its keys move (minimal disruption), unlike mod-N where
# (N-1)/N of all keys reshuffle. For a growing 100 TB corpus this is how
# shard placement stays stable across capacity changes: assignment is an
# in-row argmax over an N-sized literal array — one narrow projection, no
# join, no shuffle until the final N-row aggregate.
# --------------------------------------------------------------------------
RENDEZVOUS_NODES = [f"node-{i}" for i in range(8)]


def rendezvous_pick(key: Column, nodes: list[str]) -> Column:
    """argmax_n md5(key ':' n) as an in-row array_max over
    struct(hash, node) — lexicographic struct comparison picks the max
    hash (ties, probability ~2^-128, break toward the max node name;
    the oracle mirrors with ORDER BY hv DESC, node DESC)."""
    return F.array_max(
        F.array(
            *[
                F.struct(
                    F.md5(F.concat(key.cast("string"), F.lit(":" + n))).alias(
                        "hv"
                    ),
                    F.lit(n).alias("node"),
                )
                for n in nodes
            ]
        )
    )["node"]


@register(
    "shard_rendezvous_assign",
    tags=("pipeline", "sharding", "scalar"),
    oracle=f"""
        WITH nodes AS (
            SELECT unnest([{", ".join(repr(n) for n in RENDEZVOUS_NODES)}])
                AS node
        ),
        -- windows partition by a physical ROW id, not doc_id: the Spark
        -- assignment is an in-row expression, so every physical row — a
        -- duplicate key included — counts toward its shard (dupkey-sweep
        -- pin; a doc_id partition would collapse the copies)
        d AS (
            SELECT doc_id, ROW_NUMBER() OVER () AS rid FROM documents
        ),
        h AS (
            SELECT d.rid, n.node,
                   md5(CAST(d.doc_id AS VARCHAR) || ':' || n.node) AS hv
            FROM d CROSS JOIN nodes n
        ),
        a8 AS (
            SELECT rid, node FROM (
                SELECT rid, node,
                       ROW_NUMBER() OVER (PARTITION BY rid
                                          ORDER BY hv DESC, node DESC) AS rn
                FROM h
            ) WHERE rn = 1
        ),
        a7 AS (
            SELECT rid, node FROM (
                SELECT rid, node,
                       ROW_NUMBER() OVER (PARTITION BY rid
                                          ORDER BY hv DESC, node DESC) AS rn
                FROM h WHERE node != '{RENDEZVOUS_NODES[-1]}'
            ) WHERE rn = 1
        )
        SELECT a8.node,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN a7.node != a8.node THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_on_drain
        FROM a8 JOIN a7 USING (rid)
        GROUP BY a8.node
    """,
)
def shard_rendezvous_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard placement over the document corpus, with the
    minimal-disruption property REPORTED AS DATA: per shard node, how many
    docs it owns under the full 8-node ring and how many of those would
    move if the last node drained (re-running the argmax over the
    surviving 7). Rendezvous guarantees moves happen ONLY off the drained
    node — pinned in tests — versus mod-N hashing where a capacity change
    reshuffles (N-1)/N of the corpus.

    Scale shape: both assignments are in-row expressions over a literal
    node array (the window in the oracle is DuckDB's argmax spelling, not
    a plan requirement); the only shuffle is the final 8-row aggregate.
    The md5 ranking is the engine-portable determinism idiom the sampling
    family already uses."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.col("doc_id")
    assigned = docs.select(
        "doc_id",
        rendezvous_pick(key, RENDEZVOUS_NODES).alias("node"),
        rendezvous_pick(key, RENDEZVOUS_NODES[:-1]).alias("node_drained"),
    )
    return assigned.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("node_drained") != F.col("node"), 1).otherwise(0)
        ).alias("n_moved_on_drain"),
    )


LENGTH_BUCKETS = 8  # equi-token-mass bucket count for batch shaping


@register(
    "pack_length_buckets",
    tags=("pipeline", "window"),
    oracle=f"""
        WITH t AS (
            -- COALESCE: a NULL length would form its own group AND sort
            -- differently between the engines (Spark NULLS FIRST, DuckDB
            -- NULLS LAST in the cumulative window) — define NULL as 0
            SELECT doc_id, COALESCE(n_chars, 0) AS n_chars,
                   CAST(len({_WORDS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        per_len AS (
            SELECT n_chars, CAST(SUM(n_tokens) AS BIGINT) AS tok,
                   COUNT(*) AS n_docs
            FROM t GROUP BY n_chars
        ),
        cum AS (
            SELECT n_chars, tok, n_docs,
                   CAST(COALESCE(SUM(tok) OVER (
                       ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before,
                   CAST(SUM(tok) OVER () AS BIGINT) AS total
            FROM per_len
        ),
        lb AS (
            SELECT n_chars, tok, n_docs,
                   CAST(LEAST(cum_before * {LENGTH_BUCKETS} // GREATEST(total, 1),
                              {LENGTH_BUCKETS} - 1) AS INT) AS bucket
            FROM cum
        )
        SELECT bucket,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS tok_sum,
               CAST(MIN(n_chars) AS INT) AS min_len,
               CAST(MAX(n_chars) AS INT) AS max_len
        FROM lb GROUP BY bucket
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-token-mass length bucketing for batch shaping: documents are
    split into LENGTH_BUCKETS buckets ordered by length (n_chars) such that
    each bucket carries ~the same total token mass — the standard dynamic-
    batching prep that minimizes padding waste when batches are drawn
    per-bucket. bucket(len) = floor(cum_tokens_before(len) * B / total),
    computed entirely in integers so both engines agree bit-for-bit; all
    docs of one length land in one bucket (deterministic, join-free to
    apply downstream via a broadcast length→bucket map).

    Scale shape: one (n_chars) groupBy over the corpus (map-side
    combinable), then the cumulative window runs on the DISTINCT-LENGTH
    frame — |distinct lengths|-sized (bounded by max document length, not
    corpus rows), the documented metadata-sized-window idiom (same as the
    coreness degree-h-index frame). The corpus itself never sorts."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        F.size(words("text")).cast("long").alias("n_tokens"),
    )
    per_len = t.groupBy("n_chars").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n_docs")
    )
    # |distinct lengths| rows: unpartitioned windows are metadata-sized
    # here — and the TOTAL rides the same frame as a second window instead
    # of a crossJoin against a re-aggregation of the lazy per_len (which
    # would re-scan the corpus; plan-gated)
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per_len.select(
        "n_chars",
        "tok",
        "n_docs",
        F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("cum_before"),
        F.sum("tok").over(Window.partitionBy()).alias("total"),
    )
    lb = cum.select(
        "n_chars",
        "tok",
        "n_docs",
        # `div`, not `/`+floor: double division can round a boundary
        # quotient up once the token mass exceeds double precision — the
        # oracle's `//` is exact integer division, so ours must be too
        F.least(
            F.expr(
                f"(cum_before * {LENGTH_BUCKETS}) div greatest(total, 1L)"
            ),
            F.lit(LENGTH_BUCKETS - 1).cast("long"),
        )
        .cast("int")
        .alias("bucket"),
    )
    return lb.groupBy("bucket").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("tok_sum"),
        F.min("n_chars").cast("int").alias("min_len"),
        F.max("n_chars").cast("int").alias("max_len"),
    )


# --------------------------------------------------------------------------
# Dataset version diff: the snapshot-comparison every training-data release
# runs ("what changed between corpus v1 and v2?") — classify every key as
# added / removed / changed / unchanged by fingerprint comparison, never by
# comparing payload bytes across the join. v2 is derived from v1 by a
# deterministic md5 rule (drop / edit / add) so the diff is verifiable
# end-to-end on both engines; swap in a real second snapshot path in
# production.
# --------------------------------------------------------------------------
_VDIFF_MOD = 17  # md5(doc_id) % MOD selects the simulated delta classes
_VDIFF_SEL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 17)"


@register(
    "dataset_version_diff",
    tags=("pipeline", "cdc", "join"),
    oracle=f"""
        WITH v1 AS (
            SELECT doc_id, md5(COALESCE(text, '')) AS fp FROM documents
        ),
        v2 AS (
            SELECT doc_id,
                   CASE WHEN {_VDIFF_SEL} = 1
                        THEN md5(COALESCE(text, '') || ' [edited]')
                        ELSE md5(COALESCE(text, '')) END AS fp
            FROM documents WHERE {_VDIFF_SEL} <> 0
            UNION ALL
            SELECT -doc_id - 1,
                   md5('new document ' || CAST(doc_id AS VARCHAR))
            FROM documents WHERE {_VDIFF_SEL} = 2
        ),
        j AS (
            SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN v1.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        WHEN v1.fp <> v2.fp THEN 'changed'
                        ELSE 'unchanged' END AS change_class
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT change_class, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM j GROUP BY change_class
    """,
)
def dataset_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions: every doc_id classified
    added / removed / changed / unchanged, where 'changed' is detected by
    md5 FINGERPRINT inequality — document text never crosses the join, so
    the shuffle carries (key, 32-byte hash) rows regardless of document
    size. The release-gate report a corpus publisher attaches to every
    version bump (and the input to incremental re-processing: only
    added+changed keys re-enter the pipeline).

    v2 here is a deterministic md5-derived delta of v1 (≈1/17 of keys
    dropped, 1/17 edited, 1/17 added under shifted ids) so both engines
    materialize the identical pair of snapshots; a production caller
    replaces v2 with its real second snapshot path.

    Scale shape: two fingerprint projections (scan-fused md5, no text
    movement) → ONE full-outer equi-join on the key → a 4-row conditional
    aggregate with map-side combine. The join co-partitions both sides on
    doc_id; at 100 TB this is the canonical CDC-diff plan, and bucketed
    snapshot layouts (plans/bucketing.py) make it exchange-free."""
    docs = load_table(spark, sf_dir, "documents")
    sel = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _VDIFF_MOD
    )
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    v1 = docs.select("doc_id", fp.alias("fp"))
    v2 = (
        docs.filter(sel != 0)
        .select(
            "doc_id",
            F.when(
                sel == 1,
                F.md5(F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" [edited]"))),
            )
            .otherwise(fp)
            .alias("fp"),
        )
        .unionAll(
            docs.filter(sel == 2).select(
                # synthetic 'added' ids live in the negative range — disjoint
                # from any non-negative real key BY CONSTRUCTION (a +1e9
                # shift would collide once real ids reach 1e9; ADVICE r11)
                (-F.col("doc_id") - 1).alias("doc_id"),
                F.md5(
                    F.concat(F.lit("new document "), F.col("doc_id").cast("string"))
                ).alias("fp"),
            )
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change_class"))
        .groupBy("change_class")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
