"""Text-analysis operators over the documents table (SURVEY.md §2.4):
token counting, quality scoring, language-ID heuristic, fingerprinting.
All pure Column expressions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import round_ties_down
from dblp_to_csv_spark.functions.text import (
    BIGRAMS_SQL,
    FINGERPRINT_SQL,
    SHINGLES_SQL,
    STOPWORDS,
    WORDS_SQL,
    bigrams,
    fingerprint,
    shingles,
    words,
)
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

_WORDS = WORDS_SQL.format(col="text")
_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "text_token_stats",
    tags=("text", "scalar"),
    oracle=f"""
        WITH t AS (SELECT doc_id, n_chars, {_WORDS} AS w FROM documents)
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               n_chars,
               ROUND((len(list_filter(w, x -> len(x) >= 5)) * 1.0
                      / GREATEST(len(w), 1)) - 5e-13, 6) + 0.0
                   AS long_token_ratio,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens
        FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace/punct-split token count, distinct count,
    share of long tokens — the per-document statistics a data-quality filter
    keys on. Single narrow projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize once in its own projection (one split, many consumers)
    t = docs.select("doc_id", "n_chars", words("text").alias("w"))
    w = F.col("w")
    return t.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        "n_chars",
        round_ties_down(
            F.size(F.filter(w, lambda x: F.length(x) >= 5))
            * 1.0
            / F.greatest(F.size(w), F.lit(1)),
            6,
        ).alias("long_token_ratio"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
    )


@register(
    "text_quality_score",
    tags=("text", "scalar"),
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
        m AS (
            SELECT doc_id,
                   len(w) AS n_tokens,
                   len(list_filter(w, x -> list_contains([{_STOP_LIST}], x))) AS n_stop,
                   length(text) AS n_chars_raw,
                   length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct
            FROM t
        )
        SELECT doc_id,
               ROUND((n_stop * 1.0 / GREATEST(n_tokens, 1)) - 5e-13, 6)
                   + 0.0 AS stopword_ratio,
               ROUND((n_punct * 1.0 / GREATEST(n_chars_raw, 1)) - 5e-13, 6)
                   + 0.0 AS punct_ratio,
               CASE WHEN n_tokens >= 20
                     AND n_punct * 1.0 / GREATEST(n_chars_raw, 1) < 0.1
                    THEN 'keep' ELSE 'drop' END AS verdict
        FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, punctuation density, length gate →
    keep/drop verdict (the C4/Gopher-style rule shape). Pure projection."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", words("text").alias("w")
    )
    w = F.col("w")
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n_chars_raw = F.length("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
    punct_ratio = n_punct * 1.0 / F.greatest(n_chars_raw, F.lit(1))
    return docs.select(
        "doc_id",
        round_ties_down(n_stop * 1.0 / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        round_ties_down(punct_ratio, 6).alias("punct_ratio"),
        F.when((n_tokens >= 20) & (punct_ratio < 0.1), "keep")
        .otherwise("drop")
        .alias("verdict"),
    )


@register(
    "text_language_id",
    tags=("text", "scalar"),
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_WORDS} AS w FROM documents)
        SELECT doc_id, lang,
               CASE WHEN len(list_filter(w, x -> list_contains([{_STOP_LIST}], x)))
                         * 1.0 / GREATEST(len(w), 1) >= 0.05
                    THEN 'en' ELSE 'unknown' END AS lang_pred
        FROM t
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit-ratio thresholding (the n-gram/
    stopword family of heuristics; a real system would score several
    languages' stopword lists and argmax — same plan shape, one projection)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", words("text").alias("w")
    )
    w = F.col("w")
    ratio = (
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
        * 1.0
        / F.greatest(F.size(w), F.lit(1))
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, "en").otherwise("unknown").alias("lang_pred"),
    )


@register(
    "text_bpe_token_count",
    tags=("text", "scalar"),
    oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text),
                   '[ \\t\\n\\f\\r\\x0B]+')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r\\x0B]'))
                   AS BIGINT) AS bpe_ish_tokens
        FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north-star spec): whitespace split and a
    BPE-ish regex lexer (letter runs | digit runs | single punctuation) —
    the cheap token-budget estimator for LLM data pipelines. Whitespace is
    the explicit ASCII class, not \\s — Java's \\s includes \\x0B, RE2's
    does not (functions/text.py WS_RE; unicode-landmine sweep)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "[ \\t\\n\\f\\r\\x0B]+"))
        .cast("long")
        .alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")),
                F.lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r\\x0B]"),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@register(
    "text_fingerprint",
    tags=("text", "scalar"),
    oracle=f"""
        SELECT doc_id,
               {FINGERPRINT_SQL.format(col="text")} AS fp,
               substr({FINGERPRINT_SQL.format(col="text")}, 1, 4) AS shard
        FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized text plus a
    16-bit shard prefix — the canonical dedup/shard key, identical across
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint("text")
    return docs.select(
        "doc_id", fp.alias("fp"), F.substring(fp, 1, 4).alias("shard")
    )


TFIDF_TOP_N = 3


@register(
    "text_tfidf_top_terms",
    tags=("text", "agg", "window"),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
            FROM tf JOIN df USING (term), n
        )
        SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk FROM (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term
                   ) AS rnk
            FROM scored
        ) WHERE rnk <= {TFIDF_TOP_N}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-{TFIDF_TOP_N} terms per document — the classic keyword /
    relevance signal, entirely in aggregates: term frequency from one
    tokenize+explode+count, document frequency from a per-term distinct
    count, idf = ln(N/df) with N from a 1-row broadcast, per-doc top-k
    window with a deterministic (score DESC, term) order.

    At 100 TB: tf shuffles on (doc, term) — partial aggregation collapses
    repeats map-side; df shuffles on term (skewed by stopwords — the
    standard mitigations are a stopword filter or a df cap, both one
    filter); the top-k window keys on doc_id, which WindowGroupLimit
    partially evaluates before the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()  # tiny scalar; at scale: a cached 1-row agg
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tfidf", "rnk")
    )


@register(
    "text_unigram_logprob",
    tags=("text", "agg", "quality"),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS}) AS term FROM documents
        ),
        freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
        total AS (SELECT COUNT(*) AS n FROM tok)
        SELECT tok.doc_id,
               ROUND(AVG(-ln(freq.cnt * 1.0 / total.n)), 6) AS avg_neg_logprob,
               COUNT(*) AS n_tokens
        FROM tok JOIN freq USING (term), total
        GROUP BY tok.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, unigram flavor (the CCNet-style
    perplexity-filter shape): each document's average negative log
    probability under the corpus unigram distribution — high values mean
    rare-token-heavy documents (gibberish, boilerplate codes), the standard
    filter signal. A real pipeline swaps the unigram table for a KenLM
    scorer behind the same join; the plan shape (token explode → broadcast
    term-frequency join → per-doc aggregate) is identical.

    At 100 TB the frequency table is the corpus vocabulary (millions of
    rows, not billions) — broadcastable or bucket-joinable; the per-doc
    aggregate shuffles on doc_id once."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = tok.count()  # scalar; at scale: a cached 1-row agg
    return (
        tok.join(F.broadcast(freq), "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(-F.log(F.col("cnt") * 1.0 / F.lit(float(total)))), 6
            ).alias("avg_neg_logprob"),
            F.count("*").alias("n_tokens"),
        )
    )


@register(
    "text_repetition_score",
    tags=("text", "scalar"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {WORDS_SQL.format(col="text")} AS w FROM documents),
        s AS (SELECT doc_id, w, {SHINGLES_SQL.format(words="w")} AS sh FROM t)
        SELECT doc_id,
               ROUND(((len(w) - len(list_distinct(w))) * 1.0
                      / GREATEST(len(w), 1)) - 5e-13, 6) + 0.0
                   AS dup_token_ratio,
               ROUND(((len(sh) - len(list_distinct(sh))) * 1.0
                      / GREATEST(len(sh), 1)) - 5e-13, 6) + 0.0
                   AS dup_3gram_ratio
        FROM s
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scoring (the Gopher/MassiveText repetition
    rules): the fraction of token occurrences that are repeats and the
    fraction of 3-gram occurrences that are repeats — the signals that
    catch boilerplate, keyword-stuffed spam, and degenerate generated text
    that per-token quality scores miss.

    Pure Column arithmetic over the tokenizer/shingle helpers shared with
    the dedup operators: one narrow projection per document, no explode, no
    shuffle — at 100 TB this fuses into the same scan as the other quality
    gates."""
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    s = t.select("doc_id", "w", shingles(F.col("w")).alias("sh"))
    w, sh = F.col("w"), F.col("sh")
    dup = lambda c: round_ties_down(
        (F.size(c) - F.size(F.array_distinct(c)))
        * 1.0
        / F.greatest(F.size(c), F.lit(1)),
        6,
    )
    return s.select(
        "doc_id",
        dup(w).alias("dup_token_ratio"),
        dup(sh).alias("dup_3gram_ratio"),
    )


# dialect-portable PII patterns (Java regex and RE2 agree on this subset).
# Redaction order matters: emails first (their local part can look like a
# phone), then IPv4 (phone's digit-run would eat dotted quads), then phones.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d() -]{7,}\d"


@register(
    "text_redact_pii",
    tags=("text", "scalar"),
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
                   AS n_ips,
               CAST(len(regexp_extract_all(
                   regexp_replace(
                       regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_IPV4}', '<IP>', 'g'),
                   '{PII_PHONE}')) AS BIGINT) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_IPV4}', '<IP>', 'g'),
                   '{PII_PHONE}', '<PHONE>', 'g') AS redacted
        FROM documents
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails, IPv4 addresses, and phone-shaped digit
    runs with typed placeholder tokens, and count what was removed — the
    privacy pass a training-data pipeline runs before any text leaves the
    ingest boundary. Counts are audit metadata (per-source PII rates feed
    the compliance dashboard); the chained-replace ORDER is part of the
    contract (see the pattern comment) and the oracle chains identically.

    Pure scan-side projection — three regexp passes fused into one codegen
    stage, no shuffle, no UDF; at 100 TB this rides the same scan as the
    quality gates. (Real pipelines add NER models for names/addresses — a
    mapInPandas stage like multimodal_decode_stub's; the regex tier is the
    deterministic, oracle-checkable floor.)"""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n = lambda c, p: F.size(
        F.regexp_extract_all(c, F.lit(p), F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id",
        n(t, PII_EMAIL).alias("n_emails"),
        n(t, PII_IPV4).alias("n_ips"),
        n(after_ip, PII_PHONE).alias("n_phones"),
        F.regexp_replace(after_ip, PII_PHONE, "<PHONE>").alias("redacted"),
    )


BPE_TOP_MERGES = 20  # merge candidates reported per induction round


@register(
    "bpe_merge_candidates",
    tags=("text", "ml"),
    oracle=f"""
        WITH t AS (SELECT {_WORDS} AS w FROM documents),
        wd AS (SELECT u.word AS word FROM t, UNNEST(w) AS u(word)),
        pr AS (
            SELECT substr(word, u.i, 1) AS merge_left,
                   substr(word, u.i + 1, 1) AS merge_right
            FROM wd, UNNEST(generate_series(1, length(word) - 1)) AS u(i)
        )
        SELECT merge_left, merge_right,
               CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM pr GROUP BY merge_left, merge_right
        ORDER BY pair_count DESC, merge_left, merge_right
        LIMIT {BPE_TOP_MERGES}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE vocabulary induction, the counting step: adjacent
    symbol-pair frequencies over every word occurrence in the corpus (the
    table whose argmax becomes the next merge rule when training a
    tokenizer ON the corpus being curated — the Sennrich et al. 2016 inner
    loop). Reported as the top-{BPE_TOP_MERGES} candidates with a total
    deterministic order (count desc, then pair lexicographic) so the cut
    boundary is engine-independent.

    Scale shape: pairs are built in-row per word and the count is a
    partial/final aggregate over a tiny key space (symbol pairs — bounded
    by alphabet², not corpus size), so the map-side combine collapses each
    partition to at most |alphabet|² rows before the exchange; the top-K is
    TakeOrderedAndProject, never a global sort. Later induction rounds
    re-run the same count over re-segmented words — each round is this same
    one-aggregate job."""
    docs = load_table(spark, sf_dir, "documents")
    word = F.col("word")
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(word) - 1),
        lambda i: F.struct(
            word.substr(i, F.lit(1)).alias("merge_left"),
            word.substr(i + 1, F.lit(1)).alias("merge_right"),
        ),
    )
    return (
        docs.select(F.explode(words("text")).alias("word"))
        .filter(F.length(word) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.merge_left", "p.merge_right")
        .groupBy("merge_left", "merge_right")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "merge_left", "merge_right")
        .limit(BPE_TOP_MERGES)
    )


@register(
    "text_char_entropy",
    tags=("text", "quality"),
    oracle="""
        WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        ch AS (
            SELECT doc_id, substr(t, u.i, 1) AS c
            FROM t, UNNEST(generate_series(1, length(t))) AS u(i)
        ),
        cnt AS (
            SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c
        ),
        agg AS (
            SELECT doc_id, SUM(n) AS total, SUM(n * ln(n)) AS s
            FROM cnt GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(total AS BIGINT) AS n_chars_counted,
               ROUND(ln(total) - s / total, 6) AS char_entropy
        FROM agg
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (natural log), computed
    as H = ln(n) − Σ cnt·ln(cnt) / n over lower-cased character counts —
    the gibberish/binary-blob detector quality pipelines run alongside the
    Gopher rules: encrypted or base64 payloads sit near the uniform ceiling,
    single-character spam near zero, natural language in a tight band.

    Scale shape: the character explode is corpus-chars-sized but feeds a
    map-side-combinable (doc_id, char) count — partials collapse to at most
    |alphabet| rows per doc per partition before the exchange, and the
    second aggregate is per-doc. The entropy sum runs over ≤ |alphabet|
    terms, so 6-dp rounding absorbs engine summation-order ulps (the
    stats_agg discipline)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    # empty-text guard: sequence(1, 0) DESCENDS ([1, 0]) in Spark, which
    # would fabricate two '' characters for an empty document while the
    # oracle's generate_series(1, 0) yields none — same pitfall shingles()
    # guards with its size check
    positions = F.when(
        F.length("t") > 0, F.sequence(F.lit(1), F.length("t"))
    ).otherwise(F.array().cast("array<int>"))
    chars = docs.select(
        "doc_id",
        F.explode(
            F.transform(positions, lambda i: F.col("t").substr(i, F.lit(1)))
        ).alias("c"),
    )
    cnt = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.log("n")).alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("total").cast("long").alias("n_chars_counted"),
        F.round(F.log("total") - F.col("s") / F.col("total"), 6)
            .alias("char_entropy"),
    )


FEATURE_HASH_DIM = 16  # hashed bag-of-words dimensionality


@register(
    "text_feature_hash_embedding",
    tags=("text", "ml", "similarity"),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS}) AS term FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(term), 1, 4))::BIGINT
                       % {FEATURE_HASH_DIM} AS bucket,
                   CASE WHEN ('0x' || substr(md5(term), 5, 1))::BIGINT % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM tok
        ),
        comp AS (
            SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
            FROM hashed GROUP BY doc_id, bucket
        ),
        grid AS (
            SELECT c.doc_id, g.b,
                   COALESCE(MAX(CASE WHEN c.bucket = g.b THEN c.raw END), 0)
                       AS comp
            FROM comp c, UNNEST(generate_series(0, {FEATURE_HASH_DIM - 1}))
                 AS g(b)
            GROUP BY c.doc_id, g.b
        ),
        vec AS (
            SELECT doc_id, array_agg(comp ORDER BY b) AS comps
            FROM grid GROUP BY doc_id
        )
        SELECT doc_id,
               -- printf('%.6f'): fixed-decimal rendering on BOTH engines —
               -- a VARCHAR cast diverges once components drop below 1e-3
               -- (DuckDB prints 0.0005, Java prints 5.0E-4); + 0.0
               -- normalizes IEEE negative zero (the stats_agg discipline)
               array_to_string(
                   list_transform(comps, c -> printf('%.6f',
                       ROUND(c / GREATEST(sqrt(list_sum(
                           list_transform(comps, x -> x * x * 1.0))), 1e-12), 6)
                       + 0.0)), '|') AS embedding
        FROM vec
    """,
)
def text_feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING-TRICK vectorizer (Weinberger et al. 2009) — the
    text→vector step done engine-side, no model service: each token hashes
    to one of FEATURE_HASH_DIM buckets with a ±1 sign hash, per-bucket
    signed counts form the raw vector, and L2 normalization makes it
    cosine-ready. This is how a pipeline bootstraps embeddings for the
    similarity/dedup families before a learned encoder exists — the
    derived vectors feed the same sign-LSH/IVF machinery as the
    embeddings table (composition pinned in tests/test_feature_hash.py).

    Cross-engine exactness: buckets and signs come from md5 prefixes
    (portable — neither engine's native hash matches the other's), the
    per-bucket sums are INTEGER (order-independent), and only the final
    normalize divides in float, one correctly-rounded op per component
    before 6-dp rounding. Serialized '|'-joined per the flat-output
    contract.

    Scale shape: one (doc, bucket) map-side-combinable aggregate over the
    token explode (key space = docs × DIM), then an in-row pivot to the
    dense component array — no UDF, no model inference, no second corpus
    pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    bucket = F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long") % (
        FEATURE_HASH_DIM
    )
    sgn = F.when(
        F.conv(F.substring(F.md5("term"), 5, 1), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    comp = (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("raw"))
    )
    vec = comp.groupBy("doc_id").agg(
        F.collect_list(F.struct("bucket", "raw")).alias("pairs")
    )
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(FEATURE_HASH_DIM - 1)),
        # try_element_at: a doc may hit no term in bucket b — the plain
        # element_at raises INVALID_ARRAY_INDEX on the empty filter result
        lambda b: F.coalesce(
            F.try_element_at(
                F.transform(
                    F.filter(F.col("pairs"), lambda r: r["bucket"] == b),
                    lambda r: r["raw"],
                ),
                F.lit(1),
            ),
            F.lit(0).cast("long"),
        ),
    )
    staged = vec.select("doc_id", comps.alias("comps"))
    norm = F.greatest(
        F.sqrt(
            F.aggregate(
                F.col("comps"),
                F.lit(0.0),
                lambda acc, x: acc + (x * x).cast("double"),
            )
        ),
        F.lit(1e-12),
    )
    return staged.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("comps"),
                # format_string('%.6f'): fixed-decimal on both engines (a
                # plain string cast goes scientific below 1e-3); + 0.0
                # normalizes -0.0 (the stats_agg discipline)
                lambda c: F.format_string(
                    "%.6f", F.round(c / norm, 6) + F.lit(0.0)
                ),
            ),
            "|",
        ).alias("embedding"),
    )


# BM25 constants (Okapi, Lucene-style idf): fixed query + standard k1/b.
BM25_TERMS = ("join", "hash", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 50


def _bm25_sql_parts() -> tuple[str, str, str]:
    """Shared SQL fragments for the BM25 family: the tokenize/tf/stats CTE
    chain, the score expression, and the matched-term count — used verbatim
    by both the standalone BM25 oracle and the hybrid-RRF oracle so the
    lexical arm is definitionally identical in both."""
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    norm = f"({BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))"
    score = " + ".join(
        f"ln(1 + (n - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * tf_{t} * ({BM25_K1} + 1) / (tf_{t} + {norm})"
        for t in BM25_TERMS
    )
    matched = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in BM25_TERMS
    )
    cte = f"""
        t AS (
            SELECT doc_id, {WORDS_SQL.format(col="text")} AS w FROM documents
        ),
        tf AS (SELECT doc_id, len(w) AS dl, {tf_cols} FROM t),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl, {df_cols}
            FROM tf
        )
    """
    return cte, score, matched


def _bm25_oracle() -> str:
    cte, score, matched = _bm25_sql_parts()
    return f"""
        WITH {cte}
        SELECT doc_id,
               ROUND({score}, 6) + 0.0 AS bm25,
               CAST({matched} AS BIGINT) AS n_terms_matched
        FROM tf, stats
        ORDER BY ROUND({score}, 6) DESC, doc_id
        LIMIT {BM25_TOP}
    """


def term_tf_columns(w_col) -> list:
    """Per-term tf columns (``tf_<term>``) as in-row array filters over a
    token-array column — the no-posting-list-explode trick shared by the
    document and chunk BM25 paths."""

    def _tf(term: str):
        # closure per term — a 2-arg lambda with a default would flip
        # F.filter into its (element, index) calling convention
        return F.size(F.filter(w_col, lambda x: x == F.lit(term)))

    return [_tf(t_).alias(f"tf_{t_}") for t_ in BM25_TERMS]


def bm25_score_frame(tf: DataFrame, id_cols: list[str]) -> DataFrame:
    """Score any tf frame (columns: *id_cols, dl, tf_<term>...) with Okapi
    BM25 + Lucene idf; corpus stats reduce to ONE broadcast row. Shared by
    the document path (search_bm25 / hybrid RRF) and the chunk-granular
    RAG path (rag_retrieve_chunks)."""
    stats = tf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t_}") > 0).cast("int")).alias(f"df_{t_}")
            for t_ in BM25_TERMS
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    norm = F.lit(BM25_K1) * (
        F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    score = F.lit(0.0)
    matched = F.lit(0)
    for t_ in BM25_TERMS:
        tf_c = F.col(f"tf_{t_}")
        idf = F.log(
            1 + (F.col("n") - F.col(f"df_{t_}") + 0.5) / (F.col(f"df_{t_}") + 0.5)
        )
        score = score + idf * tf_c * F.lit(BM25_K1 + 1) / (tf_c + norm)
        matched = matched + (tf_c > 0).cast("int")
    rounded = F.round(score, 6) + F.lit(0.0)
    return scored.select(
        *id_cols,
        rounded.alias("bm25"),
        matched.cast("long").alias("n_terms_matched"),
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25-scored corpus (doc_id, bm25 rounded 6-dp, n_terms_matched)
    shared by search_bm25 and the hybrid-RRF fusion — one definition of the
    lexical arm, two consumers."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", words("text").alias("w"))
    tf = t.select(
        "doc_id", F.size("w").alias("dl"), *term_tf_columns("w")
    )
    return bm25_score_frame(tf, ["doc_id"])


@register("search_bm25", tags=("text", "search", "agg"), oracle=_bm25_oracle())
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (Okapi tf saturation + length normalization,
    Lucene's ln(1 + (N-df+0.5)/(df+0.5)) idf): the LEXICAL retrieval twin of
    the ANN family — top-BM25_TOP documents for a fixed conjunctive query.

    Scale shape: per-term tf is an IN-ROW array filter over the tokenized
    projection (terms are fixed, so no posting-list explode and the corpus
    never shuffles); the corpus statistics (N, avgdl, per-term df) reduce to
    ONE 1-row aggregate attached back by broadcast crossJoin (the rate-table
    pattern); top-k is orderBy+limit = TakeOrderedAndProject (per-partition
    heaps, no global sort). Determinism: ranking ties break on doc_id, and
    the ORDER BY key is the 6-dp ROUNDED score, so both engines cut the
    same top-k set."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


# Retrieval-quality evaluation: every REVAL_STRIDE-th document becomes a
# query (its first REVAL_TERMS distinct tokens in document order), gold =
# the source document itself; metrics are the gold document's BM25 rank,
# reciprocal rank (MRR per query), and hit@REVAL_HIT_K — the relevance
# regression a retrieval pipeline gates its index/scorer changes on.
REVAL_STRIDE = 37
REVAL_TERMS = 4
REVAL_HIT_K = 10


def _retrieval_eval_oracle() -> str:
    k1, b = BM25_K1, BM25_B
    return f"""
        WITH t AS (
            SELECT doc_id, {WORDS_SQL.format(col="text")} AS w FROM documents
        ),
        post AS (
            SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
                SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM t
            ) GROUP BY doc_id, dl, term
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(len(w)) AS avgdl FROM t
        ),
        qt AS (
            SELECT query_id, term FROM (
                SELECT query_id, term,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY p
                       ) AS rn
                FROM (
                    SELECT doc_id AS query_id, w[u.i + 1] AS term,
                           MIN(u.i) AS p
                    FROM t, unnest(range(0, len(w))) AS u(i)
                    WHERE doc_id % {REVAL_STRIDE} = 0
                    GROUP BY doc_id, w[u.i + 1]
                )
            ) WHERE rn <= {REVAL_TERMS}
        ),
        dft AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post
            WHERE term IN (SELECT DISTINCT term FROM qt)
            GROUP BY term
        ),
        scored AS (
            SELECT qt.query_id, post.doc_id,
                   ROUND(SUM(
                       ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
                       * post.tf * ({k1} + 1)
                       / (post.tf
                          + {k1} * (1 - {b} + {b} * post.dl / stats.avgdl))
                   ), 6) AS score
            FROM post
            JOIN qt USING (term)
            JOIN dft USING (term), stats
            GROUP BY qt.query_id, post.doc_id
        ),
        gold AS (
            SELECT query_id, score AS gscore FROM scored
            WHERE doc_id = query_id
        ),
        agg AS (
            SELECT g.query_id,
                   CAST(1 + COUNT(CASE WHEN s.score > g.gscore
                                       OR (s.score = g.gscore
                                           AND s.doc_id < g.query_id)
                                  THEN 1 END) AS BIGINT) AS gold_rank,
                   CAST(COUNT(*) AS BIGINT) AS n_candidates
            FROM scored s JOIN gold g USING (query_id)
            GROUP BY g.query_id
        )
        SELECT query_id, gold_rank,
               ROUND(1.0 / gold_rank, 6) + 0.0 AS reciprocal_rank,
               (gold_rank <= {REVAL_HIT_K}) AS hit_at_k,
               n_candidates
        FROM agg
    """


@register(
    "retrieval_eval_bm25",
    tags=("text", "search", "agg", "eval"),
    oracle=_retrieval_eval_oracle(),
)
def retrieval_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation over DATA-DEPENDENT queries — the
    missing twin of search_bm25's fixed-term path: every REVAL_STRIDE-th
    document yields a query (its first REVAL_TERMS distinct tokens in
    document order), gold is the source document, and the output is the
    per-query relevance scorecard (gold_rank, reciprocal_rank for MRR,
    hit@REVAL_HIT_K, candidate-set size) a pipeline gates retriever or
    index changes on.

    Scale shape — the real inverted-index regime, since per-query terms
    are not compile-time literals: ONE posting-list build, PRUNED to query
    terms BEFORE the aggregate (a broadcast semi-join on the eval-sized
    term set — the corpus explode runs exactly once per invocation) and
    parquet-checkpointed so the df aggregate and the scoring probe read
    the same files (r14 session 6; previously the full posting build
    evaluated twice — once under the broadcast df build, once as the
    probe side). Query terms and their df attach by BROADCAST joins
    (queries are eval-set-sized, always the small side), BM25
    contributions reduce per (query, doc) in one partial/final aggregate,
    and the gold rank is computed WITHOUT ranking: count candidates
    strictly better than the gold score (rounded 6-dp, doc_id tie-break).
    The gold score attaches by a WINDOW over query_id — the following
    per-query aggregate reuses the window's hash partitioning (guide
    §2.4), which replaced the scored-frame parquet checkpoint + filtered
    broadcast join (one write job, one read and one broadcast build
    removed). Gold self-retrieval is guaranteed a candidate row (a doc
    always contains its own terms), so every query reports."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.size("w")).alias("avgdl"),
    )
    first_pos = (
        toks.filter((F.col("doc_id") % REVAL_STRIDE) == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.posexplode("w").alias("pos", "term"),
        )
        .groupBy("query_id", "term")
        .agg(F.min("pos").alias("p"))
    )
    qt = (
        first_pos.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("query_id").orderBy("p")),
        )
        .filter(F.col("rn") <= REVAL_TERMS)
        .select("query_id", "term")
    )
    # posting build pruned to query terms BEFORE the aggregate, then
    # checkpointed once: the df aggregate and the scoring probe read the
    # same files — the corpus explode runs exactly once per invocation.
    # The pruned frame is query-term-postings-sized (eval-set-bounded), a
    # vanishing fraction of the corpus at any scale.
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    pruned = (
        toks.select(
            "doc_id", F.size("w").alias("dl"), F.explode("w").alias("term")
        )
        .join(F.broadcast(qt.select("term").distinct()), "term", "semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    p_path = os.path.join(checkpoint_base(spark, None, "_reval_"), "post")
    pruned.write.mode("overwrite").parquet(p_path)
    pruned = spark.read.parquet(p_path)
    dft = pruned.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    cand = (
        pruned.join(F.broadcast(qt), "term")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * F.col("tf") * F.lit(BM25_K1 + 1) / (F.col("tf") + norm)
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    # gold score rides a WINDOW over query_id (the gold row is guaranteed
    # present and unique per query); the groupBy below reuses the window's
    # hash partitioning, so the old scored-frame parquet checkpoint +
    # filtered broadcast-gold join collapse into one shuffle (r14 s6).
    wq = Window.partitionBy("query_id")
    gscore = F.max(
        F.when(F.col("doc_id") == F.col("query_id"), F.col("score"))
    ).over(wq)
    better = (F.col("score") > gscore) | (
        (F.col("score") == gscore) & (F.col("doc_id") < F.col("query_id"))
    )
    agg = (
        scored.select("query_id", "doc_id", "score", better.alias("b"))
        .groupBy("query_id")
        .agg(
            (F.lit(1) + F.sum(F.col("b").cast("int"))).cast("long").alias("gold_rank"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
        )
    )
    return agg.select(
        "query_id",
        "gold_rank",
        (F.round(1.0 / F.col("gold_rank"), 6) + F.lit(0.0)).alias(
            "reciprocal_rank"
        ),
        (F.col("gold_rank") <= REVAL_HIT_K).alias("hit_at_k"),
        "n_candidates",
    )


# Reciprocal-rank-fusion constants: Cormack et al. 2009's k=60, two arms
# (BM25 lexical + embedding cosine), fixture query = document/vector 0.
RRF_K = 60
RRF_ARM_DEPTH = 100
RRF_TOP = 20
RRF_QUERY_ID = 0


def _rrf_oracle() -> str:
    cte, score, _ = _bm25_sql_parts()
    return f"""
        WITH {cte},
        lex AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND({score}, 6) DESC, doc_id
                   ) AS lex_rank
            FROM tf, stats WHERE doc_id <> {RRF_QUERY_ID}
            QUALIFY lex_rank <= {RRF_ARM_DEPTH}
        ),
        q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qe,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS qn
            FROM embeddings WHERE vec_id = {RRF_QUERY_ID}
        ),
        dense AS (
            SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND(
                           list_dot_product(CAST(embedding AS DOUBLE[]), qe)
                           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                    CAST(embedding AS DOUBLE[])))
                              * qn), 6) DESC, vec_id
                   ) AS dense_rank
            FROM embeddings, q WHERE vec_id <> {RRF_QUERY_ID}
            QUALIFY dense_rank <= {RRF_ARM_DEPTH}
        )
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank,
               ROUND(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + l.lex_rank), 0)
                     + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + d.dense_rank), 0),
                     6) + 0.0 AS rrf_score
        FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT {RRF_TOP}
    """


@register(
    "search_hybrid_rrf",
    tags=("text", "search", "similarity", "join"),
    oracle=_rrf_oracle(),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    fuse the BM25 lexical ranking with an embedding-cosine dense ranking
    (query = vector RRF_QUERY_ID; doc_id and vec_id are aligned in the
    fixture corpus) as Σ 1/(RRF_K + rank) over the arms that retrieved the
    document — the standard RAG retrieval front-end, run entirely in the
    engine. A document found by only one arm still scores (the other arm's
    term is 0), which is RRF's point: arms need not agree on depth.

    Determinism: each arm ranks on its 6-dp ROUNDED score with doc_id
    tie-break, so the RRF_ARM_DEPTH cut sets are engine-independent; ranks
    are integers, so the fused score is exact before its own rounding.

    Scale shape: each arm is corpus-scan + TakeOrderedAndProject (the
    orderBy/limit ARM_DEPTH happens BEFORE ranks are assigned, so the
    row_number window runs over ≤ ARM_DEPTH rows, never the corpus); the
    fusion is a full outer join of two ≤ ARM_DEPTH-row frames — driver-
    trivial at any corpus size. The expensive parts (BM25 stats, dot
    products) reuse the exact plans of search_bm25 / similarity_topk_*."""
    from dblp_to_csv_spark.operators.similarity import _as_double, _dot, _norm

    lex_scored = _bm25_scored(spark, sf_dir).filter(
        F.col("doc_id") != RRF_QUERY_ID
    )
    lex_top = lex_scored.orderBy(F.desc("bm25"), "doc_id").limit(RRF_ARM_DEPTH)
    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("lex_rank")
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    emb = emb.withColumn("nrm", _norm(F.col("emb")))
    q = F.broadcast(
        emb.filter(F.col("vec_id") == RRF_QUERY_ID).select(
            F.col("emb").alias("qe"), F.col("nrm").alias("qn")
        )
    )
    cos = _dot(F.col("emb"), F.col("qe")) / (F.col("nrm") * F.col("qn"))
    dense_scored = (
        emb.filter(F.col("vec_id") != RRF_QUERY_ID)
        .crossJoin(q)
        .select(
            F.col("vec_id").alias("doc_id"), F.round(cos, 6).alias("cos_sim")
        )
    )
    dense_top = dense_scored.orderBy(F.desc("cos_sim"), "doc_id").limit(
        RRF_ARM_DEPTH
    )
    w_dense = Window.orderBy(F.desc("cos_sim"), "doc_id")
    dense = dense_top.select(
        "doc_id", F.row_number().over(w_dense).cast("long").alias("dense_rank")
    )

    fused = lex.join(dense, "doc_id", "full")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
        ),
        6,
    ) + F.lit(0.0)
    return (
        fused.select("doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP)
    )


ZIPF_TOP = 256  # rank depth for the log-log frequency fit


@register(
    "text_zipf_slope",
    tags=("text", "stats", "regression"),
    oracle=f"""
        WITH tok AS (
            SELECT unnest({WORDS_SQL.format(col="text")}) AS tok FROM documents
        ),
        cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT {ZIPF_TOP}),
        ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM top
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
               ROUND(REGR_SLOPE(ln(c), ln(r)), 6) AS zipf_slope,
               ROUND(REGR_INTERCEPT(ln(c), ln(r)), 6) AS zipf_intercept,
               ROUND(REGR_R2(ln(c), ln(r)), 6) + 0.0 AS fit_r2
        FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law diagnostic: fit ln(freq) ~ ln(rank) over the top-ZIPF_TOP
    token frequencies. Natural corpora fit slope ≈ −1; a slope far from it
    (this synthetic near-uniform corpus sits near 0) flags templated or
    degenerate text — a corpus-level quality gate to run next to the
    per-document Gopher rules.

    Scale shape: the only corpus-sized work is the token count (explode +
    map-side-combinable groupBy); the fit itself runs on ≤ ZIPF_TOP rows —
    top-k cut via orderBy+limit (TakeOrderedAndProject), rank via a window
    over that tiny frame (single partition of ≤ 256 rows — bounded by
    construction, not a corpus-sized global window), regression via the
    REGR_* moment aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(words("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "tok").limit(ZIPF_TOP)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    )
    lc, lr = F.log("c"), F.log("r")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        (F.round(F.regr_r2(lc, lr), 6) + F.lit(0.0)).alias("fit_r2"),
    )


# --- BPE merge TRAINING loop (iterated argmax + corpus re-segmentation) ----

BPE_ROUNDS = 4  # merge rules learned; each is one count + one rewrite pass


def _bpe_ctes() -> str:
    """Unrolled BPE training rounds as a CTE chain (shared by the train and
    apply oracles). Vocabulary state is a delimited symbol string
    ('|a||b||c|', each symbol wrapped in its own pipes) so the merge
    rewrite is a plain left-to-right non-overlapping string replace of
    '|l||r|' with '|lr|' — IDENTICAL semantics in DuckDB replace() and
    Spark replace(), including the 'aaaa'→[aa,aa] consecutive-repeat case
    (each symbol owns its delimiters, so one match never consumes the next
    match's boundary)."""
    ctes = [
        "w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
        f"SELECT unnest({_WORDS}) AS word FROM documents) GROUP BY word)",
        "v0 AS (SELECT word,"
        " regexp_replace(word, '(.)', '|\\1|', 'g') AS symstr,"
        " freq FROM w0)",
    ]
    for i in range(1, BPE_ROUNDS + 1):
        prev = f"v{i - 1}"
        ctes.append(
            f"""p{i} AS (
                SELECT sym[u.i] AS ml, sym[u.i + 1] AS mr,
                       CAST(SUM(freq) AS BIGINT) AS c
                FROM (SELECT string_split(trim(symstr, '|'), '||') AS sym,
                             freq FROM {prev}) s,
                     UNNEST(generate_series(1, len(sym) - 1)) AS u(i)
                GROUP BY ml, mr
            )"""
        )
        ctes.append(
            f"r{i} AS (SELECT ml, mr, c FROM p{i}"
            f" ORDER BY c DESC, ml, mr LIMIT 1)"
        )
        ctes.append(
            # LEFT JOIN ON TRUE (not a cross join): an empty rule round
            # must preserve the vocabulary — same guard as the Spark side
            f"v{i} AS (SELECT word,"
            f" CASE WHEN ml IS NULL THEN symstr"
            f" ELSE replace(symstr, '|' || ml || '||' || mr || '|',"
            f" '|' || ml || mr || '|') END AS symstr, freq"
            f" FROM {prev} LEFT JOIN r{i} ON TRUE)"
        )
    return ",\n".join(ctes)


def _bpe_train_oracle() -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS merge_round, ml AS merge_left,"
        f" mr AS merge_right, c AS pair_count FROM r{i}"
        for i in range(1, BPE_ROUNDS + 1)
    ]
    return (
        "WITH " + _bpe_ctes() + "\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY merge_round"
    )


def _bpe_apply_oracle() -> str:
    return f"""
        WITH {_bpe_ctes()},
        pw AS (
            SELECT word,
                   CAST(len(string_split(trim(symstr, '|'), '||')) AS BIGINT)
                       AS n_syms,
                   CAST(length(word) AS BIGINT) AS n_chars
            FROM v{BPE_ROUNDS}
        ),
        tok AS (
            SELECT doc_id, unnest({_WORDS}) AS word FROM documents
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_chars) AS BIGINT) AS n_char_symbols,
               CAST(SUM(n_syms) AS BIGINT) AS n_bpe_symbols,
               ROUND(CAST(SUM(n_syms) AS DOUBLE) / SUM(n_chars), 6) + 0.0
                   AS compression_ratio
        FROM tok JOIN pw USING (word)
        GROUP BY doc_id
    """


def _bpe_train(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """The BPE training chain shared by `bpe_train_merges` (returns the
    learned rules) and `bpe_apply_encode` (returns the final re-segmented
    vocabulary): see bpe_train_merges for the full contract. Returns
    (rules, vocab_final) where vocab_final = (word, symstr, freq) AFTER
    all BPE_ROUNDS merges."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, checkpoint_dir, "_bpe_")

    def _ckpt(df: DataFrame, name: str) -> DataFrame:
        path = os.path.join(base, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # fan-out-gated scan (guide §2.5): the word-frequency aggregate is an
    # integer COUNT — order-exact.
    docs = fan_out_small(load_table(spark, sf_dir, "documents"), "doc_id")
    w0 = (
        docs.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    v = _ckpt(
        w0.select(
            "word",
            F.regexp_replace("word", "(.)", "|$1|").alias("symstr"),
            "freq",
        ),
        "v0",
    )
    rule_rows: list[tuple] = []
    for rnd in range(1, BPE_ROUNDS + 1):
        sym = F.split(F.expr("btrim(symstr, '|')"), r"\|\|")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.struct(
                F.element_at(sym, i).alias("ml"),
                F.element_at(sym, i + 1).alias("mr"),
            ),
        )
        pc = (
            # guard size >= 2: sequence(1, 0) would generate a DESCENDING
            # range (the char-entropy bug class), not an empty one
            v.filter(F.size(sym) >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.ml").alias("ml"), F.col("p.mr").alias("mr"))
            .agg(F.sum("freq").cast("long").alias("c"))
        )
        # The argmax rule is a 1-row aggregate: COLLECT it (the sanctioned
        # bounded-collect class — same budget as the CC merge map and the
        # PageRank n) instead of parquet-checkpointing a 1-row frame (r14
        # optimization round). This drops one write+read job pair per round
        # AND lets the rewrite embed the rule as LITERALS, so the vocab
        # lineage is a flat per-round replace projection over v0 with no
        # broadcast joins — fewer jobs, shorter plans, identical totals
        # (the TakeOrdered (c desc, ml, mr) top-1 is the same total order
        # the checkpointed variant wrote).
        top = pc.orderBy(F.desc("c"), "ml", "mr").limit(1).collect()
        if not top:
            # no adjacent pairs (vocabulary fully merged): no rule this
            # round and the vocabulary must stay UNCHANGED (review r8
            # session 4 — the 0-row guard the LEFT-join variant encoded)
            continue
        ml, mr, c = top[0]["ml"], top[0]["mr"], top[0]["c"]
        rule_rows.append((rnd, ml, mr, c))
        v = v.select(
            "word",
            F.replace(
                F.col("symstr"),
                F.lit(f"|{ml}||{mr}|"),
                F.lit(f"|{ml}{mr}|"),
            ).alias("symstr"),
            "freq",
        )
    v = _ckpt(v, f"v{BPE_ROUNDS}")
    out = spark.createDataFrame(
        rule_rows,
        "merge_round long, merge_left string, merge_right string, "
        "pair_count long",
    )
    return out, v


@register(
    "bpe_train_merges",
    tags=("text", "ml", "iterative"),
    oracle=_bpe_train_oracle(),
)
def bpe_train_merges(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016), the full inner loop
    iterated BPE_ROUNDS times: count adjacent symbol pairs weighted by word
    frequency, take the argmax as the next merge rule (count desc, then
    pair lexicographic — a total order both engines share), re-segment the
    vocabulary by applying the merge, repeat. Emits the learned merge table
    (merge_round, merge_left, merge_right, pair_count) — the artifact a
    tokenizer ships. Consecutive repeats merge left-to-right
    non-overlapping ('aaaa' + rule (a,a) → [aa][aa]): the vocabulary state
    is a pipe-wrapped symbol string and the rewrite is a literal
    replace('|l||r|' → '|lr|'), which has exactly those semantics in both
    engines (each symbol carries its own delimiters, so a match never
    consumes its neighbor's boundary — see tests/test_bpe_training.py).

    Scale shape: the ONLY corpus-sized pass is the initial word-frequency
    aggregate (map-side-combinable explode+groupBy); every round after
    runs on the VOCABULARY (distinct words — millions of rows when the
    corpus is billions of documents), each round = one pair-count
    aggregate over a near-alphabet²-bounded key space plus one in-row
    rewrite with the 1-row rule attached by broadcast crossJoin. R rounds
    = R vocab-sized jobs, no driver loop over data, no UDF. The vocabulary
    and each learned rule parquet-checkpoint per round (the CC/k-core
    discipline): without it, the lazily-chained rounds would re-run the
    corpus tokenize+aggregate once per round per union branch."""
    out, _ = _bpe_train(spark, sf_dir, checkpoint_dir)
    return out


@register(
    "bpe_apply_encode",
    tags=("text", "ml", "join"),
    oracle=_bpe_apply_oracle(),
)
def bpe_apply_encode(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """APPLY the learned BPE merges back to the corpus (the encode half of
    the tokenizer loop): every document's token count under the trained
    segmentation, next to its character-symbol baseline — the compression
    the BPE_ROUNDS merges actually bought, per document. The encoding
    itself happens on the VOCABULARY (each distinct word's final symbol
    string falls out of the training chain); documents just join their
    words to it — exactly how a production tokenizer applies merges (a
    word-level memo table), and the proof that train→apply composes
    engine-side.

    Scale shape: one corpus tokenize-explode joined to the vocab table on
    the word (broadcast while the vocab fits, shuffle-hash beyond; either
    way the document TEXT never moves — only (doc_id, word) pairs), then a
    map-side-combinable per-doc sum."""
    _, vocab = _bpe_train(spark, sf_dir, checkpoint_dir)
    n_syms = F.size(F.split(F.expr("btrim(symstr, '|')"), r"\|\|"))
    per_word = vocab.select(
        "word",
        n_syms.cast("long").alias("n_syms"),
        F.length("word").cast("long").alias("n_chars"),
    )
    # fan-out-gated scan (guide §2.5): per-doc symbol sums are integers.
    tok = fan_out_small(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", F.explode(words("text")).alias("word")
    )
    return (
        tok.join(per_word, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_char_symbols"),
            F.sum("n_syms").cast("long").alias("n_bpe_symbols"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_char_symbols",
            "n_bpe_symbols",
            (
                F.round(
                    F.col("n_bpe_symbols") / F.col("n_char_symbols"), 6
                )
                + F.lit(0.0)
            ).alias("compression_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Bigram language-model cross-entropy (KenLM-style perplexity filtering,
# one order down): train add-k bigram counts ON the corpus, score each
# document's per-bigram cross-entropy. The CCNet/Gopher pipelines gate
# admission on exactly this signal (they use a pretrained 5-gram model; the
# operator shape — count tables joined back to the token stream — is
# identical, only the model order and provenance differ).
# --------------------------------------------------------------------------
LM_ADD_K = 0.5

# bigram list SQL shared with the Column-side twin (functions/text.py) —
# the guarded CASE len>=2 form; UNNEST of [] yields no rows, so the WHERE
# below stays as a scan-level filter, not a correctness guard.


@register(
    "lm_bigram_cross_entropy",
    tags=("text", "lm", "join"),
    oracle=f"""
        WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
        vocab AS (
            SELECT COUNT(DISTINCT word) AS v
            FROM (SELECT UNNEST(w) AS word FROM t)
        ),
        bg AS (
            SELECT doc_id, UNNEST({BIGRAMS_SQL.format(words="w")}) AS bg
            FROM t WHERE len(w) >= 2
        ),
        bgc AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY bg),
        prevc AS (
            SELECT split_part(bg, ' ', 1) AS prev, COUNT(*) AS c1
            FROM bg GROUP BY 1
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(-log2((c12 + {LM_ADD_K})
                               / (c1 + {LM_ADD_K} * v))), 6) AS cross_entropy
        FROM bg
        JOIN bgc USING (bg)
        JOIN prevc ON prevc.prev = split_part(bg.bg, ' ', 1)
        CROSS JOIN vocab
        GROUP BY doc_id
    """,
)
def lm_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram cross-entropy under an add-k-smoothed bigram LM
    trained on the corpus itself: H(doc) = avg over the doc's bigrams of
    -log2 (c(w1 w2)+k)/(c(w1 ·)+k·V). High H → gibberish/boilerplate;
    low H → fluent text — the perplexity admission gate of CCNet/Gopher.

    Bigrams come from the words array in-row (zip-adjacent transform — no
    window, no self-join); the bigram and prev-context count tables are one
    hash aggregate each over the exploded stream, then join back on the
    bigram key. At 100 TB: the exploded stream shuffles twice on high-
    cardinality keys (bg for counts+join, doc_id for the final avg) with
    map-side combine collapsing the count sides; the vocab size is a 1-row
    broadcast. Skewed bigrams ("of the") are exactly what AQE skew-split
    handles; a frequency cap on the count table is the documented dial if
    the top-bigram partition ever dominates."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", words("text").alias("w"))
    bg = t.select("doc_id", F.explode(bigrams(F.col("w"))).alias("bg"))
    vocab = (
        t.select(F.explode("w").alias("word"))
        .agg(F.count_distinct("word").alias("v"))
    )
    # The bigram count table materializes once; the prev-context table is
    # then DERIVED from it — c(w1 ·) = Σ c(w1 w2) over bigrams sharing the
    # prefix, exact integer arithmetic — instead of a second groupBy over
    # the lazy exploded stream, which re-tokenized the corpus (r11
    # double-eval audit, ROADMAP 30: 4 corpus explodes → 3, and the prevc
    # shuffle now runs over the vocab-sized count table, not the occurrence
    # stream). PARQUET checkpoint, not cache()/localCheckpoint: the
    # distinct-bigram frame is corpus-vocabulary-scale (Heaps-sublinear but
    # unbounded), and storage blocks pinned by a registered query leak in a
    # shared session with no unpersist hook — the dedup.py candidate-frame
    # discipline (minhash_lsh_pairs docstring) applies verbatim.
    from dblp_to_csv_spark.session import session_checkpoint_dir

    bgc_lazy = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    _bgc_dir = session_checkpoint_dir("_lm_bgc_")
    bgc_lazy.write.mode("overwrite").parquet(_bgc_dir)
    bgc = spark.read.parquet(_bgc_dir)
    prevc = (
        bgc.select(F.split("bg", " ").getItem(0).alias("prev"), "c12")
        .groupBy("prev")
        .agg(F.sum("c12").alias("c1"))
    )
    scored = (
        bg.join(bgc, "bg")
        .withColumn("prev", F.split("bg", " ").getItem(0))
        .join(prevc, "prev")
        .crossJoin(F.broadcast(vocab))
    )
    neg_log2_p = -F.log2(
        (F.col("c12") + LM_ADD_K) / (F.col("c1") + LM_ADD_K * F.col("v"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg(neg_log2_p), 6).alias("cross_entropy"),
    )
