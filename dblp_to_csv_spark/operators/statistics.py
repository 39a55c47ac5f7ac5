"""Statistical aggregates and ranking distribution functions — rounding out
the aggregate inventory (SURVEY.md §2.3): stddev/variance/correlation/
covariance, ntile buckets, first/last values over ordered windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import (
    FINITE_OR_NULL_SQL,
    NAN_AS_NULL_SQL,
    NOT_NAN_FILTER_SQL,
    finite_or_null,
    nan_as_null,
    round_ties_down,
)

# The oracle-side twins, pre-formatted for the events measurement column —
# every oracle below that applies nan_as_null/finite_or_null on the Spark
# side MUST splice these (ADVICE r11: hand-inlined CASEs drift silently).
_NAN_NULL_VALUE = NAN_AS_NULL_SQL.format(col="value")
_NOT_NAN_VALUE = NOT_NAN_FILTER_SQL.format(col="value")
_FINITE_VALUE = FINITE_OR_NULL_SQL.format(col="value")
from dblp_to_csv_spark.functions.text import WORDS_SQL, words
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table


@register(
    "stats_agg_lineitem",
    tags=("agg", "stats"),
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
               ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
               ROUND(CORR(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
               ROUND(COVAR_SAMP(l_discount, l_tax), 6) + 0.0 AS disc_tax_covar
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def stats_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-based aggregates (stddev/variance/corr/covar): single-pass
    partial+final aggregation of the co-moments — no second scan, no
    collect. Rounded to absorb engine summation-order ulps; ``+ 0.0``
    normalizes IEEE negative zero (DuckDB's ROUND yields -0.0 for tiny
    negative values, Spark's yields +0.0 — the r4 hash mismatch).

    corr is spelled covar/(stddev·stddev) through try_divide: Spark 4
    ANSI's native ``corr`` THROWS DIVIDE_BY_ZERO on a zero-variance group
    (probe-confirmed; DuckDB's CORR returns NULL) — the r10 tied-values
    sweep's catch. Same single scan, same value to 4 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    corr = F.try_divide(
        F.covar_samp("l_quantity", "l_extendedprice"),
        F.stddev_samp("l_quantity") * F.stddev_samp("l_extendedprice"),
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        (F.round(corr, 4) + F.lit(0.0)).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias("disc_tax_covar"),
    )


@register(
    "salted_agg_event_types",
    tags=("agg", "skew"),
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY event_type
    """,
)
def salted_agg_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: event_type has only 5 values
    (every row hits one of 5 reduce keys — the textbook hot-key shape), so
    phase 1 aggregates on (event_type, salt) spreading each hot key over 16
    reducers, and phase 2 combines the 5×16 partials. Same result as a
    direct groupBy (the oracle), different shuffle profile: no single
    reducer ever sees a whole hot key's rows.

    The salt is deterministic (event_id % 16) so the query remains
    hash-verifiable; a production salt can be anything uniform."""
    ev = load_table(spark, sf_dir, "events")
    salt = (F.col("event_id") % 16).alias("salt")
    partial = ev.groupBy("event_type", salt).agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("psum"), 4).alias("sum_value"),
    )


@register(
    "skew_join_salted_events",
    tags=("join", "skew"),
    oracle="""
        WITH f AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN 0
                        ELSE 1 + (event_id % 99) END AS hot_key,
                   value
            FROM events
        ),
        d AS (
            SELECT p_partkey % 100 AS dk, MIN(p_name) AS dim_label
            FROM part GROUP BY 1
        )
        SELECT f.hot_key, d.dim_label,
               COUNT(*) AS n_events,
               ROUND(SUM(f.value), 4) AS sum_value
        FROM f JOIN d ON d.dk = f.hot_key
        GROUP BY 1, 2
    """,
)
def skew_join_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant SALTED JOIN — the compile-time counterpart of the AQE
    runtime split (tests/test_skew_join.py) for when the build side is too
    big to broadcast: the fact side's hot key (half of all events map to
    key 0 by construction) gets a uniform 16-way salt, and the dim side is
    replicated across all 16 salt values, so the shuffle keys become
    (key, salt) and no reducer ever receives a whole hot key. Same result
    as the plain join (the oracle), different shuffle profile.

    At this test scale the 100-row dim would simply broadcast (making
    salting moot), so the join carries an explicit merge hint to force the
    shuffle plan the technique exists for — the plan gate in
    tests/test_skew_join.py asserts SortMergeJoin on (key, salt). At 100 TB
    the dim side is a replicated-16× table keyed the same way; replication
    factor trades shuffle balance for build-side size exactly like
    salted_agg_event_types' 16 partials."""
    ev = load_table(spark, sf_dir, "events")
    # Salt = pmod(hash(event_id), 16), NOT event_id % 16: the hot-key rule
    # is parity-based (hot key 0 = even event_ids), so a modulo salt is
    # correlated with it — only the 8 even salts would ever carry the hot
    # key, halving the demonstrated fan-out — and a signed % would emit
    # negative salts that never match the dim replicas (ADVICE r13).
    fact = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(1 + F.col("event_id") % 99)
        .alias("hot_key"),
        F.pmod(F.hash("event_id"), F.lit(16)).alias("salt"),
        "value",
    )
    dim = (
        load_table(spark, sf_dir, "part")
        .groupBy((F.col("p_partkey") % 100).alias("dk"))
        .agg(F.min("p_name").alias("dim_label"))
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(15))))
    )
    joined = fact.join(
        dim.hint("merge"),
        (fact["hot_key"] == dim["dk"]) & (fact["salt"] == dim["salt"]),
    )
    return joined.groupBy("hot_key", "dim_label").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "rank_functions_suppliers",
    tags=("window", "rank"),
    oracle="""
        SELECT s_suppkey, s_nationkey,
               CAST(RANK() OVER w AS INT) AS bal_rank,
               CAST(DENSE_RANK() OVER w AS INT) AS bal_dense_rank,
               LEAD(s_suppkey) OVER w AS next_supp,
               ROUND(LEAD(s_acctbal, 2, 0.0) OVER w, 2) AS bal_after_next
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def rank_functions_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lead (with offset+default) per nation over a
    deterministic order."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.lead("s_suppkey").over(w).alias("next_supp"),
        F.round(F.lead("s_acctbal", 2, 0.0).over(w), 2).alias("bal_after_next"),
    )


@register(
    "sorted_page_orders",
    tags=("sort", "limit", "offset"),
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
)
def sorted_page_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order (price DESC, key) + offset 40 +
    limit 20 — Spark pushes the combined limit (60) into partial per-
    partition top-k before the final sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "ntile_order_quartiles",
    tags=("window", "ntile", "demo-global-window"),
    oracle="""
        SELECT o_orderkey,
               CAST(NTILE(4) OVER w AS INT) AS price_quartile,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
               CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def ntile_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO-ONLY (tagged ``demo-global-window``) — never copy this shape
    into a scale path. Distribution window functions (ntile/first_value/
    percent_rank) over a deterministic total order (price with orderkey
    tie-break).

    LIMITATION (inherent, same as every engine's OVER (ORDER BY …) with no
    PARTITION BY): the global window funnels all rows through ONE reducer —
    exact global ranks cannot be computed partition-locally, so this is a
    single-partition sort at 100 TB. The declared scale path is
    `quartile_labels_by_cutpoint`, which computes the same quartile labels
    from percentile cutpoints with no window at all (its plan is CI-gated
    windowless in tests/test_plan_quality.py)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "quartile_labels_by_cutpoint",
    tags=("agg", "broadcast", "scale"),
    oracle="""
        WITH cut AS (
            SELECT ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS q1,
                   ROUND(QUANTILE_CONT(o_totalprice, 0.50), 4) AS q2,
                   ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS q3
            FROM orders
        )
        SELECT o_orderkey, o_totalprice,
               CAST(CASE WHEN o_totalprice <= q1 THEN 1
                         WHEN o_totalprice <= q2 THEN 2
                         WHEN o_totalprice <= q3 THEN 3
                         ELSE 4 END AS INT) AS price_quartile
        FROM orders, cut
    """,
)
def quartile_labels_by_cutpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe quartile labeling — the 100 TB twin of
    `ntile_order_quartiles`: ONE tiny aggregate computes the 25/50/75%
    cutpoints (mergeable, no total sort), broadcast back over the table; each
    row's label is a comparison, fully partition-parallel, no window in the
    plan (asserted by tests/test_scale.py).

    ntile differs at exact-tie boundaries (it splits counts, not values) —
    cutpoint labeling is the semantics a data pipeline usually wants anyway
    (percentile bands). Cutpoints are rounded to 4 dp on both engines so
    boundary comparisons can't diverge by interpolation ulps."""
    o = load_table(spark, sf_dir, "orders")
    cut = (
        o.agg(
            F.percentile(
                "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("q")
        )
        .select(
            F.round(F.col("q")[0], 4).alias("q1"),
            F.round(F.col("q")[1], 4).alias("q2"),
            F.round(F.col("q")[2], 4).alias("q3"),
        )
    )
    return o.join(F.broadcast(cut)).select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("price_quartile"),
    )


@register(
    "outliers_by_mad",
    tags=("agg", "quality", "broadcast"),
    oracle=f"""
        WITH ev AS (
            SELECT event_id,
                   {_NAN_NULL_VALUE} AS value
            FROM events
        ),
        med AS (
            SELECT QUANTILE_CONT(value, 0.5) AS m FROM ev
        ),
        dev AS (
            SELECT QUANTILE_CONT(ABS(value - med.m), 0.5) AS mad, med.m
            FROM ev, med GROUP BY med.m
        )
        SELECT event_id, value,
               ROUND((value - dev.m) / (1.4826 * NULLIF(dev.mad, 0)), 4)
                   AS robust_z
        FROM ev, dev
        WHERE ABS((value - dev.m) / (1.4826 * NULLIF(dev.mad, 0))) > 3
    """,
)
def outliers_by_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |robust z| > 3 where robust z uses the
    median and the median absolute deviation (×1.4826 for normal
    consistency) — immune to the outliers themselves, unlike mean/stddev
    z-scores. Two tiny aggregates (median, then MAD around it) broadcast
    over the table; each row's score is a comparison — the data-quality
    gate a pipeline runs before trusting numeric columns.

    Scores ``events.value`` since round 9 (vacuity audit): orders'
    o_totalprice is a sum of ~4 uniform lineitems, so its robust z never
    exceeds ~1.4 and the |z|>3 filter returned 0 rows at every SF — a
    hash-green driver row that proved nothing. events.value is heavy-
    tailed by generation, yielding a stable non-empty outlier fraction at
    every scale factor (578 rows at sf0.01).

    Degenerate guard: when MAD = 0 (>=half the values identical — e.g. a
    constant column) no robust z exists; NULLIF on BOTH engines makes z NULL
    so the |z|>3 filter returns zero outliers, instead of Spark's NULL
    silently diverging from DuckDB's ±inf. Measurement NaNs are missing
    data (nan_as_null on both engines — the NaN-sweep policy: rank/order
    statistics cannot reconcile the engines' NaN orderings)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", nan_as_null(F.col("value")).alias("value")
    )
    med = ev.agg(F.percentile("value", F.lit(0.5)).alias("m"))
    dev = (
        ev.join(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias("mad"),
            F.first("m").alias("m"),
        )
    )
    z = (F.col("value") - F.col("m")) / (1.4826 * F.nullif(F.col("mad"), F.lit(0.0)))
    return (
        ev.join(F.broadcast(dev))
        .filter(F.abs(z) > 3)
        .select("event_id", "value", F.round(z, 4).alias("robust_z"))
    )


def profile_frame(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Data-profiling report for any frame: one row per column with null
    count, exact distinct count, and min/max (as strings, so heterogeneous
    types stack into one report). ALL metrics ride a single aggregate pass
    (count/count-distinct/min/max are partial/final aggregables), then a
    constant-width unpivot — at 100 TB the profile costs one scan, same as
    any other aggregate, and is the standard post-ingest QA artifact."""
    cols = columns or df.columns
    # aliases are INDEXED, not name-derived, and source references are
    # backtick-quoted, so dotted/odd column names profile cleanly; the
    # frame's row count aggregates once ('__n'), not once per column
    def _ref(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_ref(c)).alias(f"__nn_{i}"),
            F.count_distinct(_ref(c)).alias(f"__d_{i}"),
            F.min(_ref(c)).cast("string").alias(f"__min_{i}"),
            F.max(_ref(c)).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            (F.col("__n") - F.col(f"__nn_{i}")).cast("long").alias("n_nulls"),
            F.col(f"__d_{i}").cast("long").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_value"),
            F.col(f"__max_{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


@register(
    "profile_documents",
    tags=("stats", "agg", "pipeline"),
    oracle="""
        SELECT 'doc_id' AS column,
               CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
               CAST(MIN(doc_id) AS VARCHAR) AS min_value,
               CAST(MAX(doc_id) AS VARCHAR) AS max_value
        FROM documents
        UNION ALL
        SELECT 'lang',
               CAST(COUNT(*) - COUNT(lang) AS BIGINT),
               CAST(COUNT(DISTINCT lang) AS BIGINT),
               MIN(lang), MAX(lang)
        FROM documents
        UNION ALL
        SELECT 'source',
               CAST(COUNT(*) - COUNT(source) AS BIGINT),
               CAST(COUNT(DISTINCT source) AS BIGINT),
               MIN(source), MAX(source)
        FROM documents
        UNION ALL
        SELECT 'n_chars',
               CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
               CAST(COUNT(DISTINCT n_chars) AS BIGINT),
               CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
        FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-ingest data profile of the documents table (id/lang/source/
    n_chars): null counts, exact distinct cardinalities, min/max — the QA
    report a pipeline lands next to every ingested partition. One aggregate
    pass for every metric of every column (see profile_frame); the oracle
    spells the same numbers as per-column scans."""
    docs = load_table(spark, sf_dir, "documents")
    return profile_frame(docs, ["doc_id", "lang", "source", "n_chars"])


@register(
    "winsorize_event_values",
    tags=("agg", "percentile", "pipeline"),
    oracle=f"""
        WITH ev AS (
            SELECT event_type,
                   {_NAN_NULL_VALUE} AS value
            FROM events
        ),
        cuts AS (
            SELECT event_type,
                   ROUND(QUANTILE_CONT(value, 0.05), 6) AS p05,
                   ROUND(QUANTILE_CONT(value, 0.95), 6) AS p95
            FROM ev GROUP BY event_type
        )
        SELECT e.event_type, c.p05, c.p95,
               CAST(SUM(CASE WHEN e.value < c.p05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_lo,
               CAST(SUM(CASE WHEN e.value > c.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_hi,
               ROUND(AVG(e.value), 6) AS mean_raw,
               ROUND(AVG(CASE WHEN e.value IS NOT NULL
                              THEN LEAST(GREATEST(e.value, c.p05), c.p95)
                         END), 6) AS mean_winsorized
        FROM ev e JOIN cuts c USING (event_type)
        GROUP BY e.event_type, c.p05, c.p95
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier treatment feature pipelines apply before
    normalizing a heavy-tailed metric: per event type, values clip to the
    exact [p05, p95] interval (Spark ``percentile`` ≡ DuckDB
    ``QUANTILE_CONT``, the median_price_by_status equivalence) and the
    report shows how many rows clipped each side and the mean shift.

    Scale shape: two aggregates over the same event_type key — the
    cutpoint table (one row per type) broadcasts back onto the scan, so
    the corpus passes twice but never shuffles wholesale (the second
    aggregate's exchange carries per-type partials only). The cutpoints
    round to 6 dp BEFORE clipping so both engines clip against the same
    constant (the lang_temperature_resample discipline). Measurement NaNs
    are missing data (nan_as_null, the NaN-sweep policy) — a NaN would
    otherwise win every clip comparison on Spark and crash/poison the
    DuckDB quantile."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", nan_as_null(F.col("value")).alias("value")
    )
    cuts = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("p05"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )
    j = ev.join(F.broadcast(cuts), "event_type")
    v, lo, hi = F.col("value"), F.col("p05"), F.col("p95")
    return j.groupBy("event_type", "p05", "p95").agg(
        F.sum(F.when(v < lo, 1).otherwise(0)).cast("long").alias("n_clipped_lo"),
        F.sum(F.when(v > hi, 1).otherwise(0)).cast("long").alias("n_clipped_hi"),
        F.round(F.avg(v), 6).alias("mean_raw"),
        # NULL must not reach the clip: LEAST/GREATEST skip NULLs on both
        # engines, so an unguarded clip counts every missing measurement as
        # a p05 observation (ADVICE r11) — guard keeps NULL rows out of the
        # winsorized mean exactly as they are out of mean_raw.
        F.round(
            F.avg(F.when(v.isNotNull(), F.least(F.greatest(v, lo), hi))), 6
        ).alias("mean_winsorized"),
    )


BOOTSTRAP_B = 40  # deterministic resamples
# Poisson(1) CDF thresholds as exact shared literals (9 dp): the
# Poissonized bootstrap draws each row's weight per resample from these —
# both engines compare the SAME md5-uniform against the SAME constants.
_POIS1_CDF = [
    ("0.367879441", 0),
    ("0.735758882", 1),
    ("0.919698603", 2),
    ("0.981011843", 3),
    ("0.996340153", 4),
    ("0.999405815", 5),
]
_BOOT_EVENT_TYPE = "purchase"


def _pois_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {w}" for t, w in _POIS1_CDF
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "bootstrap_mean_ci",
    tags=("stats", "sampling", "approx"),
    oracle=f"""
        WITH base AS (
            SELECT event_id, value FROM events
            WHERE event_type = '{_BOOT_EVENT_TYPE}'
        ),
        draws AS (
            SELECT g.b, value,
                   {_pois_weight_sql(
                       "(('0x' || substr(md5('b|' || CAST(g.b AS VARCHAR) "
                       "|| '|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT"
                       " + 0.5) / 4294967296.0"
                   )} AS w
            FROM base, UNNEST(generate_series(0, {BOOTSTRAP_B - 1})) AS g(b)
        ),
        means AS (
            -- a tiny corpus can draw all-zero Poisson weights for a
            -- resample: SUM(w) = 0 would throw under Spark ANSI, so the
            -- resample contributes NULL (skipped by the quantile) on BOTH
            -- engines (r10 tiny-corpus sweep)
            SELECT b, CASE WHEN SUM(w) > 0
                           THEN ROUND(SUM(w * value) / SUM(w), 4) END AS m
            FROM draws GROUP BY b
        )
        SELECT CAST({BOOTSTRAP_B} AS BIGINT) AS n_resamples,
               ROUND((SELECT AVG(value) FROM base), 4) AS mean_full,
               ROUND(QUANTILE_CONT(m, 0.025), 4) AS ci_lo,
               ROUND(QUANTILE_CONT(m, 0.975), 4) AS ci_hi
        FROM means
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval WITHOUT rand(): the Poissonized
    bootstrap (each row enters resample b with weight ~ Poisson(1),
    the large-n limit of multinomial resampling) driven by md5-uniform
    draws keyed on (resample, event_id) — deterministic, retry-stable,
    engine-exact, the same discipline as every sampler here. Gives the
    95% CI of the mean purchase value from {BOOTSTRAP_B} resamples —
    uncertainty quantification as a QUERY, no statistics service.

    Scale shape: the resample axis fans out IN-ROW (sequence+explode,
    the mixture-upsampling idiom — B×rows only ever exists inside the
    scan task), the per-resample means are one map-side-combinable
    aggregate on b (B groups), and the quantile runs over B rows. Means
    round at 4 dp: the weighted sums span ~|subset| terms, so the 1e-4
    grid sits orders of magnitude above engine summation-order ulps."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == _BOOT_EVENT_TYPE
    ).select("event_id", "value")
    b = F.col("b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("b|"),
                        b.cast("string"),
                        F.lit("|"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    w = F.lit(6)
    for t, k in reversed(_POIS1_CDF):
        w = F.when(u < float(t), k).otherwise(w)
    draws = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_B - 1))).alias("b"),
        "event_id",
        "value",
    ).select(b, w.alias("w"), "value")
    means = draws.groupBy("b").agg(
        F.round(
            F.when(
                F.sum("w") > 0,
                F.sum(F.col("w") * F.col("value")) / F.sum("w"),
            ),
            4,
        ).alias("m")
    )
    full = ev.agg(F.round(F.avg("value"), 4).alias("mean_full"))
    return means.agg(
        F.lit(BOOTSTRAP_B).cast("long").alias("n_resamples"),
        F.round(F.percentile("m", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 4).alias("ci_hi"),
    ).crossJoin(F.broadcast(full)).select(
        "n_resamples", "mean_full", "ci_lo", "ci_hi"
    )


@register(
    "regression_moments_lineitem",
    tags=("agg", "stats", "regression"),
    oracle="""
        SELECT l_returnflag,
               CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
               ROUND(REGR_AVGX(l_extendedprice, l_quantity), 4) AS avg_x,
               ROUND(REGR_AVGY(l_extendedprice, l_quantity), 2) AS avg_y,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 3) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept,
               ROUND(REGR_R2(l_extendedprice, l_quantity), 6) + 0.0 AS r2
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def regression_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per group via the REGR_* moment aggregates (y =
    l_extendedprice on x = l_quantity): slope/intercept/R² come from one
    partial+final co-moment aggregation — the distributed shape for fitting
    millions of tiny per-group models (one per key) without any solver or
    second scan. Rounding absorbs summation-order ulps (slope/intercept are
    ratios of two large co-moment sums: relative fp error ~1e-11, so 3/2 dp
    on magnitudes ~1e3 is far outside the noise); ``+ 0.0`` normalizes
    IEEE -0.0 as in stats_agg_lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 2).alias("avg_y"),
        F.round(F.regr_slope(y, x), 3).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("r2"),
    )


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): d×w counter matrix,
# est(x) = min_j cells[j][h_j(x)]. Unlike the engine-native HLL/GK sketches
# (approx_distinct_users / approx_percentile_prices, rows-only by design),
# the CM construction is pure arithmetic over a portable hash, so the WHOLE
# sketch — build, point queries, overestimate — gets a DuckDB oracle twin.
# --------------------------------------------------------------------------
CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 256  # counters per row
CM_TOPK = 20  # report the top-k true-frequency words

# Portable per-(row, word) hash: md5 of the salted word, first 8 hex chars
# as an int, mod width — the SimHash/MinHash slice trick with a row salt.
_CM_HASH_SQL = (
    "('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || word), 1, 8))::BIGINT"
    f" % {CM_WIDTH}"
)


@register(
    "sketch_countmin_words",
    tags=("sketch", "approx", "text"),
    oracle=f"""
        WITH tok AS (
            SELECT UNNEST({{words}}) AS word FROM documents
        ),
        freq AS (SELECT word, COUNT(*) AS true_count FROM tok GROUP BY word),
        rows_ AS (SELECT UNNEST(generate_series(0, {CM_DEPTH - 1})) AS j),
        cells AS (
            SELECT j, {_CM_HASH_SQL} AS col, COUNT(*) AS c
            FROM tok CROSS JOIN rows_
            GROUP BY 1, 2
        ),
        top AS (
            SELECT word, true_count FROM freq
            ORDER BY true_count DESC, word LIMIT {CM_TOPK}
        )
        SELECT word, true_count,
               MIN(c) AS est_count,
               MIN(c) - true_count AS overestimate
        FROM (
            SELECT top.word, top.true_count, cells.c
            FROM top CROSS JOIN rows_ AS r
            JOIN cells ON cells.j = r.j
                      AND cells.col = ('0x' || substr(
                              md5(CAST(r.j AS VARCHAR) || ':' || top.word),
                              1, 8))::BIGINT % {CM_WIDTH}
        )
        GROUP BY word, true_count
    """.format(words=WORDS_SQL.format(col="text")),
)
def sketch_countmin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus word stream: build the 4×256 counter
    matrix in one hash aggregate, then answer point queries (the top-20
    true-frequency words) as min over the 4 hashed cells. Output carries the
    true count and the overestimate so the CM guarantee (est ≥ true,
    est ≤ true + εN w.h.p.) is visible in the result itself.

    Build = explode words × 4 row salts → groupBy (j, col) count: map-side
    combine collapses every partition to ≤1024 cells, so the shuffle moves
    kilobytes regardless of corpus size — the reason CM beats exact counting
    at 100 TB when only heavy hitters matter. The 1024-cell sketch and the
    top-k list both broadcast; nothing about the query side touches the
    corpus again. Portable md5-slice hashing keeps the sketch bit-identical
    across engines (full DuckDB oracle, unlike the native HLL/GK sketches)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words("text")).alias("word"))
    rows = spark.range(CM_DEPTH).select(F.col("id").alias("j"))
    salted = tok.crossJoin(F.broadcast(rows))
    col = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("j").cast("string"), "word")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % CM_WIDTH
    )
    cells = salted.select("j", col.alias("col")).groupBy("j", "col").agg(
        F.count("*").alias("c")
    )
    top = (
        tok.groupBy("word")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), "word")
        .limit(CM_TOPK)
    )
    probes = top.crossJoin(F.broadcast(rows)).select(
        "word", "true_count", "j", col.alias("col")
    )
    est = probes.join(F.broadcast(cells), ["j", "col"]).groupBy(
        "word", "true_count"
    ).agg(F.min("c").alias("est_count"))
    return est.select(
        "word",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overestimate"),
    )



# --------------------------------------------------------------------------
# Two-pass heavy hitters: Misra-Gries candidate generation (Misra & Gries
# 1982; mergeable-summaries form of Agarwal et al., PODS'12) + exact
# recount. THE way to answer "which keys exceed phi of the stream" at
# 100 TB when the distinct-key space is too large to groupBy wholesale:
# pass 1 never shuffles (a narrow per-partition counter summary bounded at
# k entries), pass 2 shuffles ONLY rows matching the tiny candidate set.
# The MG guarantee makes the final answer exact, not approximate: any key
# with global frequency >= phi*n is phi-frequent in at least one partition
# (pigeonhole), survives that partition's MG(k) with k+1 > 1/phi, and the
# exact recount then filters the superset down to precisely the keys the
# oracle's full GROUP BY finds — independent of partitioning.
# --------------------------------------------------------------------------
HH_PHI = 0.004  # report words carrying >= 0.4% of all token occurrences
HH_K = int(1 / HH_PHI) + 1  # counter budget: k+1 > 1/phi


def mg_partition_summaries(tok: DataFrame, k: int = HH_K) -> DataFrame:
    """Per-partition Misra-Gries(k) summaries via mapInPandas, built by the
    MERGE rule rather than the per-token loop so each Arrow batch is
    processed vectorized: batch value_counts is an exact summary; merging
    adds counters, subtracts the (k+1)-th largest value, and drops the
    non-positive — the standard mergeable-summary step, preserving
    count_est(x) >= count_true(x) - n_p/(k+1) per partition."""
    import pandas as pd

    def mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = counters.add(pdf["word"].value_counts(), fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = (counters - cut)[lambda s: s > 0]
        # list-of-str construction: an EMPTY partition's Series carries a
        # RangeIndex (int64) that Arrow would reject against the string
        # schema
        yield pd.DataFrame(
            {
                "word": [str(w) for w in counters.index],
                "lb": [int(v) for v in counters.values],
            }
        )

    return tok.mapInPandas(mg, "word string, lb long")


@register(
    "heavy_hitters_words",
    tags=("sketch", "text", "agg"),
    oracle=f"""
        WITH tok AS (
            SELECT UNNEST({WORDS_SQL.format(col="text")}) AS word
            FROM documents
        ),
        n AS (SELECT COUNT(*) AS total FROM tok)
        SELECT word,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND((COUNT(*) * 1.0 / total) - 5e-13, 6) + 0.0 AS share
        FROM tok CROSS JOIN n
        GROUP BY word, total
        HAVING COUNT(*) >= CEIL({HH_PHI} * total)
    """,
)
def heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-frequent words by MG-candidates + recount: pass 1 reduces
    each partition to a <= {HH_K}-entry counter summary inside the scan (no
    shuffle, vectorized Arrow batches); pass 2 semi-joins the corpus
    against the broadcast candidate set and aggregates only those rows.
    The oracle is the full GROUP BY ... HAVING — the two-pass plan must
    reproduce it exactly, which is precisely the MG no-false-negative
    guarantee. Integer threshold (CEIL) and tie-down share rounding keep
    the comparison engine-exact."""
    # fan-out-gated scan (guide §2.5): COUNT aggregates are order-exact, and
    # the MG candidate pass is partitioning-independent BY CONTRACT (the
    # recount + HAVING reproduce the exact GROUP BY for any summary set).
    docs = fan_out_small(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(F.explode(words("text")).alias("word"))
    cand = mg_partition_summaries(tok).select("word").distinct()
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    recount = (
        tok.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(HH_PHI) * F.col("total")))
        .select(
            "word",
            F.col("cnt").cast("long").alias("cnt"),
            round_ties_down(F.col("cnt") * 1.0 / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


# --------------------------------------------------------------------------
# Welch's two-sample t-test (unequal variances): the A/B-experiment readout.
# --------------------------------------------------------------------------
_AB_GROUP_A = "purchase"
_AB_GROUP_B = "click"


@register(
    "ab_test_welch",
    tags=("stats", "agg"),
    oracle=f"""
        WITH g AS (
            -- NaN/Inf-sweep policy: the t test is defined over FINITE
            -- measurements (DuckDB VAR_SAMP throws on NaN AND Inf); n
            -- counts valid observations, matching avg/var's basis
            SELECT event_type,
                   COUNT({_FINITE_VALUE}) AS n,
                   AVG({_FINITE_VALUE}) AS m,
                   VAR_SAMP({_FINITE_VALUE}) AS s2
            FROM events
            WHERE event_type IN ('{_AB_GROUP_A}', '{_AB_GROUP_B}')
            GROUP BY event_type
        ),
        w AS (
            SELECT
                MAX(CASE WHEN event_type = '{_AB_GROUP_A}' THEN n END) AS n_a,
                MAX(CASE WHEN event_type = '{_AB_GROUP_A}' THEN m END) AS m_a,
                MAX(CASE WHEN event_type = '{_AB_GROUP_A}' THEN s2 END) AS s2_a,
                MAX(CASE WHEN event_type = '{_AB_GROUP_B}' THEN n END) AS n_b,
                MAX(CASE WHEN event_type = '{_AB_GROUP_B}' THEN m END) AS m_b,
                MAX(CASE WHEN event_type = '{_AB_GROUP_B}' THEN s2 END) AS s2_b
            FROM g
        )
        SELECT CAST(n_a AS BIGINT) AS n_a, ROUND(m_a, 6) AS mean_a,
               CAST(n_b AS BIGINT) AS n_b, ROUND(m_b, 6) AS mean_b,
               ROUND(m_a - m_b, 6) AS mean_diff,
               ROUND(CASE WHEN s2_a / n_a + s2_b / n_b > 0
                          THEN (m_a - m_b) / sqrt(s2_a / n_a + s2_b / n_b)
                     END, 6) AS t_stat,
               ROUND(CASE WHEN POW(s2_a / n_a, 2) / (n_a - 1)
                               + POW(s2_b / n_b, 2) / (n_b - 1) > 0
                          THEN POW(s2_a / n_a + s2_b / n_b, 2)
                               / (POW(s2_a / n_a, 2) / (n_a - 1)
                                  + POW(s2_b / n_b, 2) / (n_b - 1))
                     END, 4) AS welch_df
        FROM w
    """,
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic comparing `value`
    between two event types (the A/B readout over an event log), with the
    Welch–Satterthwaite effective degrees of freedom.

    One conditional hash aggregate computes both arms' (n, mean, s²) in a
    single corpus pass — partial aggregation collapses map-side, the final
    arithmetic runs on a 1-row frame. The filter on the two arms reaches
    the parquet scan (PushedFilters: In(event_type)); at 100 TB this is a
    pruned single-scan job with a kilobyte shuffle. The test is defined
    over FINITE measurements (finite_or_null; DuckDB's VAR_SAMP throws
    outright on NaN or Inf input — the NaN/Inf-sweep policy), and n
    counts valid observations."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_AB_GROUP_A, _AB_GROUP_B)
    ).select("event_type", finite_or_null(F.col("value")).alias("value"))
    arm = lambda t, c: F.max(F.when(F.col("event_type") == t, c))
    g = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
    )
    w = g.agg(
        arm(_AB_GROUP_A, F.col("n")).alias("n_a"),
        arm(_AB_GROUP_A, F.col("m")).alias("m_a"),
        arm(_AB_GROUP_A, F.col("s2")).alias("s2_a"),
        arm(_AB_GROUP_B, F.col("n")).alias("n_b"),
        arm(_AB_GROUP_B, F.col("m")).alias("m_b"),
        arm(_AB_GROUP_B, F.col("s2")).alias("s2_b"),
    )
    se2 = F.col("s2_a") / F.col("n_a") + F.col("s2_b") / F.col("n_b")
    # Degenerate arms (zero sample variance in BOTH arms, n>=2 each) make
    # se2 = 0: under ANSI mode a bare division would throw DIVIDE_BY_ZERO,
    # so guard both the t statistic and the Welch-Satterthwaite denominator
    # — NULL, mirroring the oracle's CASE WHEN (same class of fix as
    # ab_test_mann_whitney's sigma2 > 0 guard).
    df_denom = F.pow(F.col("s2_a") / F.col("n_a"), 2) / (F.col("n_a") - 1) + F.pow(
        F.col("s2_b") / F.col("n_b"), 2
    ) / (F.col("n_b") - 1)
    return w.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.round("m_a", 6).alias("mean_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("m_b", 6).alias("mean_b"),
        F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        F.round(
            F.when(se2 > 0, (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)), 6
        ).alias("t_stat"),
        F.round(F.when(df_denom > 0, F.pow(se2, 2) / df_denom), 4).alias(
            "welch_df"
        ),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002; the
# bottom-k theta sketch): keep the k smallest hash values of the key set;
# D ≈ (k−1)/v_k. Engine-portable md5 hashing makes the whole estimator —
# and its set-operation algebra — DuckDB-oracle-checkable, the property the
# native HLL sketch (approx_distinct_users) can't give.
# --------------------------------------------------------------------------
KMV_K = 64

# md5-slice → uniform double in (0, 1]: first 8 hex chars as a 32-bit int,
# +1 so 0 is excluded (v_k = 0 would blow up the estimator).
_KMV_HASH_SQL = (
    "((('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT + 1)"
    " / 4294967296.0)"
)


def _kmv_hash() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)


@register(
    "sketch_kmv_distinct",
    tags=("sketch", "approx"),
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT event_type, {_KMV_HASH_SQL} AS v FROM events
        ),
        ranked AS (
            SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                       AS rn
            FROM hashed
        ),
        sk AS (
            SELECT event_type, MAX(v) AS vk, COUNT(*) AS k_used
            FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, COUNT(*) AS n_vals
            FROM hashed GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_vals AS BIGINT) AS exact_distinct,
               ROUND((CASE WHEN k_used < {KMV_K} THEN k_used
                           ELSE ({KMV_K} - 1) / vk END) - 5e-13, 4) + 0.0
                   AS kmv_estimate,
               ROUND((ABS(CASE WHEN k_used < {KMV_K} THEN k_used
                               ELSE ({KMV_K} - 1) / vk END - n_vals)
                      / n_vals) - 5e-13, 4) + 0.0 AS rel_error
        FROM sk JOIN exact USING (event_type)
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event type: hash each key to (0,1],
    keep the k smallest, estimate D = (k−1)/v_k (exact when fewer than k
    keys exist). The output carries the exact count and the realized
    relative error, so the sketch's accuracy is part of the verified result.

    Scale shape: distinct → hash → rank-filter. Spark executes the rank
    filter as WindowGroupLimit (per-partition partial top-k BEFORE the
    exchange — plan-gated), so each partition forwards ≤k hash values per
    group: the sketch property (tiny mergeable state) is realized in the
    physical plan, not just the math. The estimator's ±1/√k error is what
    you trade for never shuffling the key set at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    # Distinct AFTER hashing (matching the oracle's DISTINCT event_type, v):
    # KMV counts distinct HASH values, so two keys colliding in the 32-bit
    # hash must collapse to one v on both engines — distincting raw user_ids
    # first would keep both rows and skew exact_distinct/vk on a collision
    # (probability ~n²/2³³ per event_type, nonzero at larger SFs).
    hashed = ev.select("event_type", _kmv_hash().alias("v")).distinct()
    w = Window.partitionBy("event_type").orderBy("v")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)  # constant bound → WindowGroupLimit
        .groupBy("event_type")
        .agg(F.max("v").alias("vk"), F.count("*").alias("k_used"))
    )
    exact = hashed.groupBy("event_type").agg(F.count("*").alias("n_vals"))
    est = F.when(F.col("k_used") < KMV_K, F.col("k_used")).otherwise(
        (KMV_K - 1) / F.col("vk")
    )
    return sketch.join(exact, "event_type").select(
        "event_type",
        F.col("n_vals").cast("long").alias("exact_distinct"),
        round_ties_down(est, 4).alias("kmv_estimate"),
        round_ties_down(
            F.abs(est - F.col("n_vals")) / F.col("n_vals"), 4
        ).alias("rel_error"),
    )


# KMV set algebra: two sketches union by re-ranking the merged value sets;
# the Jaccard of the pair is the fraction of the union-sketch's k values
# present in both sides (Beyer et al. 2007) — intersection size follows.
_KMV_SET_A = "view"
_KMV_SET_B = "purchase"


@register(
    "sketch_kmv_set_ops",
    tags=("sketch", "approx", "setop"),
    oracle=f"""
        WITH hashed AS (
            SELECT user_id, {_KMV_HASH_SQL} AS v,
                   BOOL_OR(event_type = '{_KMV_SET_A}') AS in_a,
                   BOOL_OR(event_type = '{_KMV_SET_B}') AS in_b
            FROM events
            WHERE event_type IN ('{_KMV_SET_A}', '{_KMV_SET_B}')
            GROUP BY user_id
        ),
        ranked AS (
            SELECT v, in_a, in_b,
                   ROW_NUMBER() OVER (ORDER BY v, in_a, in_b) AS rn,
                   COUNT(*) OVER () AS n_vals
            FROM hashed
        ),
        sketch AS (SELECT * FROM ranked WHERE rn <= LEAST(n_vals, {KMV_K})),
        agg AS (
            -- n_union comes from the EXACT count below (0 on an empty
            -- corpus), not MAX(n_vals) over the sketch (NULL on empty) —
            -- mirroring the Spark side's exact-count broadcast
            SELECT MAX(v) AS vk, CAST(COUNT(*) AS BIGINT) AS k_used,
                   SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) * 1.0
                       / COUNT(*) AS jacc
            FROM sketch
        ),
        exact AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
                   CAST(COUNT(*) FILTER (in_a AND in_b) AS BIGINT)
                       AS exact_intersection
            FROM hashed
        )
        SELECT k_used,
               ROUND((CASE WHEN exact_union <= {KMV_K} THEN exact_union
                           ELSE ({KMV_K} - 1) / vk END) - 5e-13, 4) + 0.0
                   AS est_union,
               ROUND((jacc) - 5e-13, 4) + 0.0 AS est_jaccard,
               ROUND((jacc * CASE WHEN exact_union <= {KMV_K}
                                  THEN exact_union
                                  ELSE ({KMV_K} - 1) / vk END) - 5e-13, 4)
                   + 0.0 AS est_intersection,
               exact_union, exact_intersection
        FROM agg CROSS JOIN exact
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra over two user sets (viewers vs purchasers):
    the union sketch is the k smallest hashes of the merged key set, the
    Jaccard estimate is the fraction of those k values belonging to both
    sides, and |A∩B| ≈ Ĵ · |A∪B|̂ — the theta-sketch intersection recipe,
    fully oracle-checked next to the exact counts.

    One pruned scan (In filter pushed), one per-user aggregate carrying two
    membership bits, one global bottom-k. The bottom-k is orderBy + limit —
    Spark plans TakeOrderedAndProject (each partition forwards its local
    bottom-k, the exchange carries ≤k·partitions rows), NOT a single-
    partition global window. This is how cross-segment overlap/reach is
    answered at 100 TB — sketches merge; exact COUNT DISTINCT intersections
    don't."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KMV_SET_A, _KMV_SET_B)
    )
    hashed = ev.groupBy("user_id").agg(
        F.max(F.col("event_type") == _KMV_SET_A).alias("in_a"),
        F.max(F.col("event_type") == _KMV_SET_B).alias("in_b"),
    ).select(_kmv_hash().alias("v"), "in_a", "in_b")
    # Global bottom-k without a global window: TakeOrderedAndProject.
    # Secondary sort keys pin the cut when two keys hash-collide on v.
    sketch = hashed.orderBy("v", "in_a", "in_b").limit(KMV_K)
    agg = sketch.agg(
        F.max("v").alias("vk"),
        F.count("*").cast("long").alias("k_used"),
        (
            F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
            * 1.0
            / F.count("*")
        ).alias("jacc"),
    )
    exact = hashed.agg(
        F.count("*").cast("long").alias("exact_union"),
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1))
        .cast("long")
        .alias("exact_intersection"),
    )
    agg = agg.crossJoin(
        F.broadcast(exact.select(F.col("exact_union").alias("n_union")))
    )
    est_u = F.when(F.col("n_union") <= KMV_K, F.col("n_union")).otherwise(
        (KMV_K - 1) / F.col("vk")
    )
    # tie-down rounding (functions/rounding.py): jacc = m/64 is dyadic, so
    # ROUND(m/64, 4) sits EXACTLY on a half boundary for m = 2, 6, 10, ...
    # — the one rounding site in the sketch family that is boundary-LIKELY
    # rather than merely boundary-capable.
    return agg.crossJoin(F.broadcast(exact)).select(
        "k_used",
        round_ties_down(est_u, 4).alias("est_union"),
        round_ties_down(F.col("jacc"), 4).alias("est_jaccard"),
        round_ties_down(F.col("jacc") * est_u, 4).alias("est_intersection"),
        "exact_union",
        "exact_intersection",
    )


# --------------------------------------------------------------------------
# Bottom-k quantile sketch: a FIXED-SIZE deterministic uniform sample (the
# k rows with the smallest md5 of their primary key — the hash-reservoir),
# quantiles read off the sample next to the exact answers. Complements
# aqp_sample_estimates (fixed-RATE 1/16 Bernoulli sample, whose size grows
# with the corpus): bottom-k state is k rows no matter the input — the
# mergeable-summary property (min of two bottom-k sets is the bottom-k of
# the union) that makes it a sketch, not a sample.
# --------------------------------------------------------------------------
BOTTOMK_K = 256
_BK_QS = (0.25, 0.5, 0.75, 0.95)
_BK_QS_SQL = "[" + ", ".join(str(q) for q in _BK_QS) + "]"


@register(
    "sketch_bottomk_quantiles",
    tags=("sketch", "approx", "percentile"),
    oracle=f"""
        WITH h AS (
            SELECT l_extendedprice AS val,
                   md5(l_orderkey || '|' || l_linenumber) AS hk
            FROM lineitem
        ),
        samp AS (SELECT val FROM h ORDER BY hk LIMIT {BOTTOMK_K}),
        e AS (SELECT quantile_cont(val, {_BK_QS_SQL}) AS ests FROM samp),
        x AS (
            SELECT quantile_cont(l_extendedprice, {_BK_QS_SQL}) AS exs
            FROM lineitem
        )
        SELECT q,
               ROUND(est - 5e-13, 4) + 0.0 AS est,
               ROUND(exact - 5e-13, 4) + 0.0 AS exact,
               ROUND((CASE WHEN exact <> 0
                           THEN ABS(est - exact) / exact END) - 5e-13, 4)
                   + 0.0 AS rel_error
        FROM (
            SELECT UNNEST({_BK_QS_SQL}) AS q, UNNEST(ests) AS est,
                   UNNEST(exs) AS exact
            FROM e CROSS JOIN x
        )
        WHERE exact IS NOT NULL
    """,
)
def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of l_extendedprice from a bottom-k hash sketch (k=256):
    keep the k rows whose md5(primary key) is smallest — a deterministic
    uniform sample whose size is INDEPENDENT of the corpus — and read the
    interpolated quantiles off it, next to the exact quantiles and the
    realized relative error (the KMV convention: the sketch's accuracy is
    part of the verified result).

    Scale shape: the bottom-k is orderBy(hash).limit(k) — Spark plans
    TakeOrderedAndProject (each partition forwards its LOCAL bottom-k, the
    exchange carries ≤k·partitions rows; plan-gated), never a global sort.
    Bottom-k states merge by union+re-cut, so the sketch distributes the
    way HLL/KMV do; the exact side is the verification twin (a full
    `percentile` aggregate) a production run would drop. md5 row keys make
    the drawn sample — and therefore every estimate — engine-portable
    (same rows in the DuckDB oracle). Empty input → empty result on both
    engines (the exact-side NULL row is filtered)."""
    # fan-out-gated scan (guide §2.5): the bottom-k is TakeOrdered on md5
    # keys (total order) and the exact twin sorts its collected array, so
    # both sides are partitioning-independent.
    li = fan_out_small(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    qs_lit = F.array(*[F.lit(q) for q in _BK_QS])
    hk = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("|"),
            F.col("l_linenumber").cast("string"),
        )
    )
    samp = (
        li.select(F.col("l_extendedprice").alias("val"), hk.alias("hk"))
        .orderBy("hk")
        .limit(BOTTOMK_K)
    )
    e = samp.agg(F.percentile("val", qs_lit).alias("ests"))
    # The exact verification twin buffers every value by design — but as a
    # flat sorted array, not Percentile's per-distinct-value hash map: on a
    # near-all-distinct column the map buys nothing and costs ~2× (measured
    # 2.13 → 1.22 s at sf0.1, r14 s6). The interpolation replicates
    # Percentile.getPercentile BIT-EXACTLY — position = q·(n−1), result =
    # (ceil−pos)·lower + (pos−floor)·higher with the ceil==floor guard —
    # asserted == against F.percentile over adversarial magnitude/dup/edge
    # frames (tests/test_governance_sketch_ops.py). The WHEN(n>0) guard
    # reproduces percentile's NULL on empty input (and keeps element_at
    # unevaluated there — ANSI bounds).
    def _interp(q: float):
        pos = F.lit(q) * (F.col("n") - F.lit(1)).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        lower = F.element_at("a", lo.cast("int") + 1)
        higher = F.element_at("a", hi.cast("int") + 1)
        return F.when(hi == lo, lower).otherwise(
            (hi - pos) * lower + (pos - lo) * higher
        )

    x = (
        li.agg(F.array_sort(F.collect_list("l_extendedprice")).alias("a"))
        .select("a", F.size("a").alias("n"))
        .select(
            F.when(
                F.col("n") > 0, F.array(*[_interp(q) for q in _BK_QS])
            ).alias("exs")
        )
    )
    zipped = (
        e.crossJoin(F.broadcast(x))
        .select(
            F.explode(
                F.arrays_zip(
                    qs_lit.alias("q"), F.col("ests").alias("est"), F.col("exs").alias("exact")
                )
            ).alias("z")
        )
        .select("z.q", "z.est", "z.exact")
        .filter(F.col("exact").isNotNull())
    )
    return zipped.select(
        "q",
        round_ties_down(F.col("est"), 4).alias("est"),
        round_ties_down(F.col("exact"), 4).alias("exact"),
        # CASE guard mirrors the oracle: an all-zero value column (degenerate
        # sweeps) must yield NULL, not an ANSI division error
        round_ties_down(
            F.when(
                F.col("exact") != 0,
                F.abs(F.col("est") - F.col("exact")) / F.col("exact"),
            ),
            4,
        ).alias("rel_error"),
    )


BOTTOMK_GROUP_K = 512
_BKG_QS = (0.5, 0.95)
_BKG_QS_SQL = "[" + ", ".join(str(q) for q in _BKG_QS) + "]"


@register(
    "sketch_bottomk_quantiles_by_group",
    tags=("sketch", "approx", "percentile", "window"),
    oracle=f"""
        WITH h AS (
            -- NaN-sweep policy: NaN measurements are missing — rows keep
            -- their hash-drawn sample slots, quantiles skip them (NULL)
            SELECT event_type,
                   {_NAN_NULL_VALUE} AS val,
                   md5(CAST(event_id AS VARCHAR)) AS hk
            FROM events
        ),
        ranked AS (
            SELECT event_type, val,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hk)
                       AS rn
            FROM h
        ),
        e AS (
            SELECT event_type,
                   quantile_cont(val, {_BKG_QS_SQL}) AS ests
            FROM ranked WHERE rn <= {BOTTOMK_GROUP_K} GROUP BY event_type
        ),
        x AS (
            SELECT event_type,
                   quantile_cont({_NAN_NULL_VALUE}, {_BKG_QS_SQL}) AS exs
            FROM events GROUP BY event_type
        )
        SELECT event_type, q,
               ROUND(est - 5e-13, 4) + 0.0 AS est,
               ROUND(exact - 5e-13, 4) + 0.0 AS exact,
               ROUND((CASE WHEN exact <> 0
                           THEN ABS(est - exact) / ABS(exact) END)
                     - 5e-13, 4) + 0.0 AS rel_error
        FROM (
            SELECT event_type, UNNEST({_BKG_QS_SQL}) AS q,
                   UNNEST(ests) AS est, UNNEST(exs) AS exact
            FROM e JOIN x USING (event_type)
        )
        WHERE exact IS NOT NULL
    """,
)
def sketch_bottomk_quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP bottom-k quantile sketch: p50/p95 of `value` per event
    type from each group's k=BOTTOMK_GROUP_K (512) smallest-md5(event_id)
    rows — the
    "latency percentiles per segment" production ask, answered with
    per-group state that is CONSTANT-SIZE no matter how hot the group.
    Exact per-group quantiles + realized error ride along (the KMV
    convention; production drops the exact side).

    Scale shape: the per-group cut is a rank filter under a constant
    bound, which Spark executes as WindowGroupLimit (plan-gated) — every
    partition forwards ≤k rows PER GROUP before the exchange, the same
    physical shape as sketch_kmv_distinct; the global variant
    (sketch_bottomk_quantiles) uses TakeOrderedAndProject instead because
    it has no grouping key. Hot event types are exactly the case the
    per-partition pre-cut absorbs: a group with 10^9 rows still ships
    ≤k·partitions rows. md5 row keys keep the drawn samples
    engine-portable; empty input → empty result on both engines."""
    ev = load_table(spark, sf_dir, "events")
    qs_lit = F.array(*[F.lit(q) for q in _BKG_QS])
    # NaN-sweep policy: rows keep their hash-drawn slots, quantiles skip
    # the missing values (percentile ignores NULL on both engines)
    h = ev.select(
        "event_type",
        nan_as_null(F.col("value")).alias("val"),
        F.md5(F.col("event_id").cast("string")).alias("hk"),
    )
    w = Window.partitionBy("event_type").orderBy("hk")
    e = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BOTTOMK_GROUP_K)  # constant → WindowGroupLimit
        .groupBy("event_type")
        .agg(F.percentile("val", qs_lit).alias("ests"))
    )
    x = ev.groupBy("event_type").agg(
        F.percentile(nan_as_null(F.col("value")), qs_lit).alias("exs")
    )
    zipped = (
        e.join(x, "event_type")
        .select(
            "event_type",
            F.explode(
                F.arrays_zip(
                    qs_lit.alias("q"),
                    F.col("ests").alias("est"),
                    F.col("exs").alias("exact"),
                )
            ).alias("z"),
        )
        .select("event_type", "z.q", "z.est", "z.exact")
        .filter(F.col("exact").isNotNull())
    )
    return zipped.select(
        "event_type",
        "q",
        round_ties_down(F.col("est"), 4).alias("est"),
        round_ties_down(F.col("exact"), 4).alias("exact"),
        round_ties_down(
            F.when(
                F.col("exact") != 0,
                F.abs(F.col("est") - F.col("exact")) / F.abs(F.col("exact")),
            ),
            4,
        ).alias("rel_error"),
    )


# --------------------------------------------------------------------------
# AQP: approximate aggregates from a deterministic uniform sample, with the
# realized error next to the exact answer. The BlinkDB/quickstats pattern —
# answer COUNT/SUM/median from a 1/16 hash sample and scale up — made
# engine-portable by the md5-prefix draw (same rows on every engine/run),
# so the "approximate" path is itself hash-verifiable.
# --------------------------------------------------------------------------
AQP_HEX_DIGIT = "0"  # md5 first hex char == '0' → exactly-1/16 expected rate
AQP_SCALE = 16


@register(
    "aqp_sample_estimates",
    tags=("approx", "sampling", "agg"),
    oracle=f"""
        WITH sampled AS (
            SELECT o_orderstatus, o_totalprice,
                   substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       = '{AQP_HEX_DIGIT}' AS in_sample
            FROM orders
        ),
        est AS (
            SELECT o_orderstatus,
                   COUNT(*) FILTER (in_sample) * {AQP_SCALE} AS est_count,
                   SUM(o_totalprice) FILTER (in_sample) * {AQP_SCALE}
                       AS est_sum,
                   quantile_cont(o_totalprice, 0.5) FILTER (in_sample)
                       AS sample_p50,
                   COUNT(*) AS exact_count,
                   SUM(o_totalprice) AS exact_sum,
                   quantile_cont(o_totalprice, 0.5) AS exact_p50
            FROM sampled GROUP BY o_orderstatus
        )
        SELECT o_orderstatus,
               CAST(exact_count AS BIGINT) AS exact_count,
               CAST(est_count AS BIGINT) AS est_count,
               ROUND(ABS(est_count - exact_count) * 1.0 / exact_count, 4)
                   AS count_rel_err,
               ROUND(exact_sum, 2) AS exact_sum,
               ROUND(est_sum, 2) AS est_sum,
               ROUND(ABS(est_sum - exact_sum) / exact_sum, 4) AS sum_rel_err,
               ROUND(exact_p50, 4) AS exact_p50,
               ROUND(sample_p50, 4) AS sample_p50
        FROM est
    """,
)
def aqp_sample_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-based approximate query processing: per-status COUNT, SUM,
    and median answered from the deterministic 1/16 md5 sample (scaled up),
    reported NEXT TO the exact answers and realized errors — the dashboard
    pattern where a 6% scan answers in 1/16th the IO and the error column
    says whether that was good enough.

    Both the sample and exact aggregates come from ONE scan and ONE
    conditional hash aggregate (FILTER-style conditional aggregation — the
    sample is a flag, not a second read). At 100 TB the production shape
    drops the exact columns and the scan reads 1/16 of the row groups when
    the sample flag is materialized as a partition/layout key at ingest;
    here both sides are kept so the error is part of the verified output.
    The md5 draw makes the sample identical across engines, so even the
    approximate numbers hash-match the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    in_s = (
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
        == AQP_HEX_DIGIT
    )
    price_s = F.when(in_s, F.col("o_totalprice"))
    est = orders.groupBy("o_orderstatus").agg(
        F.count(F.when(in_s, 1)).alias("s_count"),
        F.sum(price_s).alias("s_sum"),
        F.percentile(price_s, 0.5).alias("sample_p50_raw"),
        F.count("*").alias("exact_count"),
        F.sum("o_totalprice").alias("exact_sum_raw"),
        F.percentile(F.col("o_totalprice"), 0.5).alias("exact_p50_raw"),
    )
    est_count = F.col("s_count") * AQP_SCALE
    est_sum = F.col("s_sum") * AQP_SCALE
    return est.select(
        "o_orderstatus",
        F.col("exact_count").cast("long").alias("exact_count"),
        est_count.cast("long").alias("est_count"),
        F.round(
            F.abs(est_count - F.col("exact_count")) * 1.0 / F.col("exact_count"), 4
        ).alias("count_rel_err"),
        F.round("exact_sum_raw", 2).alias("exact_sum"),
        F.round(est_sum, 2).alias("est_sum"),
        F.round(F.abs(est_sum - F.col("exact_sum_raw")) / F.col("exact_sum_raw"), 4).alias(
            "sum_rel_err"
        ),
        F.round("exact_p50_raw", 4).alias("exact_p50"),
        F.round("sample_p50_raw", 4).alias("sample_p50"),
    )


# --------------------------------------------------------------------------
# Equi-width histogram: the profiling/visualization primitive.
# --------------------------------------------------------------------------
HIST_BINS = 16


@register(
    "histogram_equiwidth_prices",
    tags=("stats", "agg", "profiling"),
    oracle=f"""
        WITH bounds AS (
            SELECT MIN(l_extendedprice) AS lo,
                   MAX(l_extendedprice) AS hi,
                   COUNT(*) AS total
            FROM lineitem
        ),
        binned AS (
            -- guard on the WIDTH (hi - lo can be a denormal that
            -- underflows width to exactly 0.0 with hi <> lo; see the
            -- Spark docstring)
            SELECT CASE WHEN (bounds.hi - bounds.lo) / 16 = 0 THEN 0
                        ELSE LEAST(CAST(FLOOR((l_extendedprice - bounds.lo)
                          / ((bounds.hi - bounds.lo) / {HIST_BINS})) AS BIGINT),
                         {HIST_BINS - 1}) END AS bin
            FROM lineitem, bounds
        )
        SELECT bin,
               ROUND(bounds.lo + bin * ((bounds.hi - bounds.lo) / {HIST_BINS}), 6)
                   AS bin_lo,
               ROUND(bounds.lo + (bin + 1) * ((bounds.hi - bounds.lo) / {HIST_BINS}), 6)
                   AS bin_hi,
               COUNT(*) AS n,
               ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(bounds.total AS DOUBLE), 6)
                   AS frac
        FROM binned, bounds
        GROUP BY bin, bounds.lo, bounds.hi, bounds.total
    """,
)
def histogram_equiwidth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice in HIST_BINS=16 bins — the
    profiling primitive behind every distribution dashboard and the
    optimizer-statistics shape (Spark's own CBO column histograms are built
    exactly like this).

    Two passes over the column, both trivially parallel: a (min, max, count)
    bounds aggregate that collapses to ONE row (broadcast to every task),
    then a bin-assignment projection feeding a 16-group hash
    aggregate — partial aggregation collapses each partition to ≤16
    rows, so the shuffle moves kilobytes at any corpus size. Bin arithmetic
    is the same IEEE expression on both engines (floor((x−lo)/width) with
    the top edge clamped into the last bin), so the histogram hash-matches
    the oracle exactly. A ZERO width maps every row to bin 0 on both
    engines instead of dividing by zero (Spark ANSI would raise; the guard
    is a CASE branch, so the division never runs). The guard is on the
    WIDTH, not hi == lo: a denormal range (hi − lo < 16·DBL_MIN_DENORMAL)
    UNDERFLOWS (hi−lo)/16 to exactly 0.0 with hi ≠ lo — the property suite
    falsified the hi == lo guard with prices [0.0, 5e-324], where Spark
    threw DIVIDE_BY_ZERO while DuckDB rode x/0 = inf into the top bin."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count("*").alias("total"),
    )
    width = (F.col("hi") - F.col("lo")) / HIST_BINS
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.when(width == 0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("l_extendedprice") - F.col("lo")) / width
                ).cast("long"),
                F.lit(HIST_BINS - 1).cast("long"),
            )
        )
        .alias("bin"),
        "lo",
        "hi",
        "total",
    )
    return (
        binned.groupBy("bin", "lo", "hi", "total")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("lo") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
            "n",
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("frac"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit audit: the forensic data-quality screen.
# --------------------------------------------------------------------------


@register(
    "benford_digit_audit",
    tags=("stats", "agg", "quality"),
    oracle="""
        WITH digits AS (
            SELECT CAST(FLOOR(o_totalprice
                       / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit
            FROM orders
            WHERE o_totalprice > 0
        ),
        counted AS (
            SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
        ),
        total AS (SELECT SUM(n) AS total_n FROM counted),
        scored AS (
            SELECT digit, n,
                   CAST(n AS DOUBLE) / CAST(total.total_n AS DOUBLE)
                       AS observed_p,
                   LOG10(1.0 + 1.0 / digit) AS expected_p,
                   total.total_n AS total_n
            FROM counted, total
        ),
        chi AS (
            SELECT SUM(
                POWER(n - total_n * expected_p, 2) / (total_n * expected_p)
            ) AS chi2 FROM scored
        )
        SELECT digit,
               CAST(n AS BIGINT) AS n,
               ROUND(observed_p, 6) AS observed_p,
               ROUND(expected_p, 6) AS expected_p,
               ROUND(chi.chi2, 4) AS chi2_total
        FROM scored, chi
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals: the
    forensic screen for fabricated or truncated numeric columns (naturally
    occurring multi-scale amounts follow P(d) = log10(1+1/d); injected or
    clamped data does not). Emits the observed vs expected digit
    distribution plus the Pearson chi-square statistic against Benford.

    One scan: the first digit is pure arithmetic
    (floor(x / 10^floor(log10 x)) — both engines' log10 is exact on powers
    of ten, so the digit never straddles an ulp), the digit histogram is a
    9-group hash aggregate with map-side collapse, and the chi-square folds
    the 9-row table through a 1-row broadcast. At 100 TB this is the
    cheapest audit in the book: kilobytes of shuffle, no joins against the
    fact table."""
    digits = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("digit")
        )
    )
    counted = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = counted.agg(F.sum("n").alias("total_n"))
    scored = counted.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total_n").cast("double")).alias(
            "observed_p"
        ),
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")).alias("expected_p"),
        "total_n",
    )
    chi = scored.agg(
        F.sum(
            F.pow(F.col("n") - F.col("total_n") * F.col("expected_p"), 2)
            / (F.col("total_n") * F.col("expected_p"))
        ).alias("chi2")
    )
    return scored.crossJoin(F.broadcast(chi)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round("observed_p", 6).alias("observed_p"),
        F.round("expected_p", 6).alias("expected_p"),
        F.round("chi2", 4).alias("chi2_total"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U: the nonparametric A/B readout (rank-sum, tie-corrected).
# --------------------------------------------------------------------------
_MW_GROUP_A = "purchase"
_MW_GROUP_B = "click"


@register(
    "ab_test_mann_whitney",
    tags=("stats", "agg", "window"),
    oracle=f"""
        WITH arms AS (
            -- rank statistics are undefined over missing measurements:
            -- NULL and NaN rows leave the pool entirely (NaN-sweep policy;
            -- the engines' NaN/NULL orderings are irreconcilable in the
            -- cumulative rank window). isnan(NULL) is NULL so one
            -- predicate excludes both.
            SELECT value, event_type FROM events
            WHERE event_type IN ('{_MW_GROUP_A}', '{_MW_GROUP_B}')
              AND {_NOT_NAN_VALUE}
        ),
        grp AS (
            SELECT value,
                   COUNT(*) FILTER (event_type = '{_MW_GROUP_A}') AS na,
                   COUNT(*) FILTER (event_type = '{_MW_GROUP_B}') AS nb
            FROM arms GROUP BY value
        ),
        ranked AS (
            SELECT na, nb, na + nb AS t,
                   COALESCE(SUM(na + nb) OVER (
                       ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM grp
        ),
        agg AS (
            SELECT CAST(SUM(na) AS BIGINT) AS n_a,
                   CAST(SUM(nb) AS BIGINT) AS n_b,
                   CAST(SUM(na) + SUM(nb) AS BIGINT) AS n,
                   CAST(SUM(na * (2 * cum_before + t + 1)) AS BIGINT) AS r2a,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term,
                   CAST(SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS tie_groups
            FROM ranked
        ),
        stats AS (
            SELECT n_a, n_b, n, tie_groups,
                   (r2a - n_a * (n_a + 1)) / 2.0 AS u_a,
                   CAST(n_a * n_b AS DOUBLE) / 2.0 AS mean_u,
                   CASE WHEN n > 1 THEN
                       (CAST(n_a * n_b AS DOUBLE) / 12.0)
                       * (CAST(n + 1 AS DOUBLE)
                          - CAST(tie_term AS DOUBLE)
                            / CAST(n * (n - 1) AS DOUBLE))
                   END AS sigma2
            FROM agg
        )
        SELECT n_a, n_b, tie_groups,
               ROUND(u_a, 2) AS u_a,
               ROUND(mean_u, 2) AS mean_u,
               CASE WHEN sigma2 > 0
                    THEN ROUND((u_a - mean_u) / SQRT(sigma2), 6)
               END AS z
        FROM stats
    """,
)
def ab_test_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing `value` between two
    event arms — the nonparametric twin of `ab_test_welch` for skewed or
    outlier-heavy metrics, with the tie-corrected normal approximation.

    The classic formulation needs a GLOBAL rank of every observation — a
    total sort. This implementation uses the identity that rank sums only
    depend on the grouped value histogram: aggregate both arms' counts per
    distinct value (one hash aggregate over the corpus), then a cumulative
    window over the VALUE DOMAIN (thousands of groups, not billions of
    rows) yields every group's average rank. Doubling the rank
    (2·cum_before + t + 1) keeps the whole computation in BIGINT, so the
    final U/z doubles are bit-identical to the oracle. At 100 TB the only
    corpus-sized operation is the per-value count; the single-partition
    window runs over the bounded distinct-value table — the same
    grouped-domain pattern the drift and quantile operators use."""
    # NULL/NaN measurements leave the rank pool (NaN-sweep policy; note
    # Spark's isnan(NULL) is false, so the null check must be explicit)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_GROUP_A, _MW_GROUP_B)
        & F.col("value").isNotNull()
        & ~F.isnan("value")
    )
    grp = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == _MW_GROUP_A, 1)).alias("na"),
        F.count(F.when(F.col("event_type") == _MW_GROUP_B, 1)).alias("nb"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.select(
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("t"),
        F.coalesce(
            F.sum(F.col("na") + F.col("nb")).over(w), F.lit(0)
        ).alias("cum_before"),
    )
    agg = ranked.agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
        (F.sum("na") + F.sum("nb")).cast("long").alias("n"),
        F.sum(
            F.col("na") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).cast("long").alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term"),
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0))
        .cast("long")
        .alias("tie_groups"),
    )
    u_a = (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)) / 2.0
    mean_u = (F.col("n_a") * F.col("n_b")).cast("double") / 2.0
    # guards (mirrored in the oracle's CASE branches): n <= 1 would divide
    # by zero in the tie correction, and an all-tied pool makes sigma2
    # exactly 0 — both must surface as NULL z, not an ANSI arithmetic error
    sigma2 = F.when(
        F.col("n") > 1,
        ((F.col("n_a") * F.col("n_b")).cast("double") / 12.0)
        * (
            (F.col("n") + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double")
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        "tie_groups",
        F.round(u_a, 2).alias("u_a"),
        F.round(mean_u, 2).alias("mean_u"),
        F.when(
            sigma2 > 0, F.round((u_a - mean_u) / F.sqrt(sigma2), 6)
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation: scoring against broadcast tercile cutpoints.
# --------------------------------------------------------------------------
_RFM_T1 = 0.33333333
_RFM_T2 = 0.66666667


@register(
    "orders_rfm_segments",
    tags=("agg", "segmentation", "warehouse"),
    oracle=f"""
        WITH base AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        ref AS (SELECT MAX(last_order) AS ref_date FROM base),
        rfm AS (
            SELECT o_custkey,
                   CAST(date_diff('day', last_order, ref.ref_date) AS BIGINT)
                       AS recency_days,
                   CAST(frequency AS BIGINT) AS frequency, monetary
            FROM base, ref
        ),
        cut AS (
            SELECT
                quantile_cont(recency_days, CAST({_RFM_T1} AS DOUBLE)) AS r1,
                quantile_cont(recency_days, CAST({_RFM_T2} AS DOUBLE)) AS r2,
                quantile_cont(frequency, CAST({_RFM_T1} AS DOUBLE)) AS f1,
                quantile_cont(frequency, CAST({_RFM_T2} AS DOUBLE)) AS f2,
                quantile_cont(monetary, CAST({_RFM_T1} AS DOUBLE)) AS m1,
                quantile_cont(monetary, CAST({_RFM_T2} AS DOUBLE)) AS m2
            FROM rfm
        ),
        scored AS (
            SELECT o_custkey, recency_days, frequency, monetary,
                   CASE WHEN recency_days <= cut.r1 THEN 3
                        WHEN recency_days <= cut.r2 THEN 2 ELSE 1 END AS r_score,
                   CASE WHEN frequency >= cut.f2 THEN 3
                        WHEN frequency >= cut.f1 THEN 2 ELSE 1 END AS f_score,
                   CASE WHEN monetary >= cut.m2 THEN 3
                        WHEN monetary >= cut.m1 THEN 2 ELSE 1 END AS m_score
            FROM rfm, cut
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
        FROM scored
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    warehouse-classic scoring that feeds churn and campaign models. Each
    customer's three measures are scored 1-3 against GLOBAL tercile
    cutpoints and concatenated into the familiar '333'…'111' segment label
    (recency inverted: recent = high score).

    The naive formulation is three global NTILE windows — three
    single-partition sorts over every customer. This one computes the six
    cutpoints in ONE 1-row percentile aggregate and broadcasts them back as
    a scoring projection: per-customer aggregate (one shuffle on custkey),
    then map-side-only comparisons — the `quartile_labels_by_cutpoint`
    discipline applied to a composite segmentation. Monetary is rounded to
    cents BEFORE cutpoints and comparisons on both engines, so sum-order
    ulp drift can never flip a boundary customer's score.

    The per-customer base aggregate feeds THREE consumers (reference date,
    cutpoints, final scoring); it is parquet-checkpointed once so the
    corpus is scanned exactly once and the rereads touch only the
    customers-sized frame (same rationale as the MinHash candidate
    checkpoint — cache()/localCheckpoint leak storage blocks with no
    unpersist hook in a registered query)."""
    from dblp_to_csv_spark.session import session_checkpoint_dir

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    base_dir = session_checkpoint_dir("_rfm_base_")
    base.write.mode("overwrite").parquet(base_dir)
    base = spark.read.parquet(base_dir)
    ref = base.agg(F.max("last_order").alias("ref_date"))
    rfm = base.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_date", "last_order").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
    )
    cut = rfm.agg(
        F.percentile("recency_days", _RFM_T1).alias("r1"),
        F.percentile("recency_days", _RFM_T2).alias("r2"),
        F.percentile("frequency", _RFM_T1).alias("f1"),
        F.percentile("frequency", _RFM_T2).alias("f2"),
        F.percentile("monetary", _RFM_T1).alias("m1"),
        F.percentile("monetary", _RFM_T2).alias("m2"),
    )
    r_score = (
        F.when(F.col("recency_days") <= F.col("r1"), 3)
        .when(F.col("recency_days") <= F.col("r2"), 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") >= F.col("f2"), 3)
        .when(F.col("frequency") >= F.col("f1"), 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("monetary") >= F.col("m2"), 3)
        .when(F.col("monetary") >= F.col("m1"), 2)
        .otherwise(1)
    )
    return rfm.crossJoin(F.broadcast(cut)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        F.concat(
            r_score.cast("string"), f_score.cast("string"), m_score.cast("string")
        ).alias("segment"),
    )


# --------------------------------------------------------------------------
# ABC / Pareto revenue classification: the inventory-analytics classic.
# --------------------------------------------------------------------------
_ABC_A = 0.8
_ABC_B = 0.95


@register(
    "parts_abc_pareto",
    tags=("agg", "window", "warehouse"),
    oracle=f"""
        WITH rev AS (
            SELECT l_partkey,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100, 0)
                        AS BIGINT) AS rev_cents
            FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
            SELECT l_partkey, rev_cents,
                   SUM(rev_cents) OVER (
                       ORDER BY rev_cents DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_cents,
                   SUM(rev_cents) OVER () AS total_cents
            FROM rev
        )
        SELECT l_partkey,
               ROUND(rev_cents / 100.0, 2) AS revenue,
               ROUND(CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6)
                   AS cum_share,
               CASE WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
                         <= {_ABC_A} THEN 'A'
                    WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
                         <= {_ABC_B} THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    """,
)
def parts_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by discounted revenue: rank
    parts by revenue, take the cumulative share, and label the first 80%
    of revenue 'A', the next 15% 'B', the tail 'C' — the inventory /
    catalog-curation classic ("which 20% of parts carry 80% of revenue").

    Revenue converts to integer CENTS immediately after the per-part
    aggregate, so the cumulative sum, total, and every share comparison is
    integer-exact — no cross-engine float-accumulation drift anywhere near
    a class boundary. The corpus-sized work is the one partkey hash
    aggregate; the cumulative window runs over the PARTS domain (a
    dimension, not the fact table) with a deterministic (revenue DESC,
    partkey) order — the grouped-domain window pattern shared with the
    rank-sum and drift operators."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100, 0)
        .cast("long")
        .alias("rev_cents")
    )
    wcum = (
        Window.orderBy(F.desc("rev_cents"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents").over(wcum).alias("cum_cents"),
        F.sum("rev_cents").over(wall).alias("total_cents"),
    )
    share = F.col("cum_cents").cast("double") / F.col("total_cents").cast("double")
    return ranked.select(
        "l_partkey",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= _ABC_A, "A")
        .when(share <= _ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# --------------------------------------------------------------------------
# Weighted exact percentiles: order statistics over a weighted multiset.
# --------------------------------------------------------------------------
_WPCT_QS = (0.25, 0.5, 0.75)


@register(
    "weighted_percentiles_price",
    tags=("stats", "agg"),
    oracle=f"""
        WITH w AS (
            SELECT l_extendedprice AS p, CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
        ),
        ord AS (
            SELECT p, q,
                   SUM(q) OVER (
                       ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cw
            FROM w
        ),
        tot AS (SELECT SUM(q) AS tw FROM w),
        qs AS (SELECT UNNEST([{", ".join(str(q) for q in _WPCT_QS)}]) AS pq),
        pos AS (
            SELECT qs.pq, qs.pq * (tot.tw - 1) AS pos FROM qs, tot
        ),
        lo AS (
            SELECT pos.pq, pos.pos, MIN(ord.p) AS plo
            FROM pos JOIN ord ON ord.cw >= FLOOR(pos.pos) + 1
            GROUP BY pos.pq, pos.pos
        ),
        hi AS (
            SELECT pos.pq, pos.pos, MIN(ord.p) AS phi
            FROM pos JOIN ord ON ord.cw >= CEIL(pos.pos) + 1
            GROUP BY pos.pq, pos.pos
        )
        SELECT lo.pq AS quantile,
               ROUND(lo.plo + (lo.pos - FLOOR(lo.pos)) * (hi.phi - lo.plo), 6)
                   AS wpct
        FROM lo JOIN hi ON lo.pq = hi.pq
    """,
)
def weighted_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted exact percentiles (p25/p50/p75) of l_extendedprice with
    l_quantity as the frequency weight — order statistics over the
    quantity-expanded multiset ("the median UNIT shipped cost X", not "the
    median line item"). Uses Spark's built-in frequency-weighted
    ``percentile(col, p, freq)``; the oracle reconstructs the identical
    expanded-multiset interpolation from cumulative weights, proving the
    semantics rather than mirroring the engine.

    Spark side: ONE partial/final aggregate over the scan — no expansion,
    no sort of the corpus (the aggregation buffer holds value→weight
    counts). At 100 TB this is the only sane formulation: exploding a
    weighted multiset to take a median is the anti-pattern this operator
    exists to replace."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    agg = li.agg(
        F.percentile(
            F.col("p"), F.array(*[F.lit(q) for q in _WPCT_QS]), F.col("q")
        ).alias("pcts")
    )
    qs = F.array(*[F.lit(q) for q in _WPCT_QS])
    return agg.select(
        F.explode(F.arrays_zip(qs.alias("quantile"), F.col("pcts").alias("wpct"))).alias(
            "z"
        )
    ).select(
        F.col("z.quantile").alias("quantile"),
        F.round(F.col("z.wpct"), 6).alias("wpct"),
    )
