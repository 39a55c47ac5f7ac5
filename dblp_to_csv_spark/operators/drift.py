"""Distribution-drift / dataset-QA operators (SURVEY.md §2.4): the checks a
training pipeline runs BETWEEN dataset versions — two-sample KS drift on a
numeric column, chi-square independence of two categorical columns, and
embedding-space centroid geometry per label.

Scale shape shared by all three: aggregate the corpus FIRST (per-bin / per-
cell / per-(label,dim) partial aggregates, map-side combined), then do the
statistics on the tiny aggregated frame — the global orderings these
statistics need (ECDF prefix sums, cell sums) run over hundreds of rows, not
the corpus. No sampling, no collect, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import (
    NOT_NAN_FILTER_SQL,
    round_ties_down,
)

# Oracle-side missing-measurement predicate, spliced into every drift
# oracle in lockstep with the Spark-side filters (ADVICE r11).
_NOT_NAN_VALUE = NOT_NAN_FILTER_SQL.format(col="value")
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table

KS_GROUP_A = "click"
KS_GROUP_B = "view"


@register(
    "drift_ks_events_value",
    tags=("drift", "stats", "window"),
    oracle=f"""
        WITH binned AS (
            -- NaN-sweep policy: missing measurements (NULL / NaN) belong
            -- to neither ECDF; isnan(NULL) is NULL so one predicate drops
            -- both (the engines order NaN and NULL bins differently in
            -- the cumulative window — irreconcilable otherwise)
            SELECT ROUND(value, 1) AS bin,
                   COUNT(*) FILTER (event_type = '{KS_GROUP_A}') AS ca,
                   COUNT(*) FILTER (event_type = '{KS_GROUP_B}') AS cb
            FROM events
            WHERE event_type IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
              AND {_NOT_NAN_VALUE}
            GROUP BY 1
        ),
        totals AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM binned),
        ecdf AS (
            -- GREATEST(n,1): an empty sample contributes a flat-zero ECDF
            -- instead of a division error; D then reads 1.0 = total drift
            SELECT SUM(ca) OVER (ORDER BY bin) * 1.0 / GREATEST(totals.na, 1) AS fa,
                   SUM(cb) OVER (ORDER BY bin) * 1.0 / GREATEST(totals.nb, 1) AS fb
            FROM binned, totals
        )
        SELECT ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat,
               (SELECT CAST(na AS BIGINT) FROM totals) AS n_a,
               (SELECT CAST(nb AS BIGINT) FROM totals) AS n_b
        FROM ecdf
    """,
)
def drift_ks_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the value
    distributions of two event types: D = max |ECDF_a - ECDF_b| over binned
    values (0.1-wide bins). The drift gate a pipeline runs between dataset
    versions before retraining.

    Exact KS needs a global order over observed values; the scale move is to
    BIN-AGGREGATE first (one shuffle, map-side combined) so the ordered
    prefix-sum window runs over the ~hundreds of distinct bins, not the
    corpus — D is then exact for the binned distributions on both engines.
    The single-partition window over bins is deliberate and bounded."""
    # missing measurements (NULL/NaN) leave both ECDFs — NaN-sweep policy;
    # Spark's isnan(NULL) is false, so the null check is explicit
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(KS_GROUP_A, KS_GROUP_B)
        & F.col("value").isNotNull()
        & ~F.isnan("value")
    )
    binned = ev.groupBy(F.round("value", 1).alias("bin")).agg(
        F.count(F.when(F.col("event_type") == KS_GROUP_A, 1)).alias("ca"),
        F.count(F.when(F.col("event_type") == KS_GROUP_B, 1)).alias("cb"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    # totals ride the same bins-sized frame as unpartitioned windows
    # instead of a crossJoin against a re-aggregation of the lazy binned
    # (which re-scanned events — r11 double-eval audit, ROADMAP 30);
    # greatest(n, 1): an empty sample contributes a flat-zero ECDF instead
    # of an ANSI division error; D then reads 1.0 = total drift
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    ).select(
        (F.sum("ca").over(w) * 1.0 / F.greatest(F.col("na"), F.lit(1))).alias("fa"),
        (F.sum("cb").over(w) * 1.0 / F.greatest(F.col("nb"), F.lit(1))).alias("fb"),
        "na",
        "nb",
    )
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat"),
        F.first("na").alias("n_a"),
        F.first("nb").alias("n_b"),
    )


PSI_REF = "view"
PSI_CUR = "click"
PSI_BINS = 10
_PSI_QS_SQL = "[" + ", ".join(str(i / PSI_BINS) for i in range(1, PSI_BINS)) + "]"


@register(
    "drift_psi_events_value",
    tags=("drift", "stats", "agg"),
    oracle=f"""
        WITH cuts AS (
            -- decile cutpoints of the REFERENCE arm, tie-down-rounded to
            -- 6 dp so both engines bin against bit-identical thresholds
            -- (raw interpolated quantiles can differ by an ulp and flip a
            -- value sitting exactly on a cutpoint)
            SELECT list_transform(quantile_cont(value, {_PSI_QS_SQL}),
                                  c -> ROUND(c - 5e-13, 6) + 0.0) AS cs
            FROM events WHERE event_type = '{PSI_REF}'
              AND {_NOT_NAN_VALUE}
        ),
        binned AS (
            SELECT event_type,
                   list_sum(list_transform(cs,
                       c -> CASE WHEN value > c THEN 1 ELSE 0 END)) AS bin
            -- NaN-sweep policy: missing measurements join neither arm
            FROM events, cuts
            WHERE event_type IN ('{PSI_REF}', '{PSI_CUR}')
              AND {_NOT_NAN_VALUE}
        ),
        counts AS (
            SELECT bin,
                   COUNT(*) FILTER (event_type = '{PSI_REF}') AS ca,
                   COUNT(*) FILTER (event_type = '{PSI_CUR}') AS cb
            FROM binned GROUP BY bin
        ),
        grid AS (
            SELECT b.bin, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
            FROM (SELECT UNNEST(generate_series(0, {PSI_BINS - 1})) AS bin) b
            LEFT JOIN counts USING (bin)
        ),
        tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM grid),
        rates AS (
            -- Laplace-smoothed rates ((c + 0.5)/(n + bins/2)) keep every
            -- bin's log finite — the standard PSI zero-bin guard, made
            -- deterministic instead of an epsilon clamp
            SELECT (ca + 0.5) / (na + {PSI_BINS} * 0.5) AS ra,
                   (cb + 0.5) / (nb + {PSI_BINS} * 0.5) AS rb,
                   na, nb
            FROM grid, tot
        )
        SELECT CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur,
               ROUND(SUM((ra - rb) * ln(ra / rb)) - 5e-13, 6) + 0.0 AS psi
        FROM rates
        GROUP BY na, nb
        HAVING na > 0 AND nb > 0
    """,
)
def drift_psi_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference and current arms'
    value distributions — THE named drift number of ML feature monitoring
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 action): bin the current
    distribution against the REFERENCE arm's decile cutpoints, then
    PSI = Σ (ra − rb)·ln(ra/rb) over the 10 bins (symmetric KL). Completes
    the drift family: KS gives the max ECDF gap, PSI the standard banded
    magnitude against reference deciles.

    Scale shape: one exact-percentile aggregate over the (pruned) reference
    arm produces a 9-value cutpoint row broadcast onto the scan; binning is
    an in-row fold (no range join); per-bin counts collapse map-side to ≤10
    rows; the statistic folds on the 10-row grid with totals as
    unpartitioned windows (the drift-family contract). Cutpoints are
    tie-down-rounded to 6 dp BEFORE binning so both engines compare against
    bit-identical thresholds; Laplace smoothing ((c+0.5)/(n+5)) keeps empty
    bins finite deterministically. Either arm empty → empty result."""
    # missing measurements (NULL/NaN) join neither arm — NaN-sweep policy
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(PSI_REF, PSI_CUR)
        & F.col("value").isNotNull()
        & ~F.isnan("value")
    )
    qs = F.array(*[F.lit(i / PSI_BINS) for i in range(1, PSI_BINS)])
    cuts = (
        ev.filter(F.col("event_type") == PSI_REF)
        .agg(
            F.transform(
                F.percentile("value", qs), lambda c: round_ties_down(c, 6)
            ).alias("cs")
        )
    )
    bin_col = F.aggregate(
        F.col("cs"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
    )
    binned = ev.crossJoin(F.broadcast(cuts)).select(
        "event_type", bin_col.alias("bin")
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("event_type") == PSI_REF, 1)).alias("ca"),
        F.count(F.when(F.col("event_type") == PSI_CUR, 1)).alias("cb"),
    )
    bins = spark.range(PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    grid = bins.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w_all = Window.partitionBy()
    rates = grid.select(
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    ).select(
        ((F.col("ca") + 0.5) / (F.col("na") + PSI_BINS * 0.5)).alias("ra"),
        ((F.col("cb") + 0.5) / (F.col("nb") + PSI_BINS * 0.5)).alias("rb"),
        "na",
        "nb",
    )
    return (
        rates.groupBy("na", "nb")
        .agg(
            round_ties_down(
                F.sum((F.col("ra") - F.col("rb")) * F.log(F.col("ra") / F.col("rb"))),
                6,
            ).alias("psi")
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            F.col("na").cast("long").alias("n_ref"),
            F.col("nb").cast("long").alias("n_cur"),
            "psi",
        )
    )


@register(
    "drift_chi2_source_lang",
    tags=("drift", "stats", "agg"),
    oracle="""
        WITH cells AS (
            SELECT source, lang, COUNT(*) AS obs FROM documents GROUP BY 1, 2
        ),
        rows_ AS (SELECT source, SUM(obs) AS rt FROM cells GROUP BY 1),
        cols_ AS (SELECT lang, SUM(obs) AS ct FROM cells GROUP BY 1),
        n AS (SELECT SUM(obs) AS total FROM cells)
        SELECT ROUND(SUM(POW(obs - rt * ct * 1.0 / total, 2)
                         / (rt * ct * 1.0 / total)), 6) AS chi2,
               CAST((SELECT COUNT(*) FROM rows_) - 1 AS BIGINT)
                   * CAST((SELECT COUNT(*) FROM cols_) - 1 AS BIGINT) AS dof
        FROM cells JOIN rows_ USING (source) JOIN cols_ USING (lang), n
        HAVING COUNT(*) > 0
    """,
)
def drift_chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of source × lang — 'did the language mix
    shift between crawl sources?' (the categorical drift twin of the KS
    gate). One corpus aggregate builds the contingency cells; row/column
    marginals and the statistic come from the cells frame alone (≤
    |sources|×|langs| rows), joined broadcast-small. Note chi2 uses only
    OBSERVED cells — zero cells contribute 0 to the sum, so the sparse cell
    frame is the complete computation."""
    docs = load_table(spark, sf_dir, "documents")
    # the cells frame is referenced FIVE times (marginals, total, the main
    # join, and two dof count actions) — materialize the ≤|sources|×|langs|
    # rows once (eager localCheckpoint: one job, lineage truncated) so the
    # corpus groupBy runs once, not five times (r11 double-eval audit)
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("obs"))
        .localCheckpoint(eager=True)
    )
    rows_ = cells.groupBy("source").agg(F.sum("obs").alias("rt"))
    cols_ = cells.groupBy("lang").agg(F.sum("obs").alias("ct"))
    total = cells.agg(F.sum("obs").alias("total"))
    dof = (
        rows_.count() - 1
    ) * (cols_.count() - 1)  # dims are tiny and fixed; two scalar actions
    exp = F.col("rt") * F.col("ct") * 1.0 / F.col("total")
    return (
        cells.join(F.broadcast(rows_), "source")
        .join(F.broadcast(cols_), "lang")
        .crossJoin(F.broadcast(total))
        .agg(
            F.round(
                F.sum(F.pow(F.col("obs") - exp, 2) / exp), 6
            ).alias("chi2"),
            F.lit(dof).cast("long").alias("dof"),
        )
        # empty corpus: no cells → the global aggregate still emits one
        # (null) row; drop it so both engines return an empty frame
        .filter(F.col("chi2").isNotNull())
    )


@register(
    "drift_mutual_information",
    tags=("drift", "stats", "agg"),
    oracle="""
        WITH cells AS (
            SELECT source, lang, COUNT(*) AS obs FROM documents GROUP BY 1, 2
        ),
        rows_ AS (SELECT source, SUM(obs) AS rt FROM cells GROUP BY 1),
        cols_ AS (SELECT lang, SUM(obs) AS ct FROM cells GROUP BY 1),
        n AS (SELECT SUM(obs) AS total FROM cells),
        mi AS (
            -- divide-before-multiply: rt*ct as integers overflows BIGINT
            -- around 3e9 rows on the Spark side (ANSI throw), so both
            -- engines compute the ratio in doubles the same way
            SELECT SUM((obs * 1.0 / total)
                       * ln((obs * 1.0 / rt) * (total * 1.0 / ct))) AS mi_nats
            FROM cells JOIN rows_ USING (source) JOIN cols_ USING (lang), n
        ),
        h1 AS (
            SELECT -SUM((rt * 1.0 / total) * ln(rt * 1.0 / total)) AS h_source
            FROM rows_, n
        ),
        h2 AS (
            SELECT -SUM((ct * 1.0 / total) * ln(ct * 1.0 / total)) AS h_lang
            FROM cols_, n
        )
        -- tie-down form: a (near-)independent corpus sums mi to a tiny
        -- negative and an entropy of a single-category marginal is -0.0 —
        -- ROUND alone diverges on the -0.0 class (r4 hash-mismatch bug)
        SELECT ROUND(mi_nats - 5e-13, 6) + 0.0 AS mi_nats,
               ROUND(h_source - 5e-13, 6) + 0.0 AS h_source,
               ROUND(h_lang - 5e-13, 6) + 0.0 AS h_lang,
               ROUND((CASE WHEN h_source * h_lang > 0
                           THEN mi_nats / sqrt(h_source * h_lang) END)
                     - 5e-13, 6) + 0.0 AS nmi
        FROM mi, h1, h2
        WHERE mi_nats IS NOT NULL
    """,
)
def drift_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and normalized MI) of source × lang — the
    information-theoretic companion to drift_chi2_source_lang: chi2 answers
    "is the deviation from independence statistically surprising?", MI
    answers "how many nats does knowing the source tell you about the
    language?" — the quantity mixture-balancing actually budgets. NMI =
    MI/√(H(source)·H(lang)) normalizes to [0,1] for cross-version
    comparison; single-category marginals (H = 0) yield NULL, mirroring
    the oracle's CASE.

    Scale shape (the drift-family contract): ONE corpus aggregate builds
    the contingency cells, eagerly checkpointed because FOUR consumers
    read it (marginals ×2, total, the MI join); everything after runs on
    the ≤|sources|×|langs| frame. ln-valued sums are transcendental — the
    tie-down convention's safe class — so ROUND(x, 6) agrees across
    engines. Zero cells contribute 0 by L'Hôpital and never appear in the
    sparse frame; empty corpus → NULL mi → empty result on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("obs"))
        .localCheckpoint(eager=True)
    )
    rows_ = cells.groupBy("source").agg(F.sum("obs").alias("rt"))
    cols_ = cells.groupBy("lang").agg(F.sum("obs").alias("ct"))
    total = cells.agg(F.sum("obs").alias("total"))
    p = F.col("obs") * 1.0 / F.col("total")
    # divide-before-multiply (see the oracle note): rt*ct in BIGINT
    # overflows past ~3e9 corpus rows under ANSI; both engines now take
    # the identical double path
    ratio = (F.col("obs") * 1.0 / F.col("rt")) * (F.col("total") * 1.0 / F.col("ct"))
    mi = (
        cells.join(F.broadcast(rows_), "source")
        .join(F.broadcast(cols_), "lang")
        .crossJoin(F.broadcast(total))
        .agg(F.sum(p * F.log(ratio)).alias("mi_nats"))
    )
    pr = F.col("rt") * 1.0 / F.col("total")
    h1 = rows_.crossJoin(F.broadcast(total)).agg(
        (-F.sum(pr * F.log(pr))).alias("h_source")
    )
    pc = F.col("ct") * 1.0 / F.col("total")
    h2 = cols_.crossJoin(F.broadcast(total)).agg(
        (-F.sum(pc * F.log(pc))).alias("h_lang")
    )
    hh = F.col("h_source") * F.col("h_lang")
    return (
        mi.crossJoin(F.broadcast(h1))
        .crossJoin(F.broadcast(h2))
        .select(
            # tie-down rounding: near-independence sums mi to a tiny
            # negative, single-category entropies are -0.0 — the r4
            # -0.0 hash-divergence class
            round_ties_down(F.col("mi_nats"), 6).alias("mi_nats"),
            round_ties_down(F.col("h_source"), 6).alias("h_source"),
            round_ties_down(F.col("h_lang"), 6).alias("h_lang"),
            round_ties_down(
                F.when(hh > 0, F.col("mi_nats") / F.sqrt(hh)), 6
            ).alias("nmi"),
        )
        .filter(F.col("mi_nats").isNotNull())
    )


@register(
    "embedding_label_centroids",
    tags=("similarity", "stats", "agg"),
    oracle="""
        WITH flat AS (
            SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
            FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
        ),
        cent AS (
            SELECT label, pos, AVG(val) AS m FROM flat GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   SUM(a.m * b.m) AS dot,
                   sqrt(SUM(a.m * a.m)) AS na,
                   sqrt(SUM(b.m * b.m)) AS nb
            FROM cent a JOIN cent b USING (pos)
            WHERE a.label < b.label
            GROUP BY 1, 2
        )
        SELECT label_a, label_b, ROUND(dot / (na * nb), 5) AS centroid_cos
        FROM pairs
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space geometry per label: the pairwise cosine between label
    centroids — the collapse/separability check run on embedding versions
    (labels whose centroids drift together signal a representation
    regression).

    posexplode → per-(label, dim) mean (one map-side-combined aggregate over
    the corpus) → pairwise dot on the centroids frame, which is |labels|×dims
    rows — the all-pairs join happens AFTER the reduction, never on the
    corpus. Sums reassociate across engines, so values round to 5 decimals
    on both sides."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    )
    cent = emb.groupBy("label", F.col("pos0").alias("pos")).agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    a, b = cent.alias("a"), cent.alias("b")
    pairs = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(
            F.sum(F.col("a.m") * F.col("b.m")).alias("dot"),
            F.sqrt(F.sum(F.col("a.m") * F.col("a.m"))).alias("na"),
            F.sqrt(F.sum(F.col("b.m") * F.col("b.m"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 5).alias("centroid_cos"),
    )


@register(
    "drift_chi2_by_window",
    tags=("drift", "stats", "time", "window"),
    oracle="""
        WITH obs AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        gmix AS (
            SELECT event_type, SUM(n) AS nt FROM obs GROUP BY event_type
        ),
        tot AS (SELECT SUM(nt) AS n FROM gmix),
        wtot AS (
            SELECT window_start, SUM(n) AS nw FROM obs GROUP BY window_start
        ),
        grid AS (
            SELECT w.window_start, g.event_type, w.nw,
                   w.nw * g.nt * 1.0 / tot.n AS expected
            FROM wtot w CROSS JOIN gmix g CROSS JOIN tot
        ),
        cells AS (
            SELECT grid.window_start, grid.nw,
                   POWER(COALESCE(obs.n, 0) - grid.expected, 2)
                       / grid.expected AS contrib
            FROM grid LEFT JOIN obs
              ON obs.window_start = grid.window_start
             AND obs.event_type = grid.event_type
        )
        SELECT window_start,
               CAST(MAX(nw) AS BIGINT) AS n_events,
               ROUND(SUM(contrib), 6) AS chi2
        FROM cells GROUP BY window_start
    """,
)
def drift_chi2_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS drift monitoring shape: per 1-hour tumbling window, the
    chi-square statistic of that window's event-type mix against the
    whole-corpus mix — the per-window health number a data-quality monitor
    alerts on (a traffic shift or a broken producer spikes exactly this).
    drift_chi2_source_lang answers "are two columns independent?" once;
    this answers "does any time slice deviate from the norm?" per slice.

    Scale shape: one (window, type) aggregate over the corpus (map-side
    combined; the key space is hours × |event types|), then everything —
    global mix, window totals, the expected grid, the chi-square fold —
    runs on that reduced frame (a cross join of two tiny aggregates, the
    drift-family contract). The same windowed aggregation core runs under
    Structured Streaming with a watermark; the streaming twin's parity
    with this query's counts is pinned in tests/test_streaming.py. ≤ |type|
    float terms per window sum, so 6-dp rounding is hash-stable."""
    ev = load_table(spark, sf_dir, "events")
    # obs is referenced three times (global mix, window totals, the left
    # join back) — materialize the hours×|event types| rows once (eager
    # localCheckpoint) so the corpus groupBy runs once, not three times
    # (same double-eval class as drift_chi2_source_lang, ROADMAP 30)
    obs = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    glob = obs.groupBy("event_type").agg(F.sum("n").alias("nt"))
    tot = glob.agg(F.sum("nt").alias("n_total"))
    wtot = obs.groupBy("window_start").agg(F.sum("n").alias("nw"))
    grid = (
        wtot.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .select(
            "window_start",
            "event_type",
            "nw",
            (F.col("nw") * F.col("nt") * 1.0 / F.col("n_total")).alias("expected"),
        )
    )
    cells = grid.join(obs, ["window_start", "event_type"], "left").select(
        "window_start",
        "nw",
        (
            F.pow(F.coalesce(F.col("n"), F.lit(0)) - F.col("expected"), 2)
            / F.col("expected")
        ).alias("contrib"),
    )
    return cells.groupBy("window_start").agg(
        F.max("nw").cast("long").alias("n_events"),
        F.round(F.sum("contrib"), 6).alias("chi2"),
    )


@register(
    "embedding_norm_isotropy",
    tags=("similarity", "stats", "agg", "drift"),
    oracle="""
        WITH flat AS (
            SELECT i AS pos, CAST(embedding[i] AS DOUBLE) AS val
            FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
        ),
        per_dim AS (
            SELECT pos, AVG(val) AS m, AVG(val * val) AS m2,
                   COUNT(*) AS cnt
            FROM flat GROUP BY pos
        ),
        agg AS (
            -- n_vectors rides the per-dim pass (max per-dim count = the
            -- number of contributing vectors for rectangular embeddings)
            -- instead of a second scan of the corpus-scale table
            SELECT CAST(COUNT(*) AS BIGINT) AS dims,
                   CAST(MAX(cnt) AS BIGINT) AS n_vectors,
                   SUM(m2) AS msq,
                   SUM(m * m) AS cn2,
                   SUM(m2 - m * m) AS v1,
                   SUM(POW(m2 - m * m, 2)) AS v2
            FROM per_dim
        )
        SELECT n_vectors, dims,
               ROUND(msq - 5e-13, 5) + 0.0 AS mean_sq_norm,
               ROUND(cn2 - 5e-13, 5) + 0.0 AS centroid_norm_sq,
               ROUND((CASE WHEN msq > 0 THEN cn2 / msq END) - 5e-13, 5)
                   + 0.0 AS isotropy_ratio,
               ROUND((CASE WHEN v2 > 0 THEN v1 * v1 / v2 END) - 5e-13, 5)
                   + 0.0 AS participation_ratio
        FROM agg WHERE dims > 0
    """,
)
def embedding_norm_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health report: E[‖x‖²], ‖μ‖², the isotropy ratio
    ‖μ‖²/E[‖x‖²] (→0 for a centered/isotropic space, →1 when the mass
    collapses onto the mean — the anisotropy failure mode of contrastive
    encoders), and the participation ratio (Σλ)²/Σλ² of the per-dimension
    variances — the effective dimensionality a representation actually
    uses. The checks run on every embedding-model version before its
    vectors enter dedup/ANN (a collapsed space makes cosine thresholds
    meaningless). n_vectors counts CONTRIBUTING vectors (max per-dim
    count over the exploded stream) so the whole report is one scan.

    Scale shape: posexplode → ONE per-(dim) mean/mean-square aggregate
    (map-side combined; the key space is the dimensionality), then every
    statistic folds out of ONE aggregate over the dims-sized frame — no
    second corpus pass, no covariance matrix (the participation ratio uses
    only the diagonal). Sums reassociate across engines → 5-dp tie-down
    rounding, the embedding-family convention."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(F.posexplode("embedding").alias("pos", "val0")).select(
        "pos", F.col("val0").cast("double").alias("val")
    )
    per_dim = flat.groupBy("pos").agg(
        F.avg("val").alias("m"),
        F.avg(F.col("val") * F.col("val")).alias("m2"),
        F.count("*").alias("cnt"),
    )
    var_d = F.col("m2") - F.col("m") * F.col("m")
    # n_vectors = max per-dim count, riding the same aggregate — the
    # embeddings table is scanned exactly ONCE (vectors with a NULL
    # embedding column don't contribute anywhere in this report)
    agg = per_dim.agg(
        F.count("*").cast("long").alias("dims"),
        F.max("cnt").cast("long").alias("n_vectors"),
        F.sum("m2").alias("msq"),
        F.sum(F.col("m") * F.col("m")).alias("cn2"),
        F.sum(var_d).alias("v1"),
        F.sum(F.pow(var_d, 2)).alias("v2"),
    )
    return (
        agg
        .select(
            "n_vectors",
            "dims",
            round_ties_down(F.col("msq"), 5).alias("mean_sq_norm"),
            round_ties_down(F.col("cn2"), 5).alias("centroid_norm_sq"),
            round_ties_down(
                F.when(F.col("msq") > 0, F.col("cn2") / F.col("msq")), 5
            ).alias("isotropy_ratio"),
            round_ties_down(
                F.when(F.col("v2") > 0, F.col("v1") * F.col("v1") / F.col("v2")), 5
            ).alias("participation_ratio"),
        )
        .filter(F.col("dims") > 0)
    )


from dblp_to_csv_spark.functions.text import WORDS_SQL

KL_LANG_A = "en"
KL_LANG_B = "zh"
KL_ROUND = 6
_KL_WORDS = WORDS_SQL.format(col="text")


@register(
    "drift_kl_unigram_langs",
    tags=("drift", "stats", "text"),
    oracle=f"""
        WITH tok AS (
            SELECT lang, unnest({_KL_WORDS}) AS term
            FROM documents WHERE lang IN ('{KL_LANG_A}', '{KL_LANG_B}')
        ),
        cnt AS (
            SELECT term,
                   CAST(SUM(CASE WHEN lang = '{KL_LANG_A}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN lang = '{KL_LANG_B}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS cb
            FROM tok GROUP BY term
        ),
        tot AS (
            SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS v FROM cnt
        ),
        p AS (
            SELECT (ca + 1.0) / (na + v) AS pa, (cb + 1.0) / (nb + v) AS pb
            FROM cnt, tot
        )
        SELECT '{KL_LANG_A}' AS lang_a, '{KL_LANG_B}' AS lang_b,
               CAST((SELECT v FROM tot) AS BIGINT) AS vocab,
               ROUND(SUM(pa * ln(pa / pb)), {KL_ROUND}) AS kl_ab,
               ROUND(SUM(pb * ln(pb / pa)), {KL_ROUND}) AS kl_ba
        FROM p
    """,
)
def drift_kl_unigram_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-distribution KL divergence between two corpus slices (the
    between-dataset-versions drift metric KS/chi-square don't cover: WHICH
    way the token distribution moved, in nats). Add-one smoothing over the
    shared vocabulary makes both directions finite; ln-valued sums cannot
    sit on exact rounding boundaries (transcendental — the tie-down
    convention's safe class), so ROUND(x, 6) agrees across engines.

    Scale shape: one (term, lang-conditional counts) groupBy over the token
    explode (map-side combinable), then all statistics run on the
    vocab-sized frame — Heaps-law sublinear in the corpus; a 1-row totals
    aggregate broadcasts back. No sampling, no collect, no UDFs."""
    from dblp_to_csv_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin(KL_LANG_A, KL_LANG_B)
    )
    tok = docs.select("lang", F.explode(words("text")).alias("term"))
    cnt = tok.groupBy("term").agg(
        F.sum(F.when(F.col("lang") == KL_LANG_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("lang") == KL_LANG_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    # totals via an unpartitioned window over the VOCAB-SIZED frame (the
    # metadata-sized-window idiom) instead of a crossJoin against a second
    # aggregate of cnt — a lazy cnt referenced twice would re-run the
    # corpus tokenization (plan-gated: exactly one explode)
    w_all = Window.partitionBy()
    p = cnt.select(
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
        F.count(F.lit(1)).over(w_all).alias("v"),
    ).select(
        ((F.col("ca") + 1.0) / (F.col("na") + F.col("v"))).alias("pa"),
        ((F.col("cb") + 1.0) / (F.col("nb") + F.col("v"))).alias("pb"),
        "v",
    )
    return p.agg(
        F.lit(KL_LANG_A).alias("lang_a"),
        F.lit(KL_LANG_B).alias("lang_b"),
        # empty corpus: max(v) is NULL but the oracle's scalar COUNT(*) is 0
        F.coalesce(F.max("v"), F.lit(0)).cast("long").alias("vocab"),
        F.round(F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb"))), KL_ROUND).alias(
            "kl_ab"
        ),
        F.round(F.sum(F.col("pb") * F.log(F.col("pb") / F.col("pa"))), KL_ROUND).alias(
            "kl_ba"
        ),
    )
