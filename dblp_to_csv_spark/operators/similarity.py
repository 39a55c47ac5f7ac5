"""Similarity search over the embedding column (SURVEY.md §2.4):

* brute-force cosine top-k — the exact baseline;
* sign-LSH bucketed top-k — the scale path (random-hyperplane-style buckets
  from coordinate signs; candidates only within the query's bucket).

Dot products are zip_with/aggregate expressions (JVM-side, Arrow-free); the
DuckDB oracles mirror the exact arithmetic (same operand order) so results
hash-match bit-for-bit after 6-dp rounding.

Scale notes (100 TB of vectors):
* brute force is one broadcast of the (small) query set over the corpus —
  embarrassingly parallel, no shuffle; ranking is a per-query top-k window;
* the bucketed variant prunes the corpus to matching buckets before scoring:
  the bucket column is computed at ingest, so the scan can partition-prune
  on it; recall/latency trades by choosing the number of sign bits;
* a real IVF would replace sign buckets with k-means centroids — same plan
  shape (bucket key join → per-bucket scoring → top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
SIGN_BITS = 3  # 2^3 = 8 buckets


def _as_double(col) -> Column:
    return F.transform(col if isinstance(col, Column) else F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    """L2 norm, NULL for an all-zero vector: cosine against a zero vector
    is undefined, and under Spark 4 ANSI a 0.0 denominator THROWS
    DIVIDE_BY_ZERO while DuckDB returns NULL (the ab_test_welch class,
    advisor r9). A NULL norm makes every downstream cos division NULL on
    Spark — exactly what the oracles' x/0 already yields on DuckDB."""
    d = _dot(a, a)
    return F.when(d > 0, F.sqrt(d))


def _sign_bucket(emb: Column, bits: int = SIGN_BITS) -> Column:
    """Sign-LSH bucket key: concatenated sign bits of the first ``bits``
    coordinates (1-indexed, matching DuckDB list indexing). The bit count is
    the recall/latency dial: each workload picks its own (ANN demos use
    SIGN_BITS, the all-vectors kNN graph uses the wider KNN_SIGN_BITS)."""
    return F.concat(
        *[
            F.when(F.element_at(emb, i + 1) >= 0, "1").otherwise("0")
            for i in range(bits)
        ]
    )


def _sign_bucket_sql(bits: int) -> str:
    return " || ".join(
        f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(bits)
    )


_SIGN_BUCKET_SQL = _sign_bucket_sql(SIGN_BITS)

_EMB_CTE = """
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
               {bucket} AS bucket
        FROM embeddings
    )
""".format(bucket=_SIGN_BUCKET_SQL)


def _scored(spark: SparkSession, sf_dir: str, bucketed: bool) -> DataFrame:
    # fan-out-gated scan (guide §2.5): the candidate side of the broadcast
    # join otherwise scores every pair's interpreted 64-dim dot in one task.
    # Per-pair cosines see identical operands under any partitioning and the
    # top-k order is total (rounded cos DESC, vec_id) — order-exact.
    emb = fan_out_small(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        _as_double("embedding").alias("emb"),
        _sign_bucket(F.col("embedding")).alias("bucket"),
    )
    emb = emb.withColumn("nrm", _norm(F.col("emb")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    q = F.broadcast(queries).alias("q")
    c = emb.alias("c")
    cond = F.col("q.vec_id") != F.col("c.vec_id")
    if bucketed:
        cond = cond & (F.col("q.bucket") == F.col("c.bucket"))
    cos = _dot(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    scored = q.join(c, cond).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    return _topk(scored, "query_id", TOP_K)


@register(
    "similarity_topk_bruteforce",
    bench=True,
    tags=("similarity", "topk", "broadcast"),
    oracle=f"""
        WITH {_EMB_CTE}
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id
                   ) AS rank
            FROM e q JOIN e c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each query vector (vec_id < 8): broadcast the
    query set, score the whole corpus, per-query top-k window with a
    (rounded-sim DESC, neighbor_id) deterministic order."""
    return _scored(spark, sf_dir, bucketed=False)


@register(
    "similarity_topk_lsh_bucketed",
    tags=("similarity", "topk", "sketch"),
    oracle=f"""
        WITH {_EMB_CTE}
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id
                   ) AS rank
            FROM e q JOIN e c ON q.vec_id != c.vec_id AND q.bucket = c.bucket
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: candidates restricted to the query's sign-LSH
    bucket (8 buckets from 3 coordinate signs) before exact scoring — the
    IVF/LSH plan shape where the bucket key is the partition-pruning key at
    scale."""
    return _scored(spark, sf_dir, bucketed=True)


_PROBE_SQL = f"""
    list_prepend(bucket, list_transform(range(1, {SIGN_BITS} + 1),
        i -> substr(bucket, 1, i - 1)
             || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
             || substr(bucket, i + 1)))
"""


@register(
    "similarity_topk_lsh_multiprobe",
    tags=("similarity", "topk", "sketch"),
    oracle=f"""
        WITH {_EMB_CTE},
        p AS (
            SELECT vec_id, emb, nrm, UNNEST({_PROBE_SQL}) AS pbucket
            FROM e WHERE vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id
                   ) AS rank
            FROM p q JOIN e c ON q.vec_id != c.vec_id AND q.pbucket = c.bucket
        ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query scores its own bucket PLUS
    the SIGN_BITS hamming-1 neighbor buckets (flip one sign bit) — the
    standard multi-probe LSH recall dial (Lv et al. 2007): a near neighbor
    that landed just across one hyperplane is recovered without doubling
    the table count or the bucket width. With 3 bits this probes 4 of 8
    buckets (~N/2 candidates vs ~N/8 single-probe); the probe count is a
    query-time knob, not an ingest-time layout change.

    Scale shape: identical to the single-probe plan — the probe expansion
    explodes the tiny QUERY side only (broadcast), the corpus still joins
    on its one ingest-computed bucket key, partition-prunable; probe
    buckets are distinct so no candidate dedup is needed. Recall
    containment (single-probe ⊆ multi-probe ⊆ brute force, per-query best
    cosine monotone) is pinned in tests/test_similarity_recall.py."""
    return _multiprobe_scored(spark, sf_dir)


def _multiprobe_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-probe top-k frame — shared by the registered query and the
    recall-evaluation scorecard (similarity_eval_recall)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _as_double("embedding").alias("emb"),
        _sign_bucket(F.col("embedding")).alias("bucket"),
    ).withColumn("nrm", _norm(F.col("emb")))
    flips = [
        F.concat(
            F.substring("bucket", 1, i),
            F.when(F.substring("bucket", i + 1, 1) == "1", "0").otherwise("1"),
            F.expr(f"substr(bucket, {i + 2})"),
        )
        for i in range(SIGN_BITS)
    ]
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id",
            "emb",
            "nrm",
            F.explode(F.array(F.col("bucket"), *flips)).alias("pbucket"),
        )
    ).alias("q")
    c = emb.alias("c")
    cos = _dot(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    scored = q.join(
        c,
        (F.col("q.vec_id") != F.col("c.vec_id"))
        & (F.col("q.pbucket") == F.col("c.bucket")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    return _topk(scored, "query_id", TOP_K)


def _eval_recall_oracle() -> str:
    rank_expr = """
        ROW_NUMBER() OVER (
            PARTITION BY q.vec_id
            ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6)
                     DESC, c.vec_id
        )
    """
    arm = """
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {rank} AS rank
            FROM {src} q JOIN e c ON q.vec_id != c.vec_id {cond}
            {where}
        ) WHERE rank <= {k}
    """
    bf = arm.format(rank=rank_expr, src="e", cond="",
                    where=f"WHERE q.vec_id < {N_QUERIES}", k=TOP_K)
    sp = arm.format(rank=rank_expr, src="e", cond="AND q.bucket = c.bucket",
                    where=f"WHERE q.vec_id < {N_QUERIES}", k=TOP_K)
    mp = arm.format(rank=rank_expr, src="p", cond="AND q.pbucket = c.bucket",
                    where="", k=TOP_K)
    return f"""
        WITH {_EMB_CTE},
        p AS (
            SELECT vec_id, emb, nrm, UNNEST({_PROBE_SQL}) AS pbucket
            FROM e WHERE vec_id < {N_QUERIES}
        ),
        bf AS ({bf}), sp AS ({sp}), mp AS ({mp}),
        agg AS (
            SELECT bf.query_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bf,
                   CAST(SUM(CASE WHEN sp.neighbor_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS hits_lsh,
                   CAST(SUM(CASE WHEN mp.neighbor_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS hits_multiprobe
            FROM bf
            LEFT JOIN sp USING (query_id, neighbor_id)
            LEFT JOIN mp USING (query_id, neighbor_id)
            GROUP BY bf.query_id
        )
        SELECT query_id, hits_lsh, hits_multiprobe,
               ROUND(hits_lsh * 1.0 / n_bf, 6) + 0.0 AS recall_lsh,
               ROUND(hits_multiprobe * 1.0 / n_bf, 6) + 0.0
                   AS recall_multiprobe
        FROM agg
    """


@register(
    "similarity_eval_recall",
    tags=("similarity", "eval", "join"),
    oracle=_eval_recall_oracle(),
)
def similarity_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall scorecard — the evaluation loop an embedding-retrieval
    pipeline runs when tuning its index knobs (bucket bits, probe count):
    per query, recall@TOP_K of the single-probe and multi-probe sign-LSH
    arms against the exact brute-force top-k. The per-query numbers (not
    just a corpus mean) are the point: a knob change that trades tail
    queries for the average shows up here and vanishes in an aggregate.
    Suite-level recall FLOORS for the same arms are pinned in
    tests/test_similarity_recall.py; this query registers the measurement
    itself so the driver hash-verifies it end to end.

    Scale shape: all three arms are the registered queries' own plans
    (broadcast query side, bucket-key equi-joins, WindowGroupLimit top-k);
    the scorecard joins three (N_QUERIES x TOP_K)-row frames — query-count
    sized, never corpus-sized."""
    bf = _scored(spark, sf_dir, bucketed=False)
    sp = _scored(spark, sf_dir, bucketed=True).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_sp")
    )
    mp = _multiprobe_scored(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_mp")
    )
    agg = (
        bf.join(sp, ["query_id", "neighbor_id"], "left")
        .join(mp, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bf"),
            F.coalesce(F.sum("in_sp"), F.lit(0)).cast("long").alias("hits_lsh"),
            F.coalesce(F.sum("in_mp"), F.lit(0))
            .cast("long")
            .alias("hits_multiprobe"),
        )
    )
    return agg.select(
        "query_id",
        "hits_lsh",
        "hits_multiprobe",
        (F.round(F.col("hits_lsh") / F.col("n_bf"), 6) + F.lit(0.0)).alias(
            "recall_lsh"
        ),
        (
            F.round(F.col("hits_multiprobe") / F.col("n_bf"), 6) + F.lit(0.0)
        ).alias("recall_multiprobe"),
    )


def _topk(scored: DataFrame, key: str, k: int) -> DataFrame:
    """The per-query top-k contract in ONE place (review r8 — it existed as
    six copies): rank by (cos_sim desc, neighbor_id) — the deterministic
    tie-break every recall-containment test in test_similarity_recall.py
    relies on — keep k, emit (key, neighbor_id, cos_sim, rank). WindowGroup-
    Limit turns the per-key window into a partial top-k before the shuffle."""
    w = Window.partitionBy(key).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key, "neighbor_id", "cos_sim", "rank")
    )


IVF_CELLS = 8  # coarse-quantizer cell count for the REGISTERED sf0.01 queries
# Default cell-size target when k is not given: k = ceil(N / TARGET_CELL_ROWS),
# so the in-cell quadratic work (SemDeDup pair search, IVF probe) stays
# O(N · TARGET_CELL_ROWS) as the corpus grows instead of O(N²/k) with fixed k.
TARGET_CELL_ROWS = 4096


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 as ||a||² − 2a·b + ||b||² — the SAME operand order as the
    DuckDB oracle, so both engines produce bit-identical doubles before the
    6-dp rounding that gates every assignment comparison."""
    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


def _nearest(
    points: DataFrame,
    centers: DataFrame,
    cell_col: str,
    part_cols: tuple[str, ...] = (),
    vec_col: str = "emb",
) -> DataFrame:
    """Assign every point to its nearest center (rounded squared-L2, ties to
    the smallest cell id) — one broadcast of the k-row center table, one
    narrow pass over the points, a per-point k-row argmin window. The ONE
    definition of the deterministic-assignment contract (6-dp round,
    dist-then-cell tie-break, lock-step with the DuckDB assignment CTE) for
    the whole k-means family: IVF, SemDeDup, and — via ``part_cols=('m',)``
    — the per-subspace PQ codebooks (review r8 session 4: PQ previously
    carried its own copy)."""
    # Precompute ||p||² once per point and ||c||² once per center instead
    # of inside every (point, center) pair (r14 optimization round): the
    # higher-order _dot fold is interpreted (no codegen), so the inline
    # _sq_dist form re-ran the self-dots k× per point — 3× the interpreted
    # work. The expanded expression keeps _sq_dist's exact operand order
    # ((p² − 2·a·b) + c²), so every double is bit-identical to before and
    # the 6-dp-rounded assignment cannot move.
    centers2 = centers.withColumn("_nn_c2", _dot(F.col("cemb"), F.col("cemb")))
    points2 = points.withColumn("_nn_p2", _dot(F.col(vec_col), F.col(vec_col)))
    joined = (
        points2.join(F.broadcast(centers2), list(part_cols))
        if part_cols
        else points2.crossJoin(F.broadcast(centers2))
    )
    d = joined.select(
        "vec_id",
        *part_cols,
        cell_col,
        F.round(
            (F.col("_nn_p2") - 2 * _dot(F.col(vec_col), F.col("cemb")))
            + F.col("_nn_c2"),
            6,
        ).alias("dist2"),
    )
    w = Window.partitionBy("vec_id", *part_cols).orderBy("dist2", cell_col)
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", *part_cols, F.col(cell_col).alias("cell"))
    )


_IVF_ASSIGN_SQL = """
    ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY ROUND(list_dot_product(e.emb, e.emb)
                       - 2 * list_dot_product(e.emb, {c}.cemb)
                       + list_dot_product({c}.cemb, {c}.cemb), 6),
                 {c}.cell
    )
"""

# Deterministic k-means cell assignment as a reusable DuckDB CTE chain:
# md5-min seeds → one Lloyd step (6-dp-rounded per-cell coordinate means) →
# final nearest-centroid assignment `a1(vec_id, cell)`. Shared by the IVF
# top-k oracle and the SemDeDup oracle so both stay in lock-step with
# `kmeans_cells` below.
KMEANS_CELLS_CTE = f"""
        emb AS MATERIALIZED (
            -- DISTINCT (dupkey-sweep pin): the k-means index is KEYED by
            -- vec_id — a verbatim duplicate row is the same vector, and a
            -- duplicated seed row would shrink the seed set below k
            SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS cell, emb AS cemb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_CELLS}
        ),
        a0 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, s.cell,
                       {_IVF_ASSIGN_SQL.format(c='s')} AS rn
                FROM emb e CROSS JOIN seeds s
            ) WHERE rn = 1
        ),
        coords AS (
            SELECT a0.cell, u.z[2] AS pos, u.z[1] AS val
            FROM a0 JOIN emb USING (vec_id),
                 UNNEST(list_zip(emb.emb, range(1, len(emb.emb) + 1))) AS u(z)
        ),
        cent AS (
            SELECT cell, array_agg(v ORDER BY pos) AS cemb FROM (
                SELECT cell, pos, ROUND(AVG(val), 6) AS v
                FROM coords GROUP BY 1, 2
            ) GROUP BY cell
        ),
        a1 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       {_IVF_ASSIGN_SQL.format(c='c')} AS rn
                FROM emb e CROSS JOIN cent c
            ) WHERE rn = 1
        )
"""


def kmeans_cells(
    emb: DataFrame, k: int | None = None, target_cell_rows: int = TARGET_CELL_ROWS
) -> DataFrame:
    """Deterministic k-means coarse quantization: assign every vector to one
    of ``k`` cells, reproducibly on any engine. Seeds are the k vectors with
    the smallest md5(vec_id); one Lloyd step refines them (assign to nearest
    seed, per-cell coordinate means rounded to 6 dp); the result is the
    nearest-centroid assignment. Input must have columns
    (vec_id, emb: array<double>); returns (vec_id, cell).

    ``k`` defaults to ``ceil(N / target_cell_rows)`` — corpus-scaled, so
    average cell size stays bounded as the corpus grows (VERDICT r7 #2: a
    fixed k makes the in-cell quadratic grow as the SQUARE of the scale-up;
    corpus-scaled k keeps it linear). The one extra count() job is a
    column-pruned scan. Seeds are md5-min ranked, so ANY k is deterministic;
    the registered sf0.01 queries pass k=IVF_CELLS explicitly to keep their
    DuckDB oracles (which embed the constant) in lock-step.

    Scale shape: the seed/centroid tables are k rows (broadcast), both
    assignment passes are narrow per-row argmins over a broadcast, and the
    Lloyd step is one (cell, pos) partial/final aggregate — nothing here
    shuffles the corpus except the posexplode aggregate, whose key space is
    k × d. DuckDB reproduces the exact assignment via KMEANS_CELLS_CTE."""
    return _nearest(emb, kmeans_centroids(emb, k, target_cell_rows), "cell")


def kmeans_centroids(
    emb: DataFrame, k: int | None = None, target_cell_rows: int = TARGET_CELL_ROWS
) -> DataFrame:
    """The (cell, cemb) centroid table behind ``kmeans_cells`` — exposed so
    probe-time consumers (IVF nprobe ranking) share the exact chain the
    assignment used instead of re-deriving it. Same determinism contract:
    md5-min seeds, one 6-dp-rounded Lloyd step."""
    if k is None:
        n = emb.select("vec_id").count()
        k = max(1, -(-n // target_cell_rows))
    seeds = (
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cell"), F.col("emb").alias("cemb"))
    )
    a0 = _nearest(emb, seeds, "cell")
    coords = a0.join(emb, "vec_id").select(
        "cell", F.posexplode("emb").alias("pos", "val")
    )
    return (
        coords.groupBy("cell", "pos")
        .agg(F.round(F.avg("val"), 6).alias("v"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("cemb")
        )
    )


@register(
    "similarity_topk_ivf",
    tags=("similarity", "topk", "ml"),
    oracle=f"""
        WITH {KMEANS_CELLS_CTE},
        b AS (
            SELECT e.vec_id, e.emb, a1.cell,
                   sqrt(list_dot_product(e.emb, e.emb)) AS nrm
            FROM emb e JOIN a1 USING (vec_id)
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id
                   ) AS rank
            FROM b q JOIN b c ON q.vec_id != c.vec_id AND q.cell = c.cell
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization with DETERMINISTIC k-means (VERDICT r6 item
    4): seeds are the IVF_CELLS=8 vectors with the smallest md5(vec_id) —
    reproducible on any engine — refined by one Lloyd step (assign to
    nearest seed, per-cell coordinate means rounded to 6 dp), then every
    vector is assigned to its nearest centroid and queries score only their
    own cell. Every engine-sensitive comparison (assignment distances,
    centroid coordinates, cosines) is rounded to 6 dp with an id tie-break,
    which is what lets DuckDB reproduce cell assignment exactly — the same
    trick that made MinHash/SimHash fully oracle-checked.

    Same plan shape as the sign-LSH variant with a LEARNED bucket key: at
    scale the centroid id is a partition/cluster column computed at ingest,
    so the probe prunes to ~1/k of the corpus (nprobe>1 = also scan
    neighboring cells); the center table (k rows) broadcasts, assignment is
    a narrow pass, and the Lloyd step is one (cell, pos) aggregate —
    pyspark.ml's KMeans remains the drop-in for more iterations when
    cross-engine determinism is not required. Recall vs the exact baseline
    is additionally gated in tests/test_similarity_recall.py."""
    # entry distinct (dupkey-sweep pin): keyed k-means index — see
    # KMEANS_CELLS_CTE's DISTINCT twin
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    ).distinct()
    bucketed = emb.join(kmeans_cells(emb, k=IVF_CELLS), "vec_id").withColumn(
        "nrm", _norm(F.col("emb"))
    )
    q = F.broadcast(bucketed.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    c = bucketed.alias("c")
    cos = _dot(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    scored = q.join(
        c,
        (F.col("q.vec_id") != F.col("c.vec_id"))
        & (F.col("q.cell") == F.col("c.cell")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    return _topk(scored, "query_id", TOP_K)


IVF_NPROBE = 2


@register(
    "similarity_topk_ivf_nprobe",
    tags=("similarity", "topk", "ml"),
    oracle=f"""
        WITH {KMEANS_CELLS_CTE},
        b AS (
            SELECT e.vec_id, e.emb, a1.cell,
                   sqrt(list_dot_product(e.emb, e.emb)) AS nrm
            FROM emb e JOIN a1 USING (vec_id)
        ),
        qc AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       {_IVF_ASSIGN_SQL.format(c='c')} AS rn
                FROM emb e CROSS JOIN cent c
                WHERE e.vec_id < {N_QUERIES}
            ) WHERE rn <= {IVF_NPROBE}
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) DESC,
                                c.vec_id
                   ) AS rank
            FROM b q JOIN qc ON q.vec_id = qc.vec_id
                   JOIN b c ON c.cell = qc.cell AND c.vec_id != q.vec_id
        ) WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with nprobe={IVF_NPROBE}: each query scores the vectors of
    its IVF_NPROBE nearest centroids instead of only its home cell — the
    standard IVF recall dial (a near neighbor sitting just across a cell
    boundary is recovered at query time, no re-clustering). Centroid
    ranking reuses the deterministic 6-dp-rounded distance with the cell-id
    tie-break, so DuckDB reproduces the probe set exactly.

    Scale shape: unchanged from single-probe IVF — the corpus keeps its one
    ingest-time cell id (partition-prunable); only the tiny query→cell map
    grows by a factor of nprobe and broadcasts. nprobe is a query-time
    knob: recall/cost trades per query, not per layout."""
    # entry distinct (dupkey-sweep pin): keyed k-means index — see
    # KMEANS_CELLS_CTE's DISTINCT twin
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    ).distinct()
    # ONE centroid chain: derive the corpus assignment from the same cent
    # frame the probe ranking uses (kmeans_cells would rebuild the whole
    # seed/Lloyd chain a second time — review r8)
    cent = kmeans_centroids(emb, k=IVF_CELLS)
    bucketed = emb.join(_nearest(emb, cent, "cell"), "vec_id").withColumn(
        "nrm", _norm(F.col("emb"))
    )
    # per-query top-nprobe centroids, by the same rounded distance +
    # cell-id order the assignment pass uses
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    d = queries.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        F.round(_sq_dist(F.col("emb"), F.col("cemb")), 6).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cell")
    qc = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("vec_id", "cell")
    )
    q = F.broadcast(
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .drop("cell")
        .join(qc, "vec_id")
    ).alias("q")
    c = bucketed.alias("c")
    cos = _dot(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    scored = q.join(
        c,
        (F.col("q.vec_id") != F.col("c.vec_id"))
        & (F.col("q.cell") == F.col("c.cell")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    return _topk(scored, "query_id", TOP_K)


@register(
    "similarity_topk_blas",
    tags=("similarity", "topk", "pandas-udf"),
    oracle=None,  # BLAS summation order ≠ SQL fold order at the last ulp;
    # exactness vs the expression path is asserted (with fp tolerance) in
    # tests/test_similarity_recall.py instead.
)
def similarity_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k with BLOCKED numpy matmul (mapInPandas): the query
    matrix (k×d) is shipped to every task inside the closure, each Arrow
    batch of corpus vectors becomes one (batch×d)·(d×k) BLAS call, and a
    final per-query top-k window ranks the partial scores.

    This is the 100 TB exact-scoring path: the expression-tree dot product
    (`similarity_topk_bruteforce`) evaluates one pair at a time inside
    codegen — fine for verification, but dense matmul belongs in vectorized
    kernels (~64 muls/pair amortized into cache-friendly GEMM). Same plan
    shape: narrow map over corpus splits, no shuffle until the tiny top-k.
    No SQL oracle (BLAS reassociates float sums; last-ulp divergence breaks
    6-dp hashes) — parity with the oracle-checked expression path is
    asserted with tolerance in tests/test_similarity_recall.py."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    out_schema = "query_id long, neighbor_id long, cos_sim double"
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()  # tiny: k vectors
    if not q_rows:  # no query vectors → empty result, correct schema
        return spark.createDataFrame([], out_schema + ", rank int")
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.array([r["emb"] for r in q_rows])  # (k, d)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # Arrow can hand over zero-row batches
                continue
            c_mat = np.array(pdf["emb"].tolist())  # (b, d)
            c_ids = pdf["vec_id"].to_numpy()
            sims = (c_mat @ q_mat.T) / np.outer(
                np.linalg.norm(c_mat, axis=1), q_norm
            )  # (b, k)
            b, k = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, b),
                    "neighbor_id": np.tile(c_ids, k),
                    "cos_sim": np.round(sims.T.ravel(), 6),
                }
            )

    scored = emb.mapInPandas(score_batches, out_schema).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(scored, "query_id", TOP_K)


KNN_K = 3
# The kNN-graph workload scores EVERY vector against its bucket, so bucket
# population enters the cost QUADRATICALLY (sum over buckets of n_b²) — the
# ANN demos' SIGN_BITS=3 (8 buckets) makes buckets ~4× too coarse for it
# (VERDICT r7 #3). 5 bits = 32 buckets keeps per-task work bounded at sf0.1
# while sparse buckets still yield ≥KNN_K candidates; at 100 TB this dial
# rises with corpus size exactly like the ANN bucket count.
KNN_SIGN_BITS = 5

_KNN_EMB_CTE = """
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
               {bucket} AS bucket
        FROM embeddings
    )
""".format(bucket=_sign_bucket_sql(KNN_SIGN_BITS))


@register(
    "similarity_knn_graph_bucketed",
    tags=("similarity", "topk", "sketch"),
    oracle=f"""
        WITH {{emb_cte}}
        SELECT vec_id, neighbor_id, cos_sim, rank FROM (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) DESC,
                                b.vec_id
                   ) AS rank
            FROM e a JOIN e b
              ON a.bucket = b.bucket AND a.vec_id != b.vec_id
        ) WHERE rank <= {KNN_K}
    """.format(emb_cte=_KNN_EMB_CTE),
)
def similarity_knn_graph_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-GRAPH construction: EVERY vector's top-{k} neighbors (not just a
    query set's) — the primitive under embedding-cluster pipelines
    (SemDeDup's cluster refinement, label propagation, graph-based
    curation). All-pairs kNN is quadratic in the corpus; here candidates
    are confined to a sign-LSH bucket, so the self-join shuffles on the
    bucket key and each task scores one bucket — and because per-bucket
    cost is QUADRATIC in bucket population, this workload uses its own
    KNN_SIGN_BITS=5 width (32 buckets) rather than the ANN demos'
    SIGN_BITS=3: the all-vectors sweep needs task-sized buckets, the
    8-query demos don't. At 100 TB you raise the bit count further so
    buckets stay task-sized; a vector's edges degrade gracefully (fewer
    than k neighbors in a sparse bucket, never a wrong one). Scoring and
    ranking stay JVM-side: zip_with/aggregate dot products, per-vector
    WindowGroupLimit top-k."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _as_double("embedding").alias("emb"),
        _sign_bucket(F.col("embedding"), KNN_SIGN_BITS).alias("bucket"),
    )
    emb = emb.withColumn("nrm", _norm(F.col("emb")))
    a = emb.alias("a")
    b = emb.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm"))
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    return _topk(scored, "vec_id", KNN_K)


# --- Random-projection dimensionality reduction (Johnson–Lindenstrauss) ----

RP_DIM = 16  # projected dimensionality (from the 64-d embedding column)
EMB_DIM = 64


def _rp_signs() -> list[list[int]]:
    """The ±1 projection matrix (Achlioptas 2003 sign variant of JL):
    entry (j, i) is the parity of the first hex digit of md5('rp:j:i').
    Derived from md5 so it is portable and reproducible, then materialized
    as LITERALS in both the Spark plan and the DuckDB oracle — at scale
    this is exactly the shape you want: the matrix is kilobytes, baked
    into the projection expression (constant-folded by Catalyst), never a
    join and never per-row hashing."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(EMB_DIM)
        ]
        for j in range(RP_DIM)
    ]


_RP_SIGNS = _rp_signs()


def _rp_oracle() -> str:
    comps = ", ".join(
        "ROUND(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(embedding[i] AS DOUBLE) * ([{signs}])[i])) / sqrt({k}), 6)"
        " + 0.0".format(
            d=EMB_DIM,
            signs=", ".join(str(s) for s in _RP_SIGNS[j]),
            k=RP_DIM,
        )
        for j in range(RP_DIM)
    )
    return f"""
        SELECT vec_id,
               array_to_string(
                   list_transform([{comps}], c -> printf('%.6f', c)), '|'
               ) AS projected
        FROM embeddings
    """


@register(
    "embedding_random_projection",
    tags=("similarity", "embedding", "projection"),
    oracle=_rp_oracle(),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection: 64-d float embeddings down
    to RP_DIM=16 via a ±1 sign matrix (Achlioptas 2003), scaled 1/√RP_DIM
    so inner products are approximately preserved. The engine-side
    compression step before sketch/LSH stages — a 4× narrower vector feeds
    the same sign-LSH and IVF machinery at a quarter of the scan bytes,
    with bounded cosine distortion (pinned statistically in
    tests/test_random_projection.py).

    Cross-engine exactness: each projected component is a left-to-right
    fold of emb[i] * sign(j,i) in the SAME i order on both engines (Spark
    zip_with/aggregate vs DuckDB list_transform/list_sum), one division,
    6-dp round, -0.0 normalized. The sign matrix is a shared md5-derived
    literal (see _rp_signs).

    Scale shape: pure in-row projection — no shuffle, no UDF, no join; the
    matrix constant-folds into the whole-stage-codegen'd expression. At
    100 TB this runs at scan speed and is the cheapest decade of any
    ANN-pipeline stage."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = _as_double("embedding")
    comps = [
        F.round(
            F.aggregate(
                F.zip_with(
                    e,
                    F.array(*[F.lit(s) for s in _RP_SIGNS[j]]),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(RP_DIM) ** 0.5),
            6,
        )
        + F.lit(0.0)
        for j in range(RP_DIM)
    ]
    return emb.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.array(*comps), lambda c: F.format_string("%.6f", c)
            ),
            "|",
        ).alias("projected"),
    )



# --- Product quantization (PQ-ADC + exact rerank) --------------------------

PQ_M = 8  # subspaces
PQ_SUB = 8  # dims per subspace (PQ_M * PQ_SUB = embedding dim)
PQ_K = 8  # codes per subspace codebook
PQ_RERANK = 100  # ADC candidate depth fed to the exact rerank


def _pq_oracle() -> str:
    """Per-subspace deterministic k-means (the KMEANS_CELLS_CTE recipe with
    suffixed names over a list_slice'd input), PQ encoding, ADC candidate
    generation, exact-cosine rerank."""
    # DISTINCT (dupkey-sweep pin): the ANN index is KEYED by vec_id — a
    # verbatim duplicate row is the same vector, and leaving it in fans
    # the 8-way LUT join exponentially (2^M rows per duplicated query)
    # and double-books top-k slots in the rerank; the Spark side applies
    # the same entry distinct.
    ctes = [
        "emb AS MATERIALIZED (SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS emb"
        " FROM embeddings)"
    ]
    for m in range(PQ_M):
        s, e = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        assign = """
            ROW_NUMBER() OVER (
                PARTITION BY e.vec_id
                ORDER BY ROUND(list_dot_product(e.semb, e.semb)
                               - 2 * list_dot_product(e.semb, {c}.cemb)
                               + list_dot_product({c}.cemb, {c}.cemb), 6),
                         {c}.cell
            )
        """
        ctes.append(f"sub{m} AS MATERIALIZED (SELECT vec_id, emb[{s}:{e}] AS semb FROM emb)")
        ctes.append(
            f"""seeds{m} AS MATERIALIZED (
                SELECT vec_id AS cell, semb AS cemb FROM sub{m}
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {PQ_K}
            )"""
        )
        ctes.append(
            f"""a0x{m} AS MATERIALIZED (
                SELECT vec_id, cell FROM (
                    SELECT e.vec_id, s.cell, {assign.format(c='s')} AS rn
                    FROM sub{m} e CROSS JOIN seeds{m} s
                ) WHERE rn = 1
            )"""
        )
        ctes.append(
            f"""coords{m} AS MATERIALIZED (
                SELECT a.cell, u.z[2] AS pos, u.z[1] AS val
                FROM a0x{m} a JOIN sub{m} s USING (vec_id),
                     UNNEST(list_zip(s.semb, range(1, len(s.semb) + 1))) AS u(z)
            )"""
        )
        ctes.append(
            f"""cent{m} AS MATERIALIZED (
                SELECT cell, array_agg(v ORDER BY pos) AS cemb FROM (
                    SELECT cell, pos, ROUND(AVG(val), 6) AS v
                    FROM coords{m} GROUP BY 1, 2
                ) GROUP BY cell
            )"""
        )
        ctes.append(
            f"""a1x{m} AS MATERIALIZED (
                SELECT vec_id, cell FROM (
                    SELECT e.vec_id, c.cell, {assign.format(c='c')} AS rn
                    FROM sub{m} e CROSS JOIN cent{m} c
                ) WHERE rn = 1
            )"""
        )
        ctes.append(
            f"""lut{m} AS MATERIALIZED (
                SELECT q.vec_id AS query_id, c.cell AS code,
                       ROUND(list_dot_product(q.semb, q.semb)
                             - 2 * list_dot_product(q.semb, c.cemb)
                             + list_dot_product(c.cemb, c.cemb), 6) AS d
                FROM sub{m} q CROSS JOIN cent{m} c
                WHERE q.vec_id < {N_QUERIES}
            )"""
        )
    code_cols = ", ".join(f"a1x{m}.cell AS c{m}" for m in range(PQ_M))
    code_joins = " ".join(
        f"JOIN a1x{m} USING (vec_id)" for m in range(1, PQ_M)
    )
    ctes.append(
        f"codes AS MATERIALIZED (SELECT a1x0.vec_id, {code_cols} FROM a1x0 {code_joins})"
    )
    lut_joins = " ".join(
        f"JOIN lut{m} l{m} ON l{m}.code = cd.c{m}"
        f" AND l{m}.query_id = l0.query_id"
        for m in range(1, PQ_M)
    )
    dist = " + ".join(f"l{m}.d" for m in range(PQ_M))
    ctes.append(
        f"""scored AS MATERIALIZED (
            SELECT l0.query_id, cd.vec_id AS neighbor_id,
                   ROUND({dist}, 6) AS approx_dist
            FROM codes cd JOIN lut0 l0 ON l0.code = cd.c0 {lut_joins}
            WHERE cd.vec_id <> l0.query_id
        )"""
    )
    ctes.append(
        f"""cand AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY approx_dist, neighbor_id
                       ) AS rn
                FROM scored
            ) WHERE rn <= {PQ_RERANK}
        )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT c.query_id, c.neighbor_id,
                   ROUND(list_dot_product(q.emb, n.emb)
                         / (sqrt(list_dot_product(q.emb, q.emb))
                            * sqrt(list_dot_product(n.emb, n.emb))), 6)
                       AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY ROUND(list_dot_product(q.emb, n.emb)
                                      / (sqrt(list_dot_product(q.emb, q.emb))
                                         * sqrt(list_dot_product(n.emb, n.emb))),
                                      6) DESC,
                                c.neighbor_id
                   ) AS rank
            FROM cand c
            JOIN emb q ON q.vec_id = c.query_id
            JOIN emb n ON n.vec_id = c.neighbor_id
        ) WHERE rank <= {TOP_K}
    """
    )


@register(
    "similarity_topk_pq",
    tags=("similarity", "topk", "ml"),
    oracle=_pq_oracle(),
)
def similarity_topk_pq(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN (Jégou et al. 2011), the full IVFADC-style
    retrieve shape: PQ_M=8 subspaces each train a PQ_K=8-code codebook with
    the SAME deterministic k-means as the IVF family (md5-min seeds + one
    6-dp-rounded Lloyd step), every vector encodes as 8 small codes (~32×
    smaller than the floats), queries score the WHOLE corpus from
    per-(query, subspace, code) lookup tables (asymmetric distance — raw
    corpus floats untouched), and the ADC top-PQ_RERANK candidates rerank
    by exact cosine for the final top-k. Candidate generation is the
    compression-side ANN; the rerank restores exactness on the short list
    (the fixture corpus is i.i.d. random — PQ's literal worst case, no
    cluster structure to exploit — so the candidate depth carries the
    recall; see tests/test_similarity_recall.py for the pinned floor and
    the measured parameter curve).

    Engine-exactness: every LUT entry and assignment distance is 6-dp
    rounded with id tie-breaks; the ADC sum folds the M terms in fixed
    subspace order IN-ROW (map lookups chained m=0..7, never a shuffle
    aggregate whose reassociation could flip a 6-dp boundary).

    Scale shape: ALL M codebooks train in ONE chain partitioned by the
    subspace id (seeds = per-m md5-min window, assignment = broadcast
    equi-join on m, Lloyd = one (m, cell, pos) aggregate) — not M serial
    jobs; codes and LUTs collapse to per-row maps (codes table = corpus
    ids + 8 ints; LUT table = kilobytes, broadcast). Scoring is an in-row
    lookup over the encoded corpus at scan speed, the rerank touches only
    queries × PQ_RERANK raw vectors. At 100 TB, encode at ingest, store
    codes as a column, and the scan never reads the float column until
    rerank."""
    scored = pq_adc_scores(spark, sf_dir, checkpoint_dir)
    # entry distinct (dupkey-sweep pin): the index is keyed by vec_id — a
    # duplicate row would double-book rerank top-k slots (oracle twin:
    # the DISTINCT emb CTE in _pq_oracle)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    ).distinct()
    w_cand = Window.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(w_cand))
        .filter(F.col("rn") <= PQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    nemb = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("nemb"),
        _norm(F.col("emb")).alias("nnrm"),
    )
    qemb = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        _norm(F.col("emb")).alias("qn"),
    )
    cos = _dot(F.col("qe"), F.col("nemb")) / (F.col("qn") * F.col("nnrm"))
    reranked = (
        cand.join(F.broadcast(qemb), "query_id")
        .join(nemb, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    return _topk(reranked, "query_id", TOP_K)


def pq_adc_scores(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """The PQ train/encode/ADC-score chain, exposed so compositions can
    consume the raw (query_id, neighbor_id, approx_dist) frame — the
    IVFADC composition test confines these scores to the query's coarse
    k-means cell (tests/test_similarity_recall.py). See similarity_topk_pq
    for the full contract."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    base = checkpoint_base(spark, checkpoint_dir, "_pq_")
    # entry distinct (dupkey-sweep pin): the PQ index is keyed by vec_id —
    # verbatim duplicate rows are the same vector (oracle twin: DISTINCT
    # emb CTE in _pq_oracle)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    ).distinct()
    # one long frame (vec_id, m, semb): every subspace trains in the same jobs
    sub_long = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.slice("emb", m * PQ_SUB + 1, PQ_SUB),
            )
        ).alias("m", "semb"),
    )
    w_seed = Window.partitionBy("m").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    seeds = (
        sub_long.withColumn("rn", F.row_number().over(w_seed))
        .filter(F.col("rn") <= PQ_K)
        .select("m", F.col("vec_id").alias("cell"), F.col("semb").alias("cemb"))
    )

    def nearest_by_m(points: DataFrame, centers: DataFrame) -> DataFrame:
        return _nearest(
            points, centers, "cell", part_cols=("m",), vec_col="semb"
        )

    a0 = nearest_by_m(sub_long, seeds)
    coords = a0.join(sub_long, ["vec_id", "m"]).select(
        "m", "cell", F.posexplode("semb").alias("pos", "val")
    )
    cent = (
        coords.groupBy("m", "cell", "pos")
        .agg(F.round(F.avg("val"), 6).alias("v"))
        .groupBy("m", "cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"],
            ).alias("cemb")
        )
    )
    cent_path = os.path.join(base, "cent")
    cent.write.mode("overwrite").parquet(cent_path)
    cent = spark.read.parquet(cent_path)

    codes = (
        nearest_by_m(sub_long, cent)
        .groupBy("vec_id")
        .agg(
            # array_distinct: duplicate vec_id rows (verbatim copies) land
            # identical (m, cell) entries in one group — map_from_entries
            # throws DUPLICATED_MAP_KEY on them, while the oracle's GROUP BY
            # collapses the copies (dupkey-sweep pin)
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("m", "cell")))
            ).alias("codes")
        )
    )
    # Same norm-precompute as _nearest (r14 optimization round): ||q_sub||²
    # once per query subvector and ||c||² once per centroid instead of
    # inside every (query, centroid) pair — the interpreted _dot fold is
    # the whole LUT cost, and the expanded ((q² − 2·q·c) + c²) keeps
    # _sq_dist's operand order, so every 6-dp-rounded distance is
    # bit-identical.
    lut = (
        sub_long.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("_q2", _dot(F.col("semb"), F.col("semb")))
        .join(
            F.broadcast(
                cent.withColumn("_c2", _dot(F.col("cemb"), F.col("cemb")))
            ),
            "m",
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.concat_ws(":", "m", "cell").alias("mc"),
            F.round(
                (F.col("_q2") - 2 * _dot(F.col("semb"), F.col("cemb")))
                + F.col("_c2"),
                6,
            ).alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("mc", "d")))
            ).alias("lut")
        )
    )
    dist = None
    for m in range(PQ_M):
        term = F.element_at(
            F.col("lut"),
            F.concat_ws(
                ":", F.lit(m), F.element_at(F.col("codes"), F.lit(m))
            ),
        )
        dist = term if dist is None else dist + term
    return (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dist, 6).alias("approx_dist"),
        )
    )


# --------------------------------------------------------------------------
# Semantic decontamination: embedding-level eval-set leakage screening.
# --------------------------------------------------------------------------
DECON_EVAL_LABEL = 0
DECON_SEM_QUANTILE = 0.99

# kind codes on the candidate frame (see _decon_candidates_kernel)
_DECON_FINITE, _DECON_NAN, _DECON_NULL = 0, 1, 2


def _decon_candidates_kernel(ev_ids, ev_mat):
    """Build the mapInPandas scorer behind decontaminate_semantic: per
    training vector, emit every (eval_id, raw cosine) pair that can still
    win the downstream (round(cos,6) DESC, eval_id ASC) top-1 window —
    the near-max candidate set — instead of all |eval| pairs. Rounding and
    the window stay in Spark on these bit-identical raw values, so the
    winner is provably the same row (see the call site contract).

    Bit-exactness: the (batch × eval) dot matrix accumulates one dimension
    at a time in dimension order — the exact FP op sequence of the
    zip_with/aggregate fold — norms are the same fold's self-dot with
    sqrt, NULL only for a true zero vector (Spark's `when(d > 0, …)`
    passes NaN, which orders greater than any double), and the candidate
    margin is 2e-6 > the 1e-6 diameter of a 6-dp rounding class, so every
    pair tying the rounded max survives.

    Emission rules per training vector (m = |eval| > 0):
    * any VALID NaN cosine → all NaN pairs (Spark sorts NaN first under
      DESC; the window tie-breaks them by eval_id), kind=_DECON_NAN;
    * else any valid finite cosine → pairs with cos >= max_raw − 2e-6,
      kind=_DECON_FINITE (the `cos` column carries the raw double);
    * else (every pair NULL) → the single smallest eval_id, kind=
      _DECON_NULL — the row the all-NULL window would produce.
    The kind column reconstructs NaN/NULL on the Spark side explicitly so
    the result never depends on Arrow's NaN↔null coercion policy."""
    import numpy as np
    import pandas as pd

    m = len(ev_ids)
    ev_diag = np.zeros(m, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        for i in range(ev_mat.shape[1] if m else 0):
            ev_diag += ev_mat[:, i] * ev_mat[:, i]
        ev_null = ~(ev_diag > 0) & ~np.isnan(ev_diag)
        ev_nrm = np.where(ev_null, np.nan, np.sqrt(np.where(ev_null, 1.0, ev_diag)))
    min_ev = int(ev_ids.min()) if m else 0

    def score(batches):
        empty = pd.DataFrame(
            {
                "vec_id": np.zeros(0, dtype=np.int64),
                "eval_id": np.zeros(0, dtype=np.int64),
                "cos": np.zeros(0, dtype=np.float64),
                "kind": np.zeros(0, dtype=np.int32),
            }
        )
        if m == 0:
            yield empty
            return
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["emb"]]
            )
            b = len(ids)
            with np.errstate(invalid="ignore", divide="ignore"):
                a_diag = np.zeros(b, dtype=np.float64)
                for i in range(a_mat.shape[1]):
                    a_diag += a_mat[:, i] * a_mat[:, i]
                a_null = ~(a_diag > 0) & ~np.isnan(a_diag)
                a_nrm = np.where(
                    a_null, np.nan, np.sqrt(np.where(a_null, 1.0, a_diag))
                )
                dot = np.zeros((b, m), dtype=np.float64)
                for i in range(a_mat.shape[1]):
                    dot += np.multiply.outer(a_mat[:, i], ev_mat[:, i])
                cos = dot / np.multiply.outer(a_nrm, ev_nrm)
            valid = ~a_null[:, None] & ~ev_null[None, :]
            nan_valid = valid & np.isnan(cos)
            fin_valid = valid & ~np.isnan(cos)
            out_v, out_e, out_c, out_k = [], [], [], []
            row_has_nan = nan_valid.any(axis=1)
            if row_has_nan.any():
                ri, ci = np.nonzero(nan_valid[row_has_nan])
                out_v.append(ids[row_has_nan][ri])
                out_e.append(ev_ids[ci])
                out_c.append(np.zeros(len(ri), dtype=np.float64))
                out_k.append(np.full(len(ri), _DECON_NAN, dtype=np.int32))
            fin_rows = ~row_has_nan & fin_valid.any(axis=1)
            if fin_rows.any():
                fv = fin_valid[fin_rows]
                fc = np.where(fv, cos[fin_rows], -np.inf)
                mx = fc.max(axis=1)
                keep = fv & (fc >= (mx - 2e-6)[:, None])
                ri, ci = np.nonzero(keep)
                out_v.append(ids[fin_rows][ri])
                out_e.append(ev_ids[ci])
                out_c.append(cos[fin_rows][ri, ci])
                out_k.append(np.full(len(ri), _DECON_FINITE, dtype=np.int32))
            null_rows = ~row_has_nan & ~fin_valid.any(axis=1)
            if null_rows.any():
                nv = ids[null_rows]
                out_v.append(nv)
                out_e.append(np.full(len(nv), min_ev, dtype=np.int64))
                out_c.append(np.zeros(len(nv), dtype=np.float64))
                out_k.append(np.full(len(nv), _DECON_NULL, dtype=np.int32))
            if not out_v:
                continue
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_v),
                    "eval_id": np.concatenate(out_e),
                    "cos": np.concatenate(out_c),
                    "kind": np.concatenate(out_k),
                }
            )

    return score


@register(
    "decontaminate_semantic",
    tags=("decontamination", "similarity", "embedding"),
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings
        ),
        ev AS (SELECT * FROM e WHERE label = {DECON_EVAL_LABEL}),
        tr AS (SELECT * FROM e WHERE label <> {DECON_EVAL_LABEL}),
        scored AS (
            SELECT tr.vec_id, ev.vec_id AS eval_id,
                   ROUND(list_dot_product(tr.emb, ev.emb)
                         / (tr.nrm * ev.nrm), 6) AS cos
            FROM tr CROSS JOIN ev
        ),
        best AS (
            SELECT vec_id, eval_id AS nearest_eval_id, cos AS max_cos
            FROM (
                SELECT vec_id, eval_id, cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY cos DESC, eval_id
                       ) AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        cut AS (
            SELECT quantile_cont(max_cos, {DECON_SEM_QUANTILE}) AS tau
            FROM best
        )
        SELECT vec_id, nearest_eval_id, max_cos,
               max_cos >= cut.tau AS contaminated
        FROM best, cut
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination against the eval set (the third
    decontamination mode beside the n-gram broadcast-set and Bloom
    prefilters): every training vector reports its maximum cosine to ANY
    eval vector and the nearest eval id; vectors in the top 1%
    (1 − DECON_SEM_QUANTILE) of eval-similarity are flagged — the
    screen that catches paraphrased or re-embedded eval leakage n-gram
    overlap misses (Phi/Llama-class pipelines run exactly this check).

    Scale shape: the EVAL side is small by definition (a benchmark), so it
    broadcasts onto one streaming pass over the training vectors; the
    per-vector argmax is a WindowGroupLimit-friendly top-1 window keyed by
    the training id (per-partition group size = |eval|, a constant). The
    flag threshold is a DATA-DERIVED quantile of the max-cosine
    distribution (1-row broadcast), so the report stays non-vacuous under
    any testdata regeneration — an absolute cosine cutoff would go silent
    the way the r9 Adamic-Adar cap audit found."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("emb")
    )
    # The eval side is benchmark-sized by contract — the same bounded class
    # as the broadcast it previously rode in on — so it collects once and
    # closes over the mapInPandas scorer (the embedding_cosine_pairs_blas
    # pattern). The scorer replaces the 750k-pair crossJoin whose
    # higher-order cosine fold evaluated INTERPRETED per pair (the r14 §16
    # pathology, 3× the semdedup pair count): one narrow pass over the
    # training vectors emits only the near-max candidate pairs, and the
    # original ROUND + (cos DESC, eval_id ASC) top-1 window runs in Spark
    # over that tiny frame on bit-identical raw doubles — winner provably
    # unchanged (margin 2e-6 > the 1e-6 diameter of a 6-dp rounding class;
    # NaN/NULL cases reconstructed explicitly via the kind column; pinned
    # by test_similarity_recall.py::test_decon_kernel_candidates_bit_exact).
    ev_rows = (
        emb.filter(F.col("label") == DECON_EVAL_LABEL)
        .select("vec_id", "emb")
        .collect()
    )
    ev_ids = np.array([r["vec_id"] for r in ev_rows], dtype=np.int64)
    ev_mat = np.array([r["emb"] for r in ev_rows], dtype=np.float64)
    tr = emb.filter(F.col("label") != DECON_EVAL_LABEL)
    cand = tr.select("vec_id", "emb").mapInPandas(
        _decon_candidates_kernel(ev_ids, ev_mat),
        "vec_id long, eval_id long, cos double, kind int",
    )
    raw_cos = (
        F.when(F.col("kind") == _DECON_NAN, F.lit(float("nan")))
        .when(F.col("kind") == _DECON_NULL, F.lit(None).cast("double"))
        .otherwise(F.col("cos"))
    )
    scored = cand.select(
        "vec_id", "eval_id", F.round(raw_cos, 6).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "eval_id")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("eval_id").alias("nearest_eval_id"),
            F.col("cos").alias("max_cos"),
        )
    )
    # `best` feeds both the tau percentile and the final report; checkpoint
    # it so the broadcast-scoring pass over the training corpus runs ONCE
    # (the rfm/skipgram reuse discipline)
    from dblp_to_csv_spark.session import session_checkpoint_dir

    best_dir = session_checkpoint_dir("_semdecon_best_")
    best.write.mode("overwrite").parquet(best_dir)
    best = spark.read.parquet(best_dir)
    cut = best.agg(
        F.expr(f"percentile(max_cos, {DECON_SEM_QUANTILE})").alias("tau")
    )
    return best.crossJoin(F.broadcast(cut)).select(
        "vec_id",
        "nearest_eval_id",
        "max_cos",
        (F.col("max_cos") >= F.col("tau")).alias("contaminated"),
    )
