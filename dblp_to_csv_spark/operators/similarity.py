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
from dblp_to_csv_spark.sources.tables import load_table

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
    return F.sqrt(_dot(a, a))


def _sign_bucket(emb: Column) -> Column:
    """Sign-LSH bucket key: concatenated sign bits of the first SIGN_BITS
    coordinates (1-indexed, matching DuckDB list indexing)."""
    return F.concat(
        *[
            F.when(F.element_at(emb, i + 1) >= 0, "1").otherwise("0")
            for i in range(SIGN_BITS)
        ]
    )


_SIGN_BUCKET_SQL = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(SIGN_BITS)
)

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
    emb = load_table(spark, sf_dir, "embeddings").select(
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
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


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


@register(
    "similarity_topk_ivf",
    tags=("similarity", "topk", "ml"),
    oracle=None,  # k-means centroids aren't reproducible in SQL; rows-only.
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: k-means (pyspark.ml, fixed seed) learns 8
    centroids; every vector gets a centroid-id bucket; queries score only
    their own cell. Same plan shape as the sign-LSH variant with a LEARNED
    bucket key — at scale the centroid id is a partition/cluster column
    computed at ingest, so the probe prunes to 1/k of the corpus (nprobe>1 =
    also scan neighboring cells).

    Correctness is covered by tests/test_similarity_recall.py (recall vs the
    brute-force oracle-verified baseline), not a SQL oracle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    vecs = emb.select("vec_id", array_to_vector("emb").alias("features"))
    model = KMeans(k=8, seed=42, maxIter=20).fit(vecs)
    bucketed = model.transform(vecs).select(
        "vec_id",
        vector_to_array("features").alias("emb"),
        F.col("prediction").alias("bucket"),
    )
    bucketed = bucketed.withColumn("nrm", _norm(F.col("emb")))
    q = F.broadcast(bucketed.filter(F.col("vec_id") < N_QUERIES)).alias("q")
    c = bucketed.alias("c")
    cos = _dot(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    scored = q.join(
        c,
        (F.col("q.vec_id") != F.col("c.vec_id"))
        & (F.col("q.bucket") == F.col("c.bucket")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


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
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
