"""User-extension surface (SURVEY.md §2.3 'UDF/UDAF/UDTF'): the reference has
no extension point at all; the engine exposes Spark's — demonstrated with
Arrow-batched Pandas UDFs (never row-at-a-time Python UDFs):

* scalar pandas_udf   — vectorized per-row compute over Arrow batches
* applyInPandas       — grouped-map (per-group Python with full-group frame)

Both are registered with oracles: the UDFs compute deterministic arithmetic
DuckDB can mirror, so even the Python-extension path is hash-verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table


def _l2_norm_udf():
    # created lazily: pandas_udf resolves its return type against the active
    # SparkSession, so it cannot be built at import time
    @pandas_udf("double")
    def _l2_norm(emb: pd.Series) -> pd.Series:
        """Vectorized L2 norm over the embedding column: the whole Arrow
        batch is stacked into ONE (batch, dim) float64 matrix and reduced
        with a single einsum — no per-row Python anywhere (the previous
        emb.map ran a Python lambda per element; r9 verdict item 3)."""
        out = pd.Series(np.nan, index=emb.index, dtype="float64")
        valid = emb.notna()
        if valid.any():  # np.stack rejects empty/ragged-with-None batches
            m = np.stack(emb[valid].to_numpy())
            out[valid] = np.sqrt(np.einsum("ij,ij->i", m, m))
        return out

    return _l2_norm


@register(
    "pandas_udf_vector_norm",
    tags=("udf", "similarity"),
    oracle="""
        SELECT vec_id,
               ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
        FROM embeddings
    """,
)
def pandas_udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow transfer) computing per-vector L2 norms;
    float64 accumulation matches the JVM/DuckDB double path, so the oracle
    hash-matches the Python-computed values after 6-dp rounding."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    return emb.select("vec_id", F.round(_l2_norm_udf()("emb"), 6).alias("l2_norm"))


@register(
    "udtf_tokenize_documents",
    tags=("udf", "udtf", "text"),
    oracle="""
        -- per-ROW lateral (no re-join on doc_id: a self-join would square
        -- duplicate-key rows, where the Spark LATERAL fans out linearly —
        -- dupkey-sweep pin)
        SELECT w.doc_id, s.i AS pos, w.words[s.i] AS word
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS words
              FROM documents WHERE doc_id < 20) w,
        UNNEST(generate_series(1, len(w.words))) AS s(i)
    """,
)
def udtf_tokenize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (table function): one input row → many output
    rows via a LATERAL join, the user-extension path for custom flattening
    logic built-ins can't express. The tokenizer itself is trivial on
    purpose — what's exercised is the UDTF protocol (class-based eval/yield,
    SQL registration, lateral correlation). Restricted to 20 docs: UDTFs are
    row-at-a-time Python, the documented slow path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class Tokenize:
        def eval(self, text: str):
            import re

            pos = 0
            for tok in re.split(r"[^a-z0-9]+", (text or "").lower()):
                if tok:
                    pos += 1
                    yield pos, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


@register(
    "apply_in_pandas_label_stats",
    tags=("udf", "agg"),
    oracle="""
        SELECT label,
               COUNT(*) AS n_vectors,
               MIN(CAST(embedding[1] AS DOUBLE)) AS min_first,
               MAX(CAST(embedding[1] AS DOUBLE)) AS max_first
        FROM embeddings
        GROUP BY label
    """,
)
def apply_in_pandas_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each label's vectors arrive as one pandas
    frame (the custom-aggregation escape hatch when built-in aggregates
    can't express the computation). min/max avoid float-summation order
    differences so the oracle comparison is exact."""
    emb = load_table(spark, sf_dir, "embeddings")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # float32 values are exactly representable in float64, so min/max
        # (no summation) compare bit-exact against the oracle — no rounding.
        # NULL/empty embeddings and a NULL label group must not kill the
        # worker (r10 all-NULL probe): they degrade to NaN entries, which
        # pandas min/max skip, mirroring SQL MIN/MAX over NULLs.
        first = pdf["embedding"].map(
            lambda v: float(v[0]) if v is not None and len(v) else float("nan")
        )
        lbl = pdf["label"].iloc[0]
        return pd.DataFrame(
            {
                "label": [int(lbl) if pd.notna(lbl) else None],
                "n_vectors": [len(pdf)],
                "min_first": [None if pd.isna(first.min()) else first.min()],
                "max_first": [None if pd.isna(first.max()) else first.max()],
            }
        )

    return emb.groupBy("label").applyInPandas(
        stats, "label int, n_vectors long, min_first double, max_first double"
    )


@register(
    "udaf_geomean_order_price",
    tags=("udf", "agg"),
    oracle="""
        SELECT o_orderstatus,
               ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geomean_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def udaf_geomean_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE via a GROUPED_AGG pandas_udf (the UDAF corner
    of the UDF matrix: scalar pandas_udf / UDTF / applyInPandas /
    grouped-agg): geometric mean of order price per status, computed as
    exp(mean(log x)) over each group's Arrow batch.

    Scale note: a grouped-agg pandas UDF has NO partial aggregation — every
    group's values ship to one executor (fine for bounded groups; for
    corpus-sized groups use the built-in expression form, which this
    oracle's EXP(AVG(LN(x))) shows is expressible without Python at all —
    the UDF exists to cover the API surface, and the log-sum trick keeps
    the two numerically aligned)."""
    import numpy as np

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count is a pandas aggregate too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(geomean("o_totalprice"), 4).alias("geomean_price"),
        n_rows("o_totalprice").alias("n_orders"),
    )


@register(
    "udtf_ngrams_polymorphic",
    tags=("udf", "udtf", "text"),
    oracle="""
        SELECT doc_id, words[i] AS w0, words[i+1] AS w1
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS words
              FROM documents WHERE doc_id < 10),
             UNNEST(range(1, len(words))) AS u(i)
    """,
)
def udtf_ngrams_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze``): the output schema is
    computed at plan time from a literal argument — ``ngrams_udtf(text, 2)``
    emits columns (w0, w1); pass 3 and it would emit (w0, w1, w2) with no
    code change. ``analyze`` receives the constant-folded argument value and
    returns the StructType, so Catalyst sees a fully typed relation before
    execution — the schema-on-plan contract a fixed ``returnType`` cannot
    express. Tokenization replicates words() exactly (same regex/lower/
    non-empty filter) so the DuckDB oracle stays in lock-step. Restricted to
    10 docs: UDTFs are row-at-a-time Python, the documented slow path."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import StringType, StructType

    class Ngrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("ngrams_udtf: n must be a positive integer literal")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            import re

            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("ngrams_udtf", udtf(Ngrams))
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 10
    ).createOrReplaceTempView("_udtf_ngram_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.w0, t.w1
        FROM _udtf_ngram_docs d, LATERAL ngrams_udtf(d.text, 2) t
        """
    )


@register(
    "arrow_quantize_embeddings",
    tags=("udf", "similarity", "multimodal"),
    oracle="""
        WITH t AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        s AS (
            SELECT vec_id, e,
                   GREATEST(list_max(list_transform(e, x -> abs(x))), 1e-12)
                       AS sc
            FROM t
        )
        SELECT vec_id,
               array_to_string(
                   list_transform(e, x -> CAST(FLOOR(127 * x / sc + 0.5)
                                               AS INT)), '|') AS q_codes,
               ROUND(sc, 9) AS scale
        FROM s
    """,
)
def arrow_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface — the zero-copy batch extension point below
    pandas_udf (no pandas conversion semantics in the exchange; the Python
    side receives raw Arrow RecordBatches). Demonstrated with symmetric
    int8 quantization of the embedding column (max-abs per-row scale,
    q = floor(127·x/scale + 0.5)) — the embedding-compression step ANN
    serving stacks run before indexing, cutting vector bytes 4× ahead of
    the shuffle/index build.

    Cross-engine exactness: all arithmetic is float64 (the float32 column
    is widened BEFORE any op, matching the oracle's CAST to DOUBLE[]), and
    floor(x + 0.5) rounds in one fixed direction — multiply, divide, add,
    floor are each correctly-rounded IEEE ops, so Python and DuckDB produce
    bit-identical int codes; only the reported scale needs the usual 9-dp
    rounding. The 1e-12 floor guards the all-zero vector identically on
    both sides. Codes serialize as a '|'-joined string (the registry's
    flat-scalar output contract; a library consumer would keep the
    array<int> and write it straight to the index)."""
    import pyarrow as pa

    def quantize(batches):
        for b in batches:
            pdf = b.to_pandas()
            qs, scales = [], []
            for v in pdf["embedding"]:
                # a NULL embedding row must not kill the Python worker:
                # quantize it as the empty vector (codes '', floor scale)
                e = (
                    np.array([], dtype=np.float64)
                    if v is None
                    else np.asarray(v, dtype=np.float64)
                )
                sc = max(float(np.max(np.abs(e))), 1e-12) if e.size else 1e-12
                codes = np.floor(127.0 * e / sc + 0.5).astype(np.int32)
                qs.append("|".join(str(c) for c in codes))
                # half-AWAY rounding (floor(x*1e9+0.5)/1e9; sc > 0 always):
                # Python's round() is banker's half-even and would diverge
                # from DuckDB ROUND on exact 9-dp ties
                scales.append(np.floor(sc * 1e9 + 0.5) / 1e9)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(pdf["vec_id"], type=pa.int64()),
                    "q_codes": pa.array(qs, type=pa.string()),
                    "scale": pa.array(scales, type=pa.float64()),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(quantize, "vec_id long, q_codes string, scale double")
