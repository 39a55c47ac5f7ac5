"""The reference's own operators (SURVEY.md §2.1) re-expressed as
oracle-checkable DataFrame queries over the driver's test tables:

* A2 — multi-value collapse + sorted ``|``-join (XMLToCSV.py:178-179)
* R1 — distinct + dense-ID dictionary encode (XMLToCSV.py:354-359)
* R2 — edge materialization (XMLToCSV.py:352-353, 360-361)
* T1 — per-value type-detection ladder (XMLToCSV.py:246-281)
* A3+A4 — type observation + lattice unification (XMLToCSV.py:236-243, 314-331)
* P2 — data-driven empty-column pruning (XMLToCSV.py:94, 142-143)

The same primitives power the XML ETL plan (plans/etl.py); here they run over
parquet so the driver's DuckDB oracle can verify the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.type_inference import (
    DETECT_TYPE_SQL,
    detect_type_column,
    unify_types_column,
)
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A2: multi-value collapse — sorted, '|'-joined array cells.
# --------------------------------------------------------------------------
@register(
    "array_collapse_returnflags",
    bench=True,
    tags=("reference", "agg", "array"),
    oracle="""
        SELECT l_orderkey,
               STRING_AGG(l_returnflag, '|' ORDER BY l_returnflag) AS flags,
               COUNT(*) AS n_vals
        FROM lineitem
        GROUP BY l_orderkey
    """,
)
def array_collapse_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (XMLToCSV.py:178-179): repeated values within one record collapse to
    a lexicographically-sorted '|'-joined cell — here one 'record' is an
    orderkey and the repeated column is l_returnflag.

    collect_list + array_sort + array_join is a single hash aggregate (one
    shuffle on the group key); per-group state is bounded by group size, not
    table size, so it scales to any number of groups."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list("l_returnflag")), "|").alias("flags"),
        F.count("*").alias("n_vals"),
    )


# --------------------------------------------------------------------------
# R1: dictionary encode — distinct values get dense sequential node IDs that
# continue the record-ID counter (XMLToCSV.py:358-362).
# --------------------------------------------------------------------------
def dict_encode(df: DataFrame, column: str, id_offset_df: DataFrame) -> DataFrame:
    """Distinct values of ``column`` → (node_id, value) with dense IDs
    starting at the (broadcast, single-row) offset in ``id_offset_df._n``.

    IDs are assigned by value order (deterministic) rather than the
    reference's first-seen order — SURVEY.md §7.4: node IDs are surrogates,
    so comparisons are join-based, and a sorted assignment is reproducible
    in a distributed engine while first-seen order is not. The dictionary is
    small by construction (distinct values of a category-like column), so the
    un-partitioned row_number window is not a bottleneck; for high-cardinality
    dictionaries the ETL plan switches to a partition-offset zipWithIndex."""
    w = Window.orderBy(column)
    return (
        df.select(column)
        .distinct()
        .withColumn("_rank", F.row_number().over(w) - 1)
        .crossJoin(F.broadcast(id_offset_df))
        .select(
            (F.col("_rank") + F.col("_n")).cast("long").alias("node_id"),
            F.col(column).alias("value"),
        )
    )


@register(
    "dict_encode_segments",
    tags=("reference", "graph", "window"),
    oracle="""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1
                    + (SELECT COUNT(*) FROM customer) AS BIGINT) AS node_id,
               c_mktsegment AS value
        FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def dict_encode_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 over customer.c_mktsegment: node IDs continue after the record-ID
    counter (here: the customer row count), mirroring the reference's shared
    ID namespace (XMLToCSV.py:161, 358-362)."""
    cust = load_table(spark, sf_dir, "customer")
    offset = cust.agg(F.count("*").alias("_n"))
    return dict_encode(cust, "c_mktsegment", offset)


# --------------------------------------------------------------------------
# R2: edge materialization — (record_id, value_node_id) pairs.
# --------------------------------------------------------------------------
@register(
    "segment_edges",
    tags=("reference", "graph", "join"),
    oracle="""
        WITH nodes AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1
                        + (SELECT COUNT(*) FROM customer) AS BIGINT) AS node_id,
                   c_mktsegment AS value
            FROM (SELECT DISTINCT c_mktsegment FROM customer)
        )
        SELECT c.c_custkey AS start_id, n.node_id AS end_id
        FROM customer c
        JOIN nodes n ON c.c_mktsegment = n.value
    """,
)
def segment_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 (XMLToCSV.py:360-361): one edge per (record, value) pair — the fact
    table joins the broadcast dictionary on the value, never shuffling the
    fact side."""
    cust = load_table(spark, sf_dir, "customer")
    offset = cust.agg(F.count("*").alias("_n"))
    nodes = dict_encode(cust, "c_mktsegment", offset)
    return cust.join(F.broadcast(nodes), cust.c_mktsegment == nodes.value).select(
        F.col("c_custkey").alias("start_id"),
        F.col("node_id").alias("end_id"),
    )


# --------------------------------------------------------------------------
# T1: per-value type-detection ladder.
# --------------------------------------------------------------------------
# Quirk corpus from SURVEY.md §1.3 [verified]: leading zeros → integer;
# signed/exponent/bare-point numerics → string; strict date regex; etc.
_TYPE_SAMPLES = [
    "007",
    "42",
    "12345678901234567890",
    "-5",
    "+3",
    "3.14",
    ".5",
    "5.",
    "1e5",
    "2020-01-01",
    "2020-13-01",
    "2020-1-1",
    "2020-01-01 10:30",
    "2020-01-01 10:30:45",
    "2020-01-01T10:30:45",
    "TRUE",
    "False",
    "hello",
    "",
    "1-10",
    # unicode-digit quirks (reference int()/float() accept Nd digits):
    "١٢٣",  # Arabic-Indic run → integer
    "12٣",  # mixed ASCII+Nd → integer
    "٣٤.٥",  # Nd float → float
    "²",  # isdigit-but-not-int superscript → string
    "٢٠٢٠-٠١-٠١",  # fromisoformat is ASCII-only → string
]


@register(
    "type_detect_ladder",
    tags=("reference", "scalar", "types"),
    oracle="SELECT value, {ladder} AS detected FROM (VALUES {values}) t(value)".format(
        ladder=DETECT_TYPE_SQL.format(col="value"),
        values=", ".join(f"('{v}')" for v in _TYPE_SAMPLES),
    ),
)
def type_detect_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (XMLToCSV.py:246-281): the 6-type detection ladder evaluated over
    the quirk corpus — parity between the Spark expression ladder and the
    DuckDB CASE twin is exactly what the oracle verifies."""
    df = spark.createDataFrame([(v,) for v in _TYPE_SAMPLES], "value string")
    return df.select("value", detect_type_column("value").alias("detected"))


# --------------------------------------------------------------------------
# A3 + A4: type observation (collect set of detected types per column) and
# lattice unification.
# --------------------------------------------------------------------------
_UNIFY_SQL = """
    CASE WHEN n = 0 THEN 'string'
         WHEN n = 1 THEN only_t
         WHEN has_s THEN 'string'
         WHEN n = 2 AND has_i AND has_f THEN 'float'
         WHEN n = 2 AND has_d AND has_dt THEN 'datetime'
         ELSE 'string' END
"""


@register(
    "type_unification_lattice",
    tags=("reference", "agg", "types"),
    oracle="""
        WITH vals AS (
            SELECT 'event_id_str' AS column_name, CAST(event_id AS VARCHAR) AS value FROM events
            UNION ALL
            SELECT 'event_type', event_type FROM events
            UNION ALL
            SELECT 'ts_str', strftime(ts, '%Y-%m-%d %H:%M:%S') FROM events
            UNION ALL
            SELECT 'mixed_num',
                   CASE WHEN event_id % 2 = 0 THEN '42' ELSE '3.14' END FROM events
            UNION ALL
            SELECT 'mostly_empty',
                   CASE WHEN event_id % 100 = 0 THEN 'true' ELSE '' END FROM events
        ),
        det AS (
            SELECT column_name, {ladder} AS t FROM vals
        ),
        flags AS (
            SELECT column_name,
                   COUNT(DISTINCT CASE WHEN t <> 'any' THEN t END) AS n,
                   MIN(CASE WHEN t <> 'any' THEN t END) AS only_t,
                   BOOL_OR(t = 'string')   AS has_s,
                   BOOL_OR(t = 'integer')  AS has_i,
                   BOOL_OR(t = 'float')    AS has_f,
                   BOOL_OR(t = 'date')     AS has_d,
                   BOOL_OR(t = 'datetime') AS has_dt
            FROM det GROUP BY column_name
        )
        SELECT column_name, {unify} AS unified_type FROM flags
    """.format(ladder=DETECT_TYPE_SQL.format(col="value"), unify=_UNIFY_SQL),
)
def type_unification_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4 (XMLToCSV.py:236-243, 314-331): observe the per-value type of
    five derived columns over events, collect the distinct observed-type set
    per column in one aggregate, and fold it through the unification lattice
    on the executors (unify_types_column).

    One shuffle total: the melt (posexplode) is narrow, the per-column
    collect_set is a hash aggregate over 5 keys."""
    ev = load_table(spark, sf_dir, "events")
    derived = ev.select(
        F.col("event_id").cast("string").alias("event_id_str"),
        F.col("event_type").alias("event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.when(F.col("event_id") % 2 == 0, "42").otherwise("3.14").alias("mixed_num"),
        F.when(F.col("event_id") % 100 == 0, "true").otherwise("").alias("mostly_empty"),
    )
    melted = derived.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column_name"), F.col(c).alias("value"))
                    for c in derived.columns
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.value")
    observed = melted.select(
        "column_name", detect_type_column("value").alias("t")
    ).groupBy("column_name").agg(F.collect_set("t").alias("types"))
    return observed.select(
        "column_name", unify_types_column(F.col("types")).alias("unified_type")
    )


# --------------------------------------------------------------------------
# P2: data-driven empty-column pruning.
# --------------------------------------------------------------------------
def non_empty_columns(df: DataFrame) -> DataFrame:
    """P2 (XMLToCSV.py:94, 142-143): keep only columns observed non-empty on
    ≥1 row. One full-scan aggregate computes every column's non-empty count
    simultaneously (single job, map-side combined), then the tiny 1×N result
    is unpivoted — no per-column scan loops, no driver collect."""
    counts = df.agg(
        *[
            F.count(F.when(F.col(c).cast("string") != "", 1)).alias(c)
            for c in df.columns
        ]
    )
    melted = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column_name"), F.col(c).alias("n_nonempty"))
                    for c in df.columns
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.n_nonempty")
    return melted.filter(F.col("n_nonempty") > 0).select("column_name")


@register(
    "prune_empty_columns",
    tags=("reference", "schema"),
    oracle="""
        WITH counts AS (
            SELECT 'c_custkey' AS column_name,
                   COUNT(CASE WHEN CAST(c_custkey AS VARCHAR) <> '' THEN 1 END) AS n_nonempty
            FROM customer
            UNION ALL
            SELECT 'c_name', COUNT(CASE WHEN c_name <> '' THEN 1 END) FROM customer
            UNION ALL
            SELECT 'ghost', 0
        )
        SELECT column_name FROM counts WHERE n_nonempty > 0
    """,
)
def prune_empty_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 over a projection of customer with an injected all-null 'ghost'
    column: the ghost must be pruned, the real columns survive."""
    cust = load_table(spark, sf_dir, "customer")
    proj = cust.select(
        "c_custkey", "c_name", F.lit(None).cast("string").alias("ghost")
    )
    return non_empty_columns(proj)
