"""Graph analytics over relationally-derived graphs (SURVEY.md §2.3/§2.4).

The dedup family already runs two graph algorithms over the near-dup pair
graph (connected components and fixed-point PageRank, operators/dedup.py);
this module covers graph analytics whose input graph is DERIVED FROM A
RELATIONAL TABLE — here the part co-occurrence ("co-purchase") graph: two
parts are adjacent iff some order contains both. Triangle counting over
that graph is the classic MapReduce graph benchmark (Suri & Vassilvitskii,
WWW'11) and the shape every cohesion/community metric builds on.

The reference (XMLToCSV.py:1-415) has no graph surface; its closest notion
is the node/edge CSV export for neo4j (XMLToCSV.py:361-414) — this module
is what the engine itself can ANSWER about such graphs without exporting.

Scale notes:
* Edge derivation is an equi-join on the order key with bounded fan-out
  (pairs per order are quadratic in lines-per-order, which TPC-H caps at 7).
* Triangle enumeration uses DEGREE ORIENTATION: each undirected edge points
  from its (degree, id)-smaller endpoint to the larger one, so every
  triangle is generated from exactly one wedge and the wedge fan-out per
  node is bounded by its out-degree ≤ O(sqrt(m)) — the standard skew bound
  that makes distributed triangle counting survive power-law degree
  distributions (a raw id-orientation lets one low-id hub generate
  degree² wedges).
* All joins are equi-joins on node keys; the only shuffles are the edge
  self-joins and the final per-node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table


def copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected distinct part co-occurrence edges (u < v by part id)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )


@register(
    "graph_triangle_count",
    tags=("graph", "join"),
    oracle="""
        WITH e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        t AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        corners AS (
            SELECT a AS node FROM t
            UNION ALL SELECT b FROM t
            UNION ALL SELECT c FROM t
        ),
        cnt AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY node
        )
        SELECT p.p_partkey AS l_partkey,
               COALESCE(c.n_triangles, 0) AS n_triangles
        FROM part p LEFT JOIN cnt c ON c.node = p.p_partkey
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the part co-occurrence graph:
    for every part, in how many triangles (triples of mutually co-ordered
    parts) does it sit. The local-clustering signal behind community
    detection and recommendation ("parts that close triangles together").

    Orientation equivalence: Spark orients edges by (degree, id) for the
    skew bound; the oracle enumerates by raw id order. Both generate every
    undirected triangle exactly once, so the per-corner count multiset is
    identical — the orientation is a physical strategy, not a semantic
    choice."""
    e0 = copart_edges(spark, sf_dir)
    deg = (
        e0.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient each edge from its (deg, id)-smaller endpoint to the larger.
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    ordered = e0.join(du, "u").join(dv, "v")
    fwd = F.struct("deg_u", "u") < F.struct("deg_v", "v")
    e = ordered.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.struct(F.col("deg_v").alias("d"), F.col("v").alias("n")))
        .otherwise(F.struct(F.col("deg_u").alias("d"), F.col("u").alias("n")))
        .alias("dst_ord"),
    )
    # Wedges at each src: unordered out-neighbor pairs, paired once by
    # orientation order; a wedge closes iff the oriented edge (v, w) exists.
    e1 = e.select(
        F.col("src"), F.col("dst").alias("v"), F.col("dst_ord").alias("v_ord")
    )
    e2 = e.select(
        F.col("src"), F.col("dst").alias("w"), F.col("dst_ord").alias("w_ord")
    )
    wedges = e1.join(e2, "src").filter(F.col("v_ord") < F.col("w_ord"))
    closing = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    corners = tri.select(F.explode(F.array("src", "v", "w")).alias("node"))
    cnt = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return part.join(
        cnt, part["l_partkey"] == cnt["node"], "left"
    ).select(
        "l_partkey",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )
