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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import round_ties_down
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import (
    SMALL_SCAN_FANOUT_BYTES,
    fan_out_small,
    input_bytes,
    load_table,
)


# Session-scoped materialized-artifact cache: (applicationId, artifact,
# abspath(sf_dir)) -> parquet path. The co-occurrence edge list and its
# symmetrized twin are pure functions of the input tables, and EVERY graph
# query derives them — without the cache a 5-query graph bench re-runs the
# lineitem self-join 5x and the symmetrization 3x (~20 s of the sf0.1
# series). Input parquet is immutable for a session's lifetime (the driver
# regenerates testdata only between rounds), so staleness cannot arise
# within the keyed applicationId; a new session gets a fresh key.
_ARTIFACT_CACHE: dict[tuple[str, str, str, str], str] = {}


def _cache_key(
    spark: SparkSession, artifact: str, sf_dir: str, checkpoint_dir: str | None
) -> tuple[str, str, str, str]:
    import os

    # checkpoint_dir participates in the key: a caller that pins an explicit
    # (shared-filesystem) checkpoint location must not be handed an artifact
    # that an earlier default-dir call materialized in a local temp root.
    return (
        spark.sparkContext.applicationId,
        artifact,
        os.path.abspath(sf_dir),
        checkpoint_dir or "",
    )


def copart_edges(
    spark: SparkSession,
    sf_dir: str,
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Undirected distinct part co-occurrence edges (u < v by part id).

    By default the edge list parquet-checkpoints once per SESSION (the
    _ARTIFACT_CACHE materialized-view policy): every consumer reads it
    ≥ 2× (degrees + orientation, peel rounds, wedge sides), and without the
    checkpoint each read re-runs the lineitem self-join + distinct —
    measured ~40% of graph_triangle_count's whole-query time at sf0.1.
    On a non-local master ``checkpoint_dir`` must point at a shared
    filesystem (session.checkpoint_base guard)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    key = _cache_key(spark, "copart_edges", sf_dir, checkpoint_dir)
    if checkpoint and key in _ARTIFACT_CACHE:
        return spark.read.parquet(_ARTIFACT_CACHE[key])
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Fan-out-gated stream side (guide §2.5): single-row-group parquet means
    # the broadcast join's pair fan-out (~4M rows at sf0.1) and the partial
    # distinct otherwise run in ONE task; edges are integer pairs + DISTINCT
    # — order-exact. Under the SAME small-input gate the build side is
    # pinned to a broadcast: the planner would otherwise see the
    # repartitioned side as equally broadcastable and could put the
    # exchange under the build — wasting the fan-out. ABOVE the gate both
    # sides stay plain scans and the planner keeps choosing the at-scale
    # join (lineitem never broadcasts at 100 TB).
    small = input_bytes(li) <= SMALL_SCAN_FANOUT_BYTES
    a_side = (fan_out_small(li, "l_orderkey") if small else li).alias("a")
    b_side = F.broadcast(li.alias("b")) if small else li.alias("b")
    edges = (
        a_side.join(b_side, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    if not checkpoint:
        return edges
    path = os.path.join(checkpoint_base(spark, checkpoint_dir, "_copart_"), "edges")
    edges.write.mode("overwrite").parquet(path)
    _ARTIFACT_CACHE[key] = path
    return spark.read.parquet(path)


def copart_und(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """The symmetrized (both-directions) co-occurrence edge frame,
    materialized once per session (kcore peel, coreness fixpoint, and the
    graph_report composite all consume it)."""
    from dblp_to_csv_spark.session import checkpoint_base

    import os

    key = _cache_key(spark, "copart_und", sf_dir, checkpoint_dir)
    if key in _ARTIFACT_CACHE:
        return spark.read.parquet(_ARTIFACT_CACHE[key])
    base_dir = checkpoint_base(spark, checkpoint_dir, "_copart_und_")
    und = write_und_edges(spark, copart_edges(spark, sf_dir), base_dir)
    _ARTIFACT_CACHE[key] = os.path.join(base_dir, "und")
    return und


# Shared oracle CTEs: distinct co-occurrence edges -> id-ordered triangle
# enumeration -> per-corner counts (plus degrees for the coefficient).
# _TRI_BODY references an `e(u, v)` CTE the caller provides, so composites
# can share one MATERIALIZED edge CTE across triangle/coreness sections.
_TRI_BODY = """
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
"""

_TRI_CTES = f"""
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        {_TRI_BODY}
"""


@register(
    "graph_triangle_count",
    tags=("graph", "join"),
    oracle=f"""
        WITH {_TRI_CTES}
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
    cnt = triangle_table(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return part.join(
        cnt, part["l_partkey"] == cnt["node"], "left"
    ).select(
        "l_partkey",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )


def degrees(e0: DataFrame) -> DataFrame:
    """(n, deg) over the undirected edge frame — shared by orientation,
    the clustering coefficient, and any consumer that would otherwise
    re-run the endpoint-explode aggregate."""
    return (
        e0.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


# Broadcast gate for the triangle closing probe: oriented edges are 16 B
# rows, so 30M edges ≈ 500 MB built hash — the practical single-executor
# ceiling; bigger graphs fall back to the shuffle join.
_CLOSING_BROADCAST_MAX_EDGES = 30_000_000


def triangle_table(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """(node, n_triangles) materialized once per session — the same
    _ARTIFACT_CACHE policy as the edge list and the coreness table: the
    wedge join is the most expensive per-call graph stage left after the
    coreness finisher, and graph_triangle_count, the clustering
    coefficient, and graph_report all need exactly it."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    key = _cache_key(spark, "triangles", sf_dir, checkpoint_dir)
    if key in _ARTIFACT_CACHE:
        return spark.read.parquet(_ARTIFACT_CACHE[key])
    base_dir = checkpoint_base(spark, checkpoint_dir, "_tri_")
    cnt = triangle_counts(spark, sf_dir)
    path = os.path.join(base_dir, "cnt")
    cnt.write.mode("overwrite").parquet(path)
    _ARTIFACT_CACHE[key] = path
    return spark.read.parquet(path)


def triangle_counts(
    spark: SparkSession,
    sf_dir: str,
    e0: DataFrame | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """(node, n_triangles) for every node in ≥1 triangle — the degree-
    oriented enumeration shared by the count and coefficient queries.
    ``e0``/``deg`` let a composite pass the already-checkpointed edge
    frame and its degree aggregate instead of recomputing them."""
    if e0 is None:
        e0 = copart_edges(spark, sf_dir)
    if deg is None:
        deg = degrees(e0)
    # One bounded agg feeds BOTH physical gates below: the closing-probe
    # broadcast cap (was a count) and the packed-key eligibility (max node
    # id). The scan is the parquet-backed edge artifact — cheap next to the
    # wedge stage it tunes.
    _stats = e0.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.greatest("u", "v")).alias("mx"),
    ).first()
    n_edges, max_id = _stats["n"], _stats["mx"]
    # Packed orientation keys (r14 optimization round): with node ids
    # < 2^31, the (deg, id) orientation struct packs into ONE long
    # (deg<<32 | id — deg < n ≤ max_id+1 < 2^31 keeps the shift positive
    # and the order exactly lexicographic), and the closing-edge key packs
    # the (v, w) pair the same way. The wedge stream — 34× the edge count
    # at sf0.1 — then pays a long compare + a single-long hash probe per
    # wedge instead of a struct compare + a two-column probe: measured
    # 4.6 → 2.1 s on the wedge stage, identical (node, n_triangles) output.
    # Ids at or past 2^31 (far beyond any testdata SF) keep the struct
    # path — both branches are the same plan shape, only the key width
    # differs.
    pack_ok = max_id is not None and max_id < (1 << 31)
    # Orient each edge from its (deg, id)-smaller endpoint to the larger.
    # The degree table is node-sized — broadcast it into both endpoint
    # joins so the edge frame streams map-side (r12 cold-path audit:
    # measured 8.5 s → 4.9 s with the closing broadcast below at sf0.1).
    du = F.broadcast(deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u")))
    dv = F.broadcast(deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v")))
    ordered = e0.join(du, "u").join(dv, "v")
    if pack_ok:
        ord_u = F.shiftleft(F.col("deg_u").cast("long"), 32) + F.col("u")
        ord_v = F.shiftleft(F.col("deg_v").cast("long"), 32) + F.col("v")
        fwd = ord_u < ord_v
        dst_ord = F.when(fwd, ord_v).otherwise(ord_u)
    else:
        fwd = F.struct("deg_u", "u") < F.struct("deg_v", "v")
        dst_ord = (
            F.when(fwd, F.struct(F.col("deg_v").alias("d"), F.col("v").alias("n")))
            .otherwise(F.struct(F.col("deg_u").alias("d"), F.col("u").alias("n")))
        )
    e = ordered.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        dst_ord.alias("dst_ord"),
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
    if pack_ok:
        closing = e.select(
            (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("vw")
        )
        probe = F.shiftleft(F.col("v"), 32) + F.col("w")
    else:
        closing = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        probe = None
    # The closing probe is EDGE-sized while the wedge stream it closes is
    # wedge-sized (sum of C(out-deg, 2) — 34× larger at sf0.1): broadcast
    # the edges so the wedges are never shuffled. Size-gated on the edge
    # count from the shared agg above: past broadcast capacity the join
    # degrades to the shuffle it was before, nothing else changes. (Wedge
    # generation itself stays a shuffle join on src — measured:
    # broadcasting e2 REGRESSES 4.9 s → 7.6 s.)
    if n_edges <= _CLOSING_BROADCAST_MAX_EDGES:
        closing = F.broadcast(closing)
    if pack_ok:
        tri = wedges.join(closing, probe == F.col("vw")).select("src", "v", "w")
    else:
        tri = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    corners = tri.select(F.explode(F.array("src", "v", "w")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


@register(
    "graph_clustering_coefficient",
    tags=("graph", "join"),
    oracle=f"""
        WITH {_TRI_CTES},
        deg AS (
            SELECT node, COUNT(*) AS deg
            FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node
        )
        SELECT p.p_partkey AS l_partkey,
               CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
               COALESCE(c.n_triangles, 0) AS n_triangles,
               CASE WHEN COALESCE(d.deg, 0) >= 2
                    THEN ROUND((2.0 * COALESCE(c.n_triangles, 0)
                                / (d.deg * (d.deg - 1))) - 5e-13, 6) + 0.0
                    ELSE 0 END AS clustering_coeff
        FROM part p
        LEFT JOIN deg d ON d.node = p.p_partkey
        LEFT JOIN cnt c ON c.node = p.p_partkey
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node: 2·T(v) / (deg(v)·(deg(v)−1))
    — the fraction of a node's neighbor pairs that are themselves adjacent.
    THE graph-cohesion diagnostic (high coefficient = tightly bundled
    co-purchase neighborhoods; near zero = hub-and-spoke). Derived entirely
    from the shared triangle/degree frames — one extra aggregate over the
    edge endpoints, no new joins over the corpus.

    The single float division happens once per node on both engines
    (float64, correctly rounded), so 6-dp rounding is hash-stable."""
    e0 = copart_edges(spark, sf_dir)
    deg = degrees(e0)
    cnt = triangle_table(spark, sf_dir)
    deg = deg.withColumnRenamed("n", "node")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    joined = (
        part.join(deg, part["l_partkey"] == deg["node"], "left")
        .drop(deg["node"])
        .join(cnt, part["l_partkey"] == cnt["node"], "left")
        .drop(cnt["node"])
    )
    d = F.coalesce(F.col("deg"), F.lit(0))
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    coeff = F.when(
        d >= 2, round_ties_down(2.0 * t / (d * (d - 1)), 6)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "l_partkey",
        d.cast("long").alias("degree"),
        t.cast("long").alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


# k-core contract: exactly KCORE_ROUNDS peeling rounds (early-exit on
# convergence is a no-op-skipping optimization, not a semantic change — a
# converged set is a fixpoint of the peel, so extra rounds cannot alter it).
# tests/test_graph_analytics.py asserts the peel CONVERGES well within the
# round budget on the test corpus, making the answer the true k-core there.
KCORE_K = 80
KCORE_ROUNDS = 12


def _kcore_oracle() -> str:
    """Unrolled KCORE_ROUNDS peeling rounds as plain CTEs (aggregation in a
    recursive term is non-standard — same move as dedup.py's _pr_oracle)."""
    steps = []
    prev = "c0"
    for t in range(1, KCORE_ROUNDS + 1):
        steps.append(f"""
        c{t} AS MATERIALIZED (
            SELECT u AS node FROM (
                SELECT und.u, COUNT(*) AS c
                FROM und
                JOIN {prev} a ON a.node = und.u
                JOIN {prev} b ON b.node = und.v
                GROUP BY und.u
            ) WHERE c >= {KCORE_K}
        )""")
        prev = f"c{t}"
    # Every multiply-referenced CTE is MATERIALIZED: each round references
    # its predecessor twice (endpoint joins a and b), so inlining doubles
    # the operator tree per round — 2^KCORE_ROUNDS plan nodes, a
    # file-descriptor blowout on the parquet scan and an hours-long plan.
    # Materialization makes the oracle linear in KCORE_ROUNDS, like the
    # temp-table loop it mirrors.
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        c0 AS (SELECT DISTINCT u AS node FROM und),
        {",".join(steps)}
        SELECT p.p_partkey AS l_partkey,
               ({prev}.node IS NOT NULL) AS in_core
        FROM part p LEFT JOIN {prev} ON {prev}.node = p.p_partkey
    """


@register("graph_kcore", tags=("graph", "iterative"), oracle=_kcore_oracle())
def graph_kcore(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """k-core decomposition (k = KCORE_K) of the part co-occurrence graph by
    iterative peeling: each round drops every node whose degree among the
    SURVIVORS is below k; the fixpoint is the maximal subgraph where every
    node has ≥ k surviving neighbors — the density skeleton community
    detection and influence analysis start from.

    Contract: exactly KCORE_ROUNDS rounds (the oracle unrolls them as
    CTEs); the Spark loop early-exits once the survivor count stops
    falling, which is semantically free — the peel is monotone, so a
    converged set is a fixpoint and remaining rounds are no-ops. The
    convergence test pins that the budget is generous (2× the observed
    rounds-to-fixpoint).

    Scale shape: the edge list materializes once per session (copart_und);
    each round broadcasts the node-sized survivor set into two semi-joins
    of the STREAMING edge list (no per-round edge shuffle; at node counts
    beyond broadcast capacity drop the hints — the joins degrade to
    shuffles, nothing else changes) plus a map-side-combinable degree
    count. The survivor count rides the round's checkpoint write via
    df.observe (one action per round); survivor sets checkpoint per round
    to cut lineage, superseded rounds are cleaned up by the session
    checkpoint root."""
    import os

    from pyspark.sql import Observation

    from dblp_to_csv_spark.session import checkpoint_base

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    gate = (
        CORENESS_LOCAL_FINISH_EDGES
        if local_finish_edges is None
        else local_finish_edges
    )
    # In-core collapse (VERDICT r11 item 3, the coreness finisher recipe):
    # the DIRECTED edge artifact is parquet-backed so count() is a
    # metadata read, and und holds exactly 2× its rows by construction
    # (write_und_edges), so the gate needs no und at all — under it the
    # whole peel runs as ONE vectorized task over the directed frame
    # (symmetrized in-kernel, half the input bytes, no und artifact
    # build; r14 §4 boundary audit) instead of ~rounds sequential actions
    # whose fixed cost dominates at this size. Identical fixpoint (pinned
    # local == distributed == pure-Python); above the gate — the 100 TB
    # regime — the broadcast rounds below remain the path.
    e0 = copart_edges(spark, sf_dir)
    if gate and 2 * e0.count() <= gate:

        def peel(u, v):
            import numpy as np
            import pyarrow as pa

            if len(u) == 0:
                return pa.table({"node": np.empty(0, dtype=np.int64)})
            nodes, alive = _kcore_peel_numpy(u, v, KCORE_K, KCORE_ROUNDS)
            return pa.table({"node": nodes[alive].astype(np.int64)})

        core = _graph_single_task(e0, peel, "node long", symmetrize=True)
        return part.join(
            core, part["l_partkey"] == core["node"], "left"
        ).select("l_partkey", F.col("node").isNotNull().alias("in_core"))

    und = copart_und(spark, sf_dir, checkpoint_dir)
    base_dir = checkpoint_base(spark, checkpoint_dir, "_kcore_")
    cur = und.select(F.col("u").alias("node")).distinct()
    n_cur = cur.count()
    for rnd in range(KCORE_ROUNDS):
        nxt = (
            und.join(F.broadcast(cur.withColumnRenamed("node", "u")), "u", "semi")
            .join(F.broadcast(cur.withColumnRenamed("node", "v")), "v", "semi")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select(F.col("u").alias("node"))
        )
        obs = Observation(f"kcore_{rnd}")
        nxt_path = os.path.join(base_dir, f"round_{rnd}")
        nxt.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(nxt_path)
        nxt = spark.read.parquet(nxt_path)
        n_nxt = obs.get["n"]
        converged = n_nxt == n_cur
        cur, n_cur = nxt, n_nxt
        if converged:
            break
    return part.join(
        cur, part["l_partkey"] == cur["node"], "left"
    ).select("l_partkey", F.col("node").isNotNull().alias("in_core"))


AA_MIN_COMMON = 25  # report pairs sharing at least this many neighbors


@register(
    "graph_adamic_adar",
    tags=("graph", "join", "ml"),
    oracle=f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
        wed AS (
            SELECT a.u AS u, a.v AS x, b.v AS y
            FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
        ),
        sc AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                   ROUND(SUM(1.0 / ln(deg.d)), 6) AS aa_score
            FROM wed JOIN deg ON deg.u = wed.u
            GROUP BY x, y
        )
        SELECT x AS part_a, y AS part_b, common_neighbors, aa_score
        FROM sc WHERE common_neighbors >= {AA_MIN_COMMON}
    """,
)
def graph_adamic_adar(
    spark: SparkSession,
    sf_dir: str,
    deg_cap: int | None = None,
    deg_cap_quantile: float | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over the part co-occurrence graph: score
    every part pair sharing ≥ AA_MIN_COMMON neighbors by
    Σ 1/ln(deg(u)) over their common neighbors u — rare shared neighbors
    count more than hubs. The classic "will these co-occur next?"
    recommendation signal; the report cut is an INTEGER common-neighbor
    threshold, so the result-set boundary is engine-exact (the float score
    only needs the usual 6-dp rounding: ≤ a few dozen terms per pair, well
    inside the grid).

    Scale shape: the wedge enumeration fans out deg(u)² pairs per center
    node — unlike triangle counting there is no orientation trick (a common
    neighbor counts wherever it sits in the degree order), so the at-scale
    dial is ``deg_cap``: hub centers above the cap are dropped before the
    self-join, which bounds the fan-out and barely moves the score (a hub's
    1/ln(deg) contribution is the smallest term by construction — the
    standard Adamic–Adar approximation; capped ⊆ exact is pinned in
    tests/test_graph_analytics.py). The degree table attaches to the
    CENTER side before the wedge join, so the deg column rides the small
    frame. The registered query runs uncapped (exact)."""
    e0 = copart_edges(spark, sf_dir)
    und = e0.select("u", "v").union(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    centers = und.join(deg, "u")
    if deg_cap_quantile is not None:
        # Data-derived cap: FLOOR(ROUND(exact percentile, 6)) — the
        # winsorize discipline (percentile ≡ QUANTILE_CONT; rounding
        # before FLOOR absorbs interpolation ulps) — attached as a 1-row
        # broadcast so the cap never touches the driver.
        capf = deg.agg(
            F.floor(
                F.round(F.expr(f"percentile(d, {deg_cap_quantile})"), 6)
            )
            .cast("long")
            .alias("cap")
        )
        centers = (
            centers.join(F.broadcast(capf))
            .filter(F.col("d") <= F.col("cap"))
            .drop("cap")
        )
    elif deg_cap is not None:
        centers = centers.filter(F.col("d") <= deg_cap)
    a = centers.alias("a")
    b = centers.select("u", "v").alias("b")
    wed = a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v")))
    return (
        wed.select(
            F.col("a.v").alias("part_a"),
            F.col("b.v").alias("part_b"),
            F.col("a.d").alias("d"),
        )
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("aa_score"),
        )
        .filter(F.col("common_neighbors") >= AA_MIN_COMMON)
    )


# Hub cap for the capped (scale-path) Adamic-Adar twin, as a DEGREE
# QUANTILE: centers above the p-AA_CAP_QUANTILE degree are dropped. An
# absolute cap (r1-r8: 100) silently went VACUOUS when a testdata
# regeneration pushed the median degree past it — every center dropped,
# zero rows, a hash-green row proving nothing. A quantile cap tracks the
# graph: it always drops exactly the top tail, at any scale factor.
AA_CAP_QUANTILE = 0.90


@register(
    "graph_adamic_adar_capped",
    tags=("graph", "join", "ml", "skew"),
    oracle=f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
        cap AS (
            SELECT CAST(FLOOR(ROUND(
                QUANTILE_CONT(d, {AA_CAP_QUANTILE}), 6)) AS BIGINT) AS cap
            FROM deg
        ),
        ctr AS (
            SELECT und.u, und.v, deg.d
            FROM und JOIN deg ON deg.u = und.u
            WHERE deg.d <= (SELECT cap FROM cap)
        ),
        wed AS (
            SELECT a.u AS u, a.d AS d, a.v AS x, b.v AS y
            FROM ctr a JOIN ctr b ON a.u = b.u AND a.v < b.v
        ),
        sc AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                   ROUND(SUM(1.0 / ln(d)), 6) AS aa_score
            FROM wed GROUP BY x, y
        )
        SELECT x AS part_a, y AS part_b, common_neighbors, aa_score
        FROM sc WHERE common_neighbors >= {AA_MIN_COMMON}
    """,
)
def graph_adamic_adar_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-capped Adamic–Adar — the scale twin of ``graph_adamic_adar``
    (the dedup family's exact/capped pattern): centers with degree above
    the AA_CAP_QUANTILE degree quantile (the top-decile hubs) are dropped
    before the wedge self-join, bounding the per-node fan-out at cap²
    regardless of the degree distribution. The cap is DATA-DERIVED — an
    exact degree percentile computed as a 1-row broadcast (the winsorize
    percentile ≡ QUANTILE_CONT discipline), so it stays meaningful at
    every scale factor where an absolute constant can fall below the
    median and vacuously drop the whole graph. The dropped hubs are
    precisely the lowest-weight terms (1/ln(deg) is smallest for hubs),
    so capped scores lower-bound exact scores and the pair ranking is
    nearly preserved — capped ⊆ exact pairs AND non-emptiness are pinned
    in tests/test_graph_analytics.py.

    Honest cost note: on a POWER-LAW graph the top decile owns most of
    Σdeg² and this cap is the whole game; the co-part test graph has
    near-UNIFORM degrees (sf0.1: p50 115 / p90 151 / max 222), so the
    p90 cap keeps ~82% of the wedge work and the capped twin costs
    ~0.8× the exact query (~52 s at sf0.1) — which is why it is NOT in
    the graph bench series (benching it here would re-bench the exact
    path; the old absolute cap's 6 s was measuring an 88%-vacuous wedge
    set)."""
    return graph_adamic_adar(spark, sf_dir, deg_cap_quantile=AA_CAP_QUANTILE)


# Coreness contract: exactly CORENESS_ROUNDS h-index iterations (same
# fixed-round discipline as PageRank and graph_kcore — early exit at the
# fixpoint is a no-op skip, never a semantic change, because the estimate
# is monotone non-increasing and an unchanged round is a fixpoint). The
# estimate AT the fixpoint is the exact coreness (Montresor et al. 2011);
# tests pin that the budget covers convergence on the test corpus with
# margin, plus consistency with graph_kcore's fixed-k membership.
# Sized against MEASURED rounds-to-fixpoint of the synchronous h-index
# iteration on the driver testdata: 19 rounds at sf0.01, 38 at sf0.1
# (scripts/coreness_rounds_probe.py) — 64 gives >=1.68x margin at sf0.1.
# The r1-r8 budget of 30 was sufficient at driver-correctness scale but
# TRUNCATED the iteration at sf0.1 (the mirrored 30-round oracle hid it);
# early exit keeps the realized cost at the actual convergence count.
CORENESS_ROUNDS = 64

# Reliable-anchor cadence for the fixpoint loop: rounds materialize via
# eager localCheckpoint (executor-local, no FS round-trip); every Nth round
# also lands on the checkpoint filesystem so an executor loss costs at most
# N rounds of recompute on retry instead of the whole loop.
CORENESS_ANCHOR_EVERY = 8


def write_und_edges(spark: SparkSession, e0: DataFrame, base_dir: str) -> DataFrame:
    """Checkpoint the symmetrized (both-directions) edge frame under
    ``base_dir`` and return the parquet-backed read — the one copy every
    iterative consumer (k-core peel, coreness rounds, a composite's degree
    seed) re-reads instead of re-deriving the lineitem self-join."""
    import os

    und_path = os.path.join(base_dir, "und")
    e0.select("u", "v").union(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).write.mode("overwrite").parquet(und_path)
    return spark.read.parquet(und_path)


# In-core finisher gate (ROADMAP 25 / VERDICT r10 item 3): when the WHOLE
# symmetrized edge frame fits one task comfortably (8M rows x 16 B = 128 MB
# plus a |V| x (H+1) counting matrix), the entire h-index fixpoint runs as
# ONE mapInArrow task in vectorized numpy instead of ~rounds/2 sequential
# Spark actions whose per-action fixed cost (broadcast build + job setup)
# dominates at this size. This is the adaptive-execution move applied to
# iterative state: pick the physical strategy by measured size. Above the
# gate — the 100 TB regime, where co-occurrence graphs carry billions of
# edges — the distributed broadcast rounds below remain the path, and the
# fixpoint is provably identical (test_graph_analytics pins local ==
# distributed == pure-Python on multiple graphs).
CORENESS_LOCAL_FINISH_EDGES = 8_000_000

# The finisher's counting-matrix kernel is O(|V| * c_max) MEMORY — cheap at
# bench scale but a high-degree graph near the edge gate could ask for
# gigabytes; beyond this many cells (~0.5 GB x2 at int64) each round uses
# the O(m log m)-time / O(m)-memory sort kernel instead. Module-level so
# tests can force the sort path.
_HINDEX_MATRIX_CELL_CAP = 1 << 26


def _hindex_fixpoint_numpy(u, v, seed=None):
    """Vectorized h-index fixpoint over int arrays (u, v) holding BOTH edge
    directions. Returns (node_ids, coreness) numpy arrays. ``seed`` maps
    node id -> starting upper bound; defaults to degree capped at the
    degree-sequence h-index (the same pointwise-upper-bound family the
    distributed loop seeds from — any seed >= coreness reaches the same
    fixpoint)."""
    import numpy as np

    nodes, u_idx = np.unique(u, return_inverse=True)
    v_idx = np.searchsorted(nodes, v)  # und is symmetric: same node set
    n = len(nodes)
    if seed is None:
        cor = np.bincount(u_idx, minlength=n).astype(np.int64)
        # degree-sequence h-index cap H = max{h : #{deg >= h} >= h}
        desc = np.sort(cor)[::-1]
        h_mask = desc >= np.arange(1, n + 1)
        cap = int(h_mask.sum())
        np.minimum(cor, cap, out=cor)
    else:
        cor = seed.astype(np.int64)
    # scaffolding for the sort-based kernel (stable edge order by u, group
    # starts, positional ranks) — built lazily on the FIRST sort round and
    # reused after: the common case is all-matrix rounds, where an O(m log m)
    # argsort over the whole edge set would be pure wasted work
    sort_scaffold = None

    def scaffold():
        nonlocal sort_scaffold
        if sort_scaffold is None:
            edge_order = np.argsort(u_idx, kind="stable")
            u_sorted = u_idx[edge_order]
            group_starts = np.flatnonzero(
                np.r_[True, u_sorted[1:] != u_sorted[:-1]]
            )
            rank_plus_1 = (
                np.arange(len(u_sorted), dtype=np.int64)
                - np.repeat(
                    group_starts, np.diff(np.r_[group_starts, len(u_sorted)])
                )
                + 1
            )
            sort_scaffold = (edge_order, u_sorted, group_starts, rank_plus_1)
        return sort_scaffold

    while True:
        c_max = int(cor.max(initial=0))
        if n * (c_max + 1) <= _HINDEX_MATRIX_CELL_CAP:
            # counts[u, c] = #neighbors of u with cor == c (flat bincount);
            # cum[u, c] = #neighbors with cor >= c; h = max_c min(cum, c)
            key = u_idx * (c_max + 1) + cor[v_idx]
            counts = np.bincount(key, minlength=n * (c_max + 1)).reshape(
                n, c_max + 1
            )
            cum = counts[:, ::-1].cumsum(axis=1)[:, ::-1]
            new_cor = np.minimum(
                cum[:, 1:], np.arange(1, c_max + 1, dtype=np.int64)
            ).max(axis=1, initial=0)
        else:
            # per-u neighbor cors sorted descending; h-index via the
            # classic max over i of min(i, c_i) with reduceat group maxes
            edge_order, u_sorted, group_starts, rank_plus_1 = scaffold()
            corv = cor[v_idx][edge_order]
            order_in_group = np.lexsort((-corv, u_sorted))
            m_vals = np.minimum(rank_plus_1, corv[order_in_group])
            new_cor = np.maximum.reduceat(m_vals, group_starts)
        if np.array_equal(new_cor, cor):
            return nodes, cor
        cor = new_cor


def _coreness_local_finish(
    spark: SparkSession,
    edges: DataFrame,
    cor: DataFrame | None,
    symmetrize: bool = False,
) -> DataFrame:
    """Run the whole fixpoint as ONE executor-side task via
    _graph_single_task (coalesce(1) + mapInArrow — no exchange; see its
    docstring). ``edges`` is the symmetrized frame, or the directed frame
    with ``symmetrize=True`` (identical fixpoint on half the input bytes).
    The optional seed frame is NODE-sized, so it collects to the driver
    and ships in the task closure — the same data movement a broadcast
    would make, without a second input exchange. Only valid under the
    CORENESS_LOCAL_FINISH_EDGES gate — the caller checks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    seed_pdf = cor.toPandas() if cor is not None else None

    def finish(u, v):
        if len(u) == 0:
            return pa.table(
                {
                    "n": np.empty(0, dtype=np.int64),
                    "cor": np.empty(0, dtype=np.int64),
                }
            )
        seed = None
        if seed_pdf is not None and not seed_pdf.empty:
            nodes = np.unique(u)
            s = seed_pdf.set_index("n")["cor"]
            # nodes absent from the seed frame fall back to their degree
            deg = np.bincount(
                np.searchsorted(nodes, u), minlength=len(nodes)
            ).astype(np.int64)
            seed = s.reindex(nodes).fillna(pd.Series(deg, index=nodes)).to_numpy()
        nodes, out = _hindex_fixpoint_numpy(u, v, seed)
        return pa.table(
            {"n": nodes.astype(np.int64), "cor": out.astype(np.int64)}
        )

    return _graph_single_task(
        edges, finish, "n long, cor long", symmetrize=symmetrize
    )


def _kcore_peel_numpy(u, v, k: int, rounds: int):
    """Vectorized k-core peel over int arrays (u, v) holding BOTH edge
    directions: each round keeps nodes with >= k edges into the surviving
    set. Returns (node_ids, alive_mask). Early-exits on convergence —
    semantically free, the peel is monotone (graph_kcore's contract)."""
    import numpy as np

    nodes, u_idx = np.unique(u, return_inverse=True)
    v_idx = np.searchsorted(nodes, v)  # symmetric und: same node set
    alive = np.ones(len(nodes), dtype=bool)
    n_alive = len(nodes)
    for _ in range(rounds):
        mask = alive[u_idx] & alive[v_idx]
        deg = np.bincount(u_idx[mask], minlength=len(nodes))
        alive = deg >= k  # a peeled node has deg 0 < k: stays dead
        n_next = int(alive.sum())
        if n_next == n_alive:
            break
        n_alive = n_next
    return nodes, alive


# Cell budget for the per-round (node × distinct-label) counting matrix in
# _lpa_rounds_numpy — same class as _HINDEX_MATRIX_CELL_CAP: above it a
# round falls back to the sort-based path (identical labels either way).
_LPA_MATRIX_CELL_CAP = 1 << 26


def _lpa_rounds_numpy(u, v, rounds: int):
    """Exactly ``rounds`` synchronous label-propagation rounds (most
    frequent neighbor label, ties to the SMALLEST label — the
    graph_label_propagation contract) vectorized over int arrays holding
    both edge directions. Returns (node_ids, final_labels). Labels are
    tracked as indices into the sorted node array, so smallest-index ==
    smallest-id and the tiebreak is exact.

    Round shapes (r14 kernel audit — 2.2 → 0.9 s at sf0.1, labels pinned
    identical to the one-unique-per-round original on crafted, random
    multi-edge, and all-SF graphs):
    * round 1, distinct edges (the und contract): every starting label is
      distinct and every neighbor appears exactly once, so all
      (u, label) counts are 1 and the (count desc, label asc) argmax is
      just the SMALLEST NEIGHBOR — the first edge of each group in one
      sorted (u, v) key array; the same sort detects multi-edges, which
      fall back to the generic round.
    * later rounds: the label set collapses fast (sf0.1: 20k → 952 → 556
      → 170), so counts go through a dense (n × |labels|) bincount
      matrix while it fits _LPA_MATRIX_CELL_CAP — np.argmax ties to the
      first (= smallest) compact label, preserving the tiebreak exactly;
      above the cap a round keeps the original flat-unique path."""
    import numpy as np

    nodes, u_idx = np.unique(u, return_inverse=True)
    v_idx = np.searchsorted(nodes, v)
    n = len(nodes)
    label = np.arange(n, dtype=np.int64)
    if rounds <= 0 or n == 0:
        return nodes, nodes[label]
    u64 = u_idx.astype(np.int64)
    ks = np.sort(u64 * n + v_idx)
    first_in_group = np.r_[True, (ks[1:] // n) != (ks[:-1] // n)]
    multi = bool(np.any(ks[1:] == ks[:-1]))
    for rnd in range(rounds):
        if rnd == 0 and not multi:
            label = ks[first_in_group] % n
            continue
        lab_set = np.unique(label)
        n_lab = len(lab_set)
        if n * n_lab <= _LPA_MATRIX_CELL_CAP:
            compact = np.searchsorted(lab_set, label)
            key = u64 * n_lab + compact[v_idx]
            counts = np.bincount(key, minlength=n * n_lab).reshape(n, n_lab)
            label = lab_set[np.argmax(counts, axis=1)]
            continue
        # (u, neighbor-label) pair counts via one flat unique; pick per-u
        # argmax with (count desc, label asc) by lexsort — nodes update
        # synchronously from the PREVIOUS round's labels
        key = u64 * n + label[v_idx]
        uk, counts = np.unique(key, return_counts=True)
        ku, klab = uk // n, uk % n
        order = np.lexsort((klab, -counts, ku))
        ku_o = ku[order]
        sel = order[np.r_[True, ku_o[1:] != ku_o[:-1]]]
        new_label = label.copy()
        new_label[ku[sel]] = klab[sel]
        label = new_label
    return nodes, nodes[label]


def _bfs_levels_numpy(u, v, seeds: int, rounds: int):
    """Multi-source level-synchronous BFS vectorized over int arrays
    holding both edge directions: sources are the ``seeds`` smallest node
    ids at distance 0; each round expands the frontier one hop, capped at
    ``rounds`` with early exit on an empty frontier. Returns
    (node_ids, dist) for REACHED nodes only — exactly the union of level
    frames the distributed loop materializes (distances are canonical BFS
    levels, so local == distributed needs no tie-break argument)."""
    import numpy as np

    nodes, u_idx = np.unique(u, return_inverse=True)
    v_idx = np.searchsorted(nodes, v)
    n = len(nodes)
    dist = np.full(n, -1, dtype=np.int64)
    k = min(seeds, n)
    dist[:k] = 0  # nodes sorted ascending → first k ARE the k smallest ids
    frontier = np.zeros(n, dtype=bool)
    frontier[:k] = True
    for rnd in range(1, rounds + 1):
        new = np.unique(v_idx[frontier[u_idx]])
        new = new[dist[new] < 0]
        if len(new) == 0:
            break
        dist[new] = rnd
        frontier[:] = False
        frontier[new] = True
    reached = dist >= 0
    return nodes[reached], dist[reached]


def _graph_single_task(
    edges: DataFrame, fn, schema: str, symmetrize: bool = False
) -> DataFrame:
    """Collapse a whole iterative graph computation into ONE executor-side
    task over the full edge frame — the in-core finisher physical strategy
    (see CORENESS_LOCAL_FINISH_EDGES). ``fn`` maps the concatenated
    (u, v) int64 numpy arrays to a pyarrow.Table matching ``schema``.
    Only valid under the edge gate — the caller checks.

    coalesce(1) + mapInArrow, NOT groupBy(lit(0)) + applyInPandas: the
    constant-key group forces a full shuffle exchange (every edge row
    written to and read back from shuffle storage just to land in one
    task), while coalesce(1) on the parquet-backed artifact is a single
    task reading the files directly (r12 cold-path audit: the exchange
    was ~3× the kernel's own time at sf0.1). mapInArrow rather than
    mapInPandas because the kernels consume flat numpy arrays: the Arrow
    columns convert zero-copy, skipping the per-batch pandas DataFrame
    build and the 2.4M-row concat (r14 §4 boundary audit).

    ``symmetrize=True`` lets the caller ship the DIRECTED (u < v) edge
    frame — HALF the rows of the symmetrized artifact — and reconstruct
    both directions in-kernel with two concats: und is exactly
    e ∪ reverse(e) by construction (write_und_edges), and every finisher
    kernel is input-order-insensitive (np.unique/bincount/lexsort), so
    the result is identical while the single task reads half the bytes."""
    import numpy as np
    import pyarrow as pa

    def run(batches):
        us, vs = [], []
        for b in batches:
            us.append(b.column(0).to_numpy(zero_copy_only=False))
            vs.append(b.column(1).to_numpy(zero_copy_only=False))
        if us:
            u = np.concatenate(us)
            v = np.concatenate(vs)
        else:
            u = np.empty(0, dtype=np.int64)
            v = np.empty(0, dtype=np.int64)
        if symmetrize:
            u, v = np.concatenate([u, v]), np.concatenate([v, u])
        yield from fn(u.astype(np.int64, copy=False),
                      v.astype(np.int64, copy=False)).to_batches()

    return edges.select("u", "v").coalesce(1).mapInArrow(run, schema)


def coreness_fixpoint(
    spark: SparkSession,
    und: DataFrame,
    base_dir: str,
    cor: DataFrame | None = None,
    broadcast_nodes: bool = True,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """Iterate the neighborhood h-index to its fixpoint over a checkpointed
    ``und`` frame; returns the final (n, cor) frame. ``cor`` lets a caller
    seed with an already-computed degree frame (the composite shares it with
    the clustering coefficient); default seeds from ``und`` degrees.

    ``local_finish_edges`` overrides the CORENESS_LOCAL_FINISH_EDGES gate
    (0 disables — tests use it to force the distributed rounds): at or
    below the gate the whole fixpoint collapses into one vectorized
    executor-side task (_coreness_local_finish); above it the broadcast
    rounds below are the scale path.

    Per-round plan shape (the whole point): ``und`` is cached ONCE,
    hash-repartitioned by ``u`` — the window/group key. With
    ``broadcast_nodes`` (default), the node-sized (n, cor) frame is
    broadcast into the edge join, which therefore preserves the cached
    partitioning; the h-index window and the groupBy then need NO Exchange
    — a round is a single shuffle-free stage over the cached edges plus a
    |V|-sized broadcast collect. Edges are never re-shuffled and never
    re-read from parquet. Set ``broadcast_nodes=False`` for graphs whose
    NODE table exceeds broadcast capacity (billions of nodes): rounds fall
    back to shuffle joins — the GraphX/Pregel message-passing regime, where
    an |E|-sized shuffle per round is the honest cost.

    One ACTION per materialization: the convergence signal (count of nodes
    whose cor changed in the LAST chained round) rides the materialization
    via df.observe (executor-accumulated — the observed_keep_gate pattern),
    instead of a second count job. While the iteration is dense (most nodes
    still moving) TWO rounds chain per materialization: with the broadcast
    round shape, round r's only appearance in round r+1's plan is one
    BroadcastExchange that Spark's ReuseExchange evaluates once, so the
    pair costs ~1 round's scheduling overhead (measured sf0.1: 0.65 s/pair
    vs 0.75 s/single). Chains of 4+ REGRESS ~5× — exchange reuse stops
    holding across deeper nested broadcast builds — and under the OLD
    shuffle-join round shape even 2-chains regressed ~2× (the
    un-materialized predecessor re-evaluated against both the join and the
    window), which is why r1-r8 materialized every round.

    DELTA-ONLY recomputation (h-index fixpoints converge node-locally):
    each round carries (n, cor, changed); once under a quarter of nodes
    changed, a round re-evaluates only nodes with >= 1 neighbor whose cor
    changed last round (two broadcast semi-joins restrict the cached edge
    frame, preserving its partitioning) and merges unchanged nodes back
    with a left join. The per-round trajectory is provably identical to
    full recomputation: cor'(u) depends only on N(u)'s cors, so a node
    with no changed neighbor would recompute to its current value.

    Materialization: eager localCheckpoint per round (truncates lineage
    without a filesystem round-trip) with a parquet anchor under
    ``base_dir`` every CORENESS_ANCHOR_EVERY rounds. localCheckpoint
    blocks are not recoverable on executor loss; the periodic reliable
    anchor bounds a retry to at most CORENESS_ANCHOR_EVERY rounds."""
    import os

    from pyspark.sql import Observation

    gate = (
        CORENESS_LOCAL_FINISH_EDGES
        if local_finish_edges is None
        else local_finish_edges
    )
    # In-core collapse (see CORENESS_LOCAL_FINISH_EDGES): the edge frame is
    # parquet-backed, so count() is a metadata read. Identical fixpoint —
    # only the physical strategy changes.
    if gate and und.count() <= gate:
        return _coreness_local_finish(spark, und, cor)

    und_u = und.select("u", "v").repartition("u").persist()
    maybe_bcast = F.broadcast if broadcast_nodes else (lambda df: df)
    if cor is None:
        cor = und_u.groupBy("u").agg(F.count(F.lit(1)).alias("cor")).select(
            F.col("u").alias("n"), "cor"
        )
    # Cap the degree seed at the degree-sequence h-index H = max{h :
    # #{u : deg(u) >= h} >= h}: a k-core has >= k+1 nodes of degree >= k,
    # so kmax <= H and min(deg, H) stays a pointwise upper bound on
    # coreness — the monotone iteration reaches the SAME fixpoint (the
    # 64-round degree-seeded oracle meets it from above) in <= the rounds.
    # On a skewed graph this collapses hub start values from max-degree to
    # ~kmax; on the near-uniform test graph it trims only the top tail —
    # either way it costs one tiny aggregate over the node-sized seed and
    # a 1-row collect (metadata-sized). The distinct-degree window frame is
    # |distinct degrees|, fine unpartitioned.
    cum_all = Window.orderBy(F.desc("cor")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    h_row = (
        cor.groupBy("cor")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(cum_all))
        .agg(F.max(F.least(F.col("cum"), F.col("cor"))).alias("h"))
        .collect()[0]
    )
    if h_row["h"] is not None:
        cor = cor.select(
            "n", F.least(F.col("cor"), F.lit(int(h_row["h"]))).alias("cor")
        )
    # Cumulative neighbor count per distinct cor value, descending: cum(c)
    # = #neighbors with cor >= c, so h = max over distinct c of
    # min(cum(c), c) — identical to max_i min(i, c_i) over the sorted list
    # but the sort runs on |distinct neighbor cors| rows per node instead
    # of deg(u) rows (the values concentrate as the fixpoint approaches).
    per_node_cum = Window.partitionBy("u").orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, 0
    )

    def one_round(state: DataFrame, sparse: bool) -> DataFrame:
        """(n, cor, changed) -> next (n, cor, changed)."""
        prev = state.select("n", "cor")
        if sparse:
            # Only recompute nodes touching a node changed last round.
            changed_nodes = maybe_bcast(state.filter("changed").select("n"))
            touched = maybe_bcast(
                und_u.join(
                    changed_nodes, und_u["v"] == changed_nodes["n"], "left_semi"
                ).select("u")
            )
            active_edges = und_u.join(touched, "u", "left_semi")
        else:
            active_edges = und_u
        prev_b = maybe_bcast(prev)
        nxt = (
            active_edges.join(prev_b, prev_b["n"] == active_edges["v"])
            .groupBy("u", F.col("cor").alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(per_node_cum))
            .groupBy("u")
            .agg(F.max(F.least(F.col("cum"), F.col("c"))).alias("new_cor"))
        )
        return prev.join(maybe_bcast(nxt), prev["n"] == nxt["u"], "left").select(
            "n",
            F.coalesce("new_cor", "cor").alias("cor"),
            (
                F.col("new_cor").isNotNull() & (F.col("new_cor") != F.col("cor"))
            ).alias("changed"),
        )

    cur = cor.select("n", "cor", F.lit(True).alias("changed"))
    n_changed = n_nodes = None  # unknown until the first observation
    rounds_done = 0
    try:
        while rounds_done < CORENESS_ROUNDS:
            sparse = n_changed is not None and n_changed * 4 <= n_nodes
            # Always chain a pair: in sparse mode the FIRST round is
            # delta-restricted (materialized flags), the second runs full —
            # chaining two delta rounds (second restricted via the first's
            # in-plan flags) was measured SLOWER than two singles (deeper
            # nested broadcast builds defeat exchange reuse), while a
            # delta+full pair costs the same as a full pair (~one round's
            # scheduling overhead) and halves the materialization count.
            # (r10: a chain of 3 re-measured ~1.6x SLOWER than pairs in the
            # same noise window — the regression already bites at depth 3.)
            batch = min(2, CORENESS_ROUNDS - rounds_done)
            merged = cur
            for _ in range(batch):
                merged = one_round(merged, sparse)
                sparse = False  # chained round lacks materialized flags
            obs = Observation(f"coreness_{rounds_done}")
            merged = merged.observe(
                obs,
                F.sum(F.col("changed").cast("long")).alias("chg"),
                F.count(F.lit(1)).alias("n_nodes"),
            )
            rounds_done += batch
            if rounds_done % CORENESS_ANCHOR_EVERY < batch:
                nxt_path = os.path.join(base_dir, f"round_{rounds_done}")
                merged.write.mode("overwrite").parquet(nxt_path)
                cur = spark.read.parquet(nxt_path)
            else:
                cur = merged.localCheckpoint(eager=True)
            n_changed = obs.get["chg"] or 0
            n_nodes = obs.get["n_nodes"]
            if n_changed == 0:
                break
        # Detach the result from the cached edges before unpersist: the
        # final frame is either a parquet read or a localCheckpoint, both
        # already materialized, so unpersist cannot force recompute.
        return cur.select("n", "cor")
    finally:
        und_u.unpersist()


def _coreness_step_ctes() -> tuple[str, str]:
    """The unrolled h-index rounds (c1..cN, each MATERIALIZED — the
    multiply-referenced-CTE rule) referencing caller-provided `und` and
    `c0(n, cor)` CTEs; returns (joined steps SQL, final CTE name) so the
    standalone oracle and the graph_report composite share one unroll."""
    steps = []
    prev = "c0"
    for t in range(1, CORENESS_ROUNDS + 1):
        steps.append(f"""
        c{t} AS MATERIALIZED (
            SELECT u AS n, MAX(LEAST(rnk, c)) AS cor FROM (
                SELECT und.u, {prev}.cor AS c,
                       ROW_NUMBER() OVER (PARTITION BY und.u
                                          ORDER BY {prev}.cor DESC) AS rnk
                FROM und JOIN {prev} ON {prev}.n = und.v
            ) GROUP BY u
        )""")
        prev = f"c{t}"
    return ",".join(steps), prev


def _coreness_oracle() -> str:
    steps, prev = _coreness_step_ctes()
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        c0 AS (SELECT u AS n, COUNT(*) AS cor FROM und GROUP BY u),
        {steps}
        SELECT p.p_partkey AS l_partkey,
               CAST(COALESCE({prev}.cor, 0) AS BIGINT) AS coreness
        FROM part p LEFT JOIN {prev} ON {prev}.n = p.p_partkey
    """


def coreness_table(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """The (n, cor) fixpoint for ``sf_dir``'s co-occurrence graph,
    materialized once per session (same _ARTIFACT_CACHE policy as the edge
    list): the 38-round sf0.1 loop is the single most expensive graph
    artifact, and both graph_coreness and graph_report need exactly it —
    the seed (und degrees) and the iteration are identical, so the results
    are the same table."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    key = _cache_key(spark, "coreness", sf_dir, checkpoint_dir)
    if key in _ARTIFACT_CACHE:
        return spark.read.parquet(_ARTIFACT_CACHE[key])
    base_dir = checkpoint_base(spark, checkpoint_dir, "_coreness_")
    # Same in-core gate as coreness_fixpoint, decided on the DIRECTED
    # edge artifact (und is exactly 2× its rows by construction): under
    # it the finisher consumes the directed frame symmetrized in-kernel —
    # no und artifact build, half the single-task input bytes (r14 §4
    # boundary audit). Above the gate the distributed rounds get the
    # symmetrized artifact they iterate over, exactly as before.
    e0 = copart_edges(spark, sf_dir)
    if (
        CORENESS_LOCAL_FINISH_EDGES
        and 2 * e0.count() <= CORENESS_LOCAL_FINISH_EDGES
    ):
        cor = _coreness_local_finish(spark, e0, None, symmetrize=True)
    else:
        und = copart_und(spark, sf_dir, checkpoint_dir)
        cor = coreness_fixpoint(spark, und, base_dir)
    path = os.path.join(base_dir, "final")
    cor.write.mode("overwrite").parquet(path)
    _ARTIFACT_CACHE[key] = path
    return spark.read.parquet(path)


@register("graph_coreness", tags=("graph", "iterative"), oracle=_coreness_oracle())
def graph_coreness(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """FULL core decomposition — every node's core number in one pass
    family, not one k at a time: iterate the neighborhood h-index
    (cor'(u) = max h such that ≥ h neighbors have cor ≥ h, seeded with the
    degree) to its fixpoint, which IS the coreness (Montresor, De Pellegrini
    & Miorandi 2011). Integer arithmetic end to end, so the unrolled-CTE
    oracle is hash-exact — the same trick that made PageRank verifiable.

    Scale shape: see coreness_fixpoint — zero-Exchange broadcast rounds
    over edges cached partitioned by the window key, delta-only recompute
    once sparse, h-index window bounded by each node's own degree.
    Cross-operator invariant pinned in tests: {{coreness ≥ k}} is exactly
    graph_kcore's k-core membership."""
    cor = coreness_table(spark, sf_dir, checkpoint_dir)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return part.join(cor, part["l_partkey"] == cor["n"], "left").select(
        "l_partkey",
        F.coalesce(F.col("cor"), F.lit(0)).cast("long").alias("coreness"),
    )


def _graph_report_oracle() -> str:
    steps, prev = _coreness_step_ctes()
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        {_TRI_BODY},
        deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
                FROM und GROUP BY u),
        c0 AS (SELECT u AS n, COUNT(*) AS cor FROM und GROUP BY u),
        {steps}
        SELECT p.p_partkey AS l_partkey,
               COALESCE(d.deg, 0) AS degree,
               COALESCE(c.n_triangles, 0) AS n_triangles,
               CASE WHEN COALESCE(d.deg, 0) >= 2
                    THEN ROUND((2.0 * COALESCE(c.n_triangles, 0)
                                / (d.deg * (d.deg - 1))) - 5e-13, 6) + 0.0
                    ELSE 0 END AS clustering_coeff,
               CAST(COALESCE({prev}.cor, 0) AS BIGINT) AS coreness,
               (COALESCE({prev}.cor, 0) >= {KCORE_K}) AS in_core
        FROM part p
        LEFT JOIN deg d ON d.node = p.p_partkey
        LEFT JOIN cnt c ON c.node = p.p_partkey
        LEFT JOIN {prev} ON {prev}.n = p.p_partkey
    """


@register(
    "graph_report",
    tags=("graph", "iterative", "composite"),
    oracle=_graph_report_oracle(),
)
def graph_report(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """One-pass graph analytics report — the composite built from the
    session's shared graph artifacts (ROADMAP #20, the curate_corpus
    pattern): the co-occurrence edge list, its symmetrized twin, and the
    coreness fixpoint table each materialize ONCE per session
    (_ARTIFACT_CACHE) no matter how many graph queries run; k-core
    membership falls out of coreness for free (coreness(u) >= k iff u is
    in the k-core — the cross-operator invariant
    tests/test_graph_analytics.py pins), so the peel loop never runs. Per
    part: degree, triangle count, local clustering coefficient, core
    number, KCORE_K-core membership.

    Cost vs running the four standalone queries cold: one lineitem
    self-join instead of four, one coreness fixpoint instead of (coreness
    + KCORE_ROUNDS peel rounds), one wedge join ever per session
    (triangle_table), and coreness ∥ triangles materialize CONCURRENTLY —
    cold report pays max() of the two, not the sum (r12: 36 s → 11.7 s
    quiet at sf0.1; warm 0.8 s, BASELINE §21)."""
    # e0 (u < v) feeds the triangle orientation AND the degrees: deg(n) is
    # the endpoint-count over the directed frame (degrees(e0) — identical
    # to the und groupBy since und = e0 ∪ reverse(e0) verbatim), so the
    # report no longer builds the symmetrized artifact at all under the
    # in-core gate (r14 s6; coreness_table stopped needing und in the §14
    # finisher rework — deg_und was its last unconditional consumer here).
    e0 = copart_edges(spark, sf_dir, checkpoint_dir=checkpoint_dir)
    deg_und = degrees(e0).withColumnRenamed("n", "u")
    # The two expensive artifacts are INDEPENDENT once the edge frames
    # exist, and their physical shapes are complementary — the coreness
    # finisher is one single-core task, the wedge join is a wide shuffle —
    # so materialize them CONCURRENTLY (Spark actions are thread-safe;
    # each artifact writes its own path). Cold graph_report pays
    # max(coreness, triangles) instead of the sum (r12 cold-path audit).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cor = pool.submit(coreness_table, spark, sf_dir, checkpoint_dir)
        f_cnt = pool.submit(triangle_table, spark, sf_dir, checkpoint_dir)
        cor, cnt = f_cor.result(), f_cnt.result()
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    deg = deg_und.select(F.col("u").alias("node"), "deg")
    joined = (
        part.join(deg, part["l_partkey"] == deg["node"], "left")
        .drop(deg["node"])
        .join(cnt, part["l_partkey"] == cnt["node"], "left")
        .drop(cnt["node"])
        .join(cor, part["l_partkey"] == cor["n"], "left")
        .drop(cor["n"])
    )
    d = F.coalesce(F.col("deg"), F.lit(0))
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    core = F.coalesce(F.col("cor"), F.lit(0))
    coeff = F.when(
        d >= 2, round_ties_down(2.0 * t / (d * (d - 1)), 6)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "l_partkey",
        d.cast("long").alias("degree"),
        t.cast("long").alias("n_triangles"),
        coeff.alias("clustering_coeff"),
        core.cast("long").alias("coreness"),
        (core >= KCORE_K).alias("in_core"),
    )


# ---------------------------------------------------------------------------
# Multi-source BFS distances (ROADMAP #17 — the traversal family)

BFS_SEEDS = 4  # the BFS_SEEDS smallest node ids seed the search (dist 0)
BFS_ROUNDS = 8  # round budget; the oracle unrolls exactly this many levels


def _bfs_oracle() -> str:
    """Unrolled level-synchronous BFS as plain CTEs: frontier f{t} expands
    through `und`, minus everything already in the distance table d{t-1}.
    Rounds past the last non-empty frontier are no-ops, so the fixed unroll
    equals the early-exiting Spark loop. Every multiply-referenced CTE is
    MATERIALIZED (the _kcore_oracle rule)."""
    steps = []
    for t in range(1, BFS_ROUNDS + 1):
        steps.append(f"""
        n{t} AS MATERIALIZED (
            SELECT DISTINCT und.v AS node
            FROM und JOIN f{t - 1} ON und.u = f{t - 1}.node
            WHERE und.v NOT IN (SELECT node FROM d{t - 1})
        ),
        d{t} AS MATERIALIZED (
            SELECT node, dist FROM d{t - 1}
            UNION ALL SELECT node, {t} AS dist FROM n{t}
        ),
        f{t} AS (SELECT node FROM n{t})""")
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        d0 AS MATERIALIZED (
            SELECT node, 0 AS dist FROM (
                SELECT DISTINCT u AS node FROM und ORDER BY u LIMIT {BFS_SEEDS}
            )
        ),
        f0 AS (SELECT node FROM d0),
        {",".join(steps)}
        SELECT p.p_partkey AS l_partkey,
               CAST(COALESCE(d.dist, -1) AS BIGINT) AS dist
        FROM part p LEFT JOIN d{BFS_ROUNDS} d ON d.node = p.p_partkey
    """


@register("graph_bfs_distances", tags=("graph", "iterative"), oracle=_bfs_oracle())
def graph_bfs_distances(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """Multi-source unweighted BFS over the part co-occurrence graph: the
    distance from each part to the nearest of the BFS_SEEDS smallest node
    ids (-1 for parts unreachable from every seed, including parts absent
    from the graph). The reference (XMLToCSV.py:1-415) exports graphs for
    neo4j to answer exactly this kind of question; this is the engine
    answering it natively.

    Contract: the oracle unrolls exactly BFS_ROUNDS frontier expansions;
    the Spark loop early-exits on an empty frontier, which is semantically
    free — an empty frontier generates every later frontier empty, so the
    remaining unrolled rounds are no-ops. test_graph_analytics.py pins the
    budget at >= 2x the observed rounds-to-empty plus an independent
    pure-Python BFS.

    Scale shape (level-synchronous frontier BFS — the Pregel/GraphX
    traversal regime): the symmetrized edge list materializes once per
    session (copart_und) and is hash-partitioned by u and cached; each
    round is one broadcast semi-join of the node-sized frontier against
    the CACHED edges (no per-round edge shuffle or parquet re-read), a
    node-sized distinct, and a broadcast anti-join against the visited
    set. Frontiers and the visited set are |V|-sized — broadcastable far
    beyond this graph; at billions of nodes drop the broadcasts and the
    joins degrade to shuffles (the honest Pregel cost), nothing else
    changes. Each round's new-node frame parquet-checkpoints (it is read
    by every later round's anti-join AND the final union), with the
    frontier count riding the write via df.observe — one action per
    round."""
    import os

    from pyspark.sql import Observation

    from dblp_to_csv_spark.session import checkpoint_base

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    gate = (
        CORENESS_LOCAL_FINISH_EDGES
        if local_finish_edges is None
        else local_finish_edges
    )
    # In-core collapse (r14 session 5): BFS was the one iterative graph
    # query without the gated single-task finisher its siblings got
    # (kcore/coreness/LPA, §14/§15) — all its frontier rounds run in one
    # vectorized task under the same gate/recipe, fed the DIRECTED edge
    # artifact and symmetrized in-kernel. Distances are canonical BFS
    # levels, so local == distributed needs no tie-break argument (pinned
    # anyway in test_graph_analytics.py); the distributed frontier loop
    # below remains the scale path above the gate, and its round-scaling
    # regime stays separately exercised by graph_bfs_deep (which
    # deliberately keeps the loop).
    e0 = copart_edges(spark, sf_dir)
    if gate and 2 * e0.count() <= gate:

        def bfs(u, v):
            import numpy as np
            import pyarrow as pa

            if len(u) == 0:
                return pa.table(
                    {
                        "node": np.empty(0, dtype=np.int64),
                        "dist": np.empty(0, dtype=np.int64),
                    }
                )
            nodes, dist = _bfs_levels_numpy(u, v, BFS_SEEDS, BFS_ROUNDS)
            return pa.table(
                {
                    "node": nodes.astype(np.int64),
                    "dist": dist.astype(np.int64),
                }
            )

        lvl = _graph_single_task(
            e0, bfs, "node long, dist long", symmetrize=True
        )
        return part.join(lvl, part["l_partkey"] == lvl["node"], "left").select(
            "l_partkey",
            F.coalesce("dist", F.lit(-1)).cast("long").alias("dist"),
        )

    base_dir = checkpoint_base(spark, checkpoint_dir, "_bfs_")
    und = copart_und(spark, sf_dir, checkpoint_dir)
    # No repartition/persist of the edge frame (r14 optimization round):
    # every round's frontier attach is a BROADCAST semi-join, which needs
    # no particular edge partitioning, and the co-part graph's diameter
    # keeps the loop at ~3 rounds — re-reading the already-materialized
    # und parquet per round is cheaper than one exchange + a full cache
    # write that serves so few reads (measured 5.9 → 5.0 s cold at sf0.1,
    # interleaved best-of-3). Iterations that really revisit the edges
    # many times (coreness) keep the cached-and-partitioned shape.
    und_u = und.select("u", "v")
    seeds = (
        und_u.select("u").distinct().orderBy("u").limit(BFS_SEEDS)
    ).select(F.col("u").alias("node"), F.lit(0).cast("long").alias("dist"))
    seed_path = os.path.join(base_dir, "round_0")
    seeds.write.mode("overwrite").parquet(seed_path)
    levels = [spark.read.parquet(seed_path)]
    frontier = levels[0].select("node")
    visited = levels[0].select("node")
    for rnd in range(1, BFS_ROUNDS + 1):
        nxt = (
            und_u.join(
                F.broadcast(frontier.withColumnRenamed("node", "u")), "u", "semi"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "anti")
            .select("node", F.lit(rnd).cast("long").alias("dist"))
        )
        obs = Observation(f"bfs_{rnd}")
        nxt_path = os.path.join(base_dir, f"round_{rnd}")
        nxt.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(nxt_path)
        nxt = spark.read.parquet(nxt_path)
        if obs.get["n"] == 0:
            break
        levels.append(nxt)
        frontier = nxt.select("node")
        visited = visited.union(frontier)
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.union(lv)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    return part.join(dist, part["l_partkey"] == dist["node"], "left").select(
        "l_partkey", F.coalesce("dist", F.lit(-1)).cast("long").alias("dist")
    )


# ---------------------------------------------------------------------------
# Deterministic synchronous label propagation (community detection)

LPA_ROUNDS = 4  # fixed-round contract — the oracle unrolls exactly these


def _lpa_round_sql(t: int) -> str:
    """One synchronous LPA round as a CTE: every node adopts the most
    frequent label among its neighbors, ties to the smallest label. The
    count subquery nests under the ROW_NUMBER so both engines rank the
    same aggregated frame."""
    return f"""
        l{t} AS MATERIALIZED (
            SELECT u AS n, label FROM (
                SELECT u, label, ROW_NUMBER() OVER (
                    PARTITION BY u ORDER BY c DESC, label
                ) AS rn
                FROM (
                    SELECT und.u, l.label, COUNT(*) AS c
                    FROM und JOIN l{t - 1} l ON l.n = und.v
                    GROUP BY und.u, l.label
                )
            ) WHERE rn = 1
        )"""


def _lpa_oracle() -> str:
    steps = ",".join(_lpa_round_sql(t) for t in range(1, LPA_ROUNDS + 1))
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        und AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT u AS n, u AS label FROM und
        ),
        {steps}
        SELECT p.p_partkey AS l_partkey,
               CAST(COALESCE(l.label, -1) AS BIGINT) AS community
        FROM part p LEFT JOIN l{LPA_ROUNDS} l ON l.n = p.p_partkey
    """


@register(
    "graph_label_propagation", tags=("graph", "iterative"), oracle=_lpa_oracle()
)
def graph_label_propagation(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the part co-occurrence graph, made fully deterministic:
    initial label = node id; each round every node adopts the label most
    frequent among its neighbors, ties broken toward the SMALLEST label;
    exactly LPA_ROUNDS synchronous rounds (classic async LPA visits nodes
    in random order and breaks ties randomly — useless under a hash-match
    contract, so the fixed-round synchronous variant IS the operator, the
    same move that made PageRank checkable in fixed-point arithmetic).
    Parts absent from the graph report community -1.

    Scale shape (identical to the coreness round): the symmetrized edge
    list materializes once per session (copart_und), hash-partitions by u
    and stays cached; the node-sized (n, label) frame broadcasts into the
    edge join, so the per-(u, label) count and the per-u rank need no
    Exchange — a round is one shuffle-free stage over the cached edges.
    At node counts beyond broadcast capacity the joins degrade to
    shuffles (the Pregel regime), nothing else changes. Each round
    parquet-checkpoints (cuts the lineage the next round's broadcast
    would otherwise replay)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    gate = (
        CORENESS_LOCAL_FINISH_EDGES
        if local_finish_edges is None
        else local_finish_edges
    )
    # In-core collapse (VERDICT r11 item 3): all LPA_ROUNDS synchronous
    # rounds in one vectorized task under the same gate/recipe as the
    # coreness and k-core finishers — identical labels by construction
    # (pinned local == distributed == pure-Python), distributed rounds
    # remain the scale path above the gate. Like the k-core gate, the
    # in-core path ships the DIRECTED edge artifact (und is exactly 2×
    # its rows) and symmetrizes in-kernel — no und artifact build, half
    # the single-task input bytes (r14 §4 boundary audit).
    e0 = copart_edges(spark, sf_dir)
    if gate and 2 * e0.count() <= gate:

        def propagate(u, v):
            import numpy as np
            import pyarrow as pa

            if len(u) == 0:
                return pa.table(
                    {
                        "n": np.empty(0, dtype=np.int64),
                        "label": np.empty(0, dtype=np.int64),
                    }
                )
            nodes, labels = _lpa_rounds_numpy(u, v, LPA_ROUNDS)
            return pa.table(
                {
                    "n": nodes.astype(np.int64),
                    "label": labels.astype(np.int64),
                }
            )

        lbl = _graph_single_task(
            e0, propagate, "n long, label long", symmetrize=True
        )
        return part.join(lbl, part["l_partkey"] == lbl["n"], "left").select(
            "l_partkey",
            F.coalesce("label", F.lit(-1)).cast("long").alias("community"),
        )

    und = copart_und(spark, sf_dir, checkpoint_dir)
    base_dir = checkpoint_base(spark, checkpoint_dir, "_lpa_")
    und_u = und.select("u", "v").repartition("u").persist()
    per_node = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("label"))
    try:
        lbl = und_u.select(F.col("u").alias("n")).distinct().withColumn(
            "label", F.col("n")
        )
        for rnd in range(1, LPA_ROUNDS + 1):
            lbl_b = F.broadcast(lbl)
            nxt = (
                und_u.join(lbl_b, lbl_b["n"] == und_u["v"])
                .groupBy("u", "label")
                .agg(F.count(F.lit(1)).alias("c"))
                .withColumn("rn", F.row_number().over(per_node))
                .filter(F.col("rn") == 1)
                .select(F.col("u").alias("n"), "label")
            )
            path = os.path.join(base_dir, f"round_{rnd}")
            nxt.write.mode("overwrite").parquet(path)
            lbl = spark.read.parquet(path)
        part = load_table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("l_partkey")
        )
        return part.join(lbl, part["l_partkey"] == lbl["n"], "left").select(
            "l_partkey",
            F.coalesce("label", F.lit(-1)).cast("long").alias("community"),
        )
    finally:
        und_u.unpersist()


# ---------------------------------------------------------------------------
# Power-law stress graph (ROADMAP 17). The co-part graph the family above
# runs on is near-uniform (sf0.1: p50 degree 115, max 222), so the (deg, id)
# orientation — the thing that makes distributed triangle counting survive
# real power-law graphs — was never exercised where it matters. This derives
# a DETERMINISTIC hub graph from lineitem: each row contributes one edge
# whose endpoints are md5-uniform 16-bit draws pushed through x² scaling
# (node = (h·h) DIV 2^20 ∈ [0, 4096), pdf ∝ 1/√x), giving hubs at low node
# ids — measured sf0.01: max degree 1100 vs median 16; sf0.1: 3764 vs 151.
# Integer-exact on both engines (h < 2^16 so h² < 2^32 — no float anywhere),
# same md5-uniform idiom as the curation family (operators/curation.py:246).
# The query returns the skew evidence itself: naive wedge count Σ C(deg,2)
# vs oriented Σ C(outdeg,2) — sf0.01: 2,547,331 vs 235,599 (10.8× less work)
# — plus the exact triangle total through the SAME degree-oriented
# enumeration (triangle_counts) the co-part family uses.

_PL_NODE_DIV = 1_048_576  # (h*h) DIV 2^20 → node ids in [0, 4096)


def powerlaw_edges(
    spark: SparkSession,
    sf_dir: str,
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Distinct undirected hub-graph edges (u < v), same _ARTIFACT_CACHE
    checkpoint policy as copart_edges (≥3 consumers per query: degrees,
    orientation sides, closing probe, plus the gate count)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    key = _cache_key(spark, "powerlaw_edges", sf_dir, checkpoint_dir)
    if checkpoint and key in _ARTIFACT_CACHE:
        return spark.read.parquet(_ARTIFACT_CACHE[key])
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    k = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )

    def h16(salt: str):
        # first 4 md5 hex chars → [0, 2^16); integer-exact twin of the
        # oracle's ('0x' || substr(md5(...), 1, 4))::BIGINT
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), k)), 1, 4), 16, 10
        ).cast("long")

    nodes = li.select(h16("pls|").alias("hs"), h16("pld|").alias("hd")).select(
        F.expr(f"CAST((hs*hs) DIV {_PL_NODE_DIV} AS BIGINT)").alias("a"),
        F.expr(f"CAST((hd*hd) DIV {_PL_NODE_DIV} AS BIGINT)").alias("b"),
    )
    edges = (
        nodes.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    if not checkpoint:
        return edges
    path = os.path.join(checkpoint_base(spark, checkpoint_dir, "_plaw_"), "edges")
    edges.write.mode("overwrite").parquet(path)
    _ARTIFACT_CACHE[key] = path
    return spark.read.parquet(path)


_PL_RAW_SQL = """
        raw AS (
            SELECT ('0x' || substr(md5('pls|' || CAST(l_orderkey AS VARCHAR)
                        || '|' || CAST(l_linenumber AS VARCHAR)), 1, 4))::BIGINT AS hs,
                   ('0x' || substr(md5('pld|' || CAST(l_orderkey AS VARCHAR)
                        || '|' || CAST(l_linenumber AS VARCHAR)), 1, 4))::BIGINT AS hd
            FROM lineitem
        ),
        ed AS (
            SELECT LEAST((hs*hs)//1048576, (hd*hd)//1048576) AS u,
                   GREATEST((hs*hs)//1048576, (hd*hd)//1048576) AS v
            FROM raw
        ),
        e AS (SELECT DISTINCT u, v FROM ed WHERE u < v)
"""


@register(
    "graph_triangle_powerlaw",
    tags=("graph", "join"),
    oracle=f"""
        WITH {_PL_RAW_SQL},
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node
        ),
        odeg AS (
            SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
                   COUNT(*) AS od
            FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
            GROUP BY 1
        ),
        t AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(MAX(deg) AS BIGINT) FROM deg) AS max_degree,
               (SELECT CAST(SUM((deg*(deg-1))//2) AS BIGINT) FROM deg) AS naive_wedges,
               (SELECT CAST(SUM((od*(od-1))//2) AS BIGINT) FROM odeg) AS oriented_wedges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_triangles
    """,
)
def graph_triangle_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on a genuinely power-law graph (hub skew ~70:1 at
    sf0.01) through the SAME degree-oriented machinery as the co-part
    family, returning the skew evidence as columns: naive Σ C(deg,2) vs
    oriented Σ C(outdeg,2) wedge counts (the work a naive vs oriented
    enumeration would shuffle) plus the exact triangle total. One summary
    row, all BIGINT — the oracle enumerates triangles id-ordered (a
    different orientation), pinning that the (deg, id) physical strategy
    is semantics-free. ROADMAP 17: the co-part graph is near-uniform, so
    this is where the orientation's O(sqrt(m)) out-degree bound is
    actually load-bearing.

    Fixture contract: the node domain is FIXED at 4096, so density (not
    node count) scales with SF — sf0.001 is sparse (41 triangles), sf0.01
    is the skew-dominated regime this query exists for (70:1 hubs), sf0.1
    is dense (~5% of all pairs). A production corpus would scale the node
    domain with the data (pick a larger power-of-two divisor); the fixed
    domain is what keeps the oracle's id-ordered enumeration cheap at the
    driver's correctness SF."""
    e0 = powerlaw_edges(spark, sf_dir)
    deg = degrees(e0)
    tri = triangle_counts(spark, sf_dir, e0=e0, deg=deg)

    deg_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("deg").cast("long").alias("max_degree"),
        F.sum(F.expr("(deg*(deg-1)) DIV 2")).cast("long").alias("naive_wedges"),
    )
    edge_cnt = e0.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    # oriented out-degrees under the identical (deg, id) orientation
    du = F.broadcast(deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u")))
    dv = F.broadcast(deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v")))
    fwd = F.struct("deg_u", "u") < F.struct("deg_v", "v")
    owedges = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(
            F.sum(F.expr("(od*(od-1)) DIV 2"))
            .cast("long")
            .alias("oriented_wedges")
        )
    )
    tri_total = tri.agg(
        F.expr("CAST(COALESCE(SUM(n_triangles), 0) DIV 3 AS BIGINT)").alias(
            "n_triangles"
        )
    )
    # 1-row aggregate frames — the established tiny-crossJoin composite shape
    return (
        deg_stats.crossJoin(edge_cnt)
        .crossJoin(owedges)
        .crossJoin(tri_total)
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            "naive_wedges",
            "oriented_wedges",
            "n_triangles",
        )
    )


# ---------------------------------------------------------------------------
# Deep-diameter BFS stress (ROADMAP 17, second half; VERDICT r13 item 5):
# graph_bfs_distances runs 4-6 rounds on the diameter-2 co-part graph, so
# the ROUND-SCALING behavior — the thing that breaks at 100x on path-like
# graphs — was untested. This derives a deterministic HIGH-diameter graph
# (an md5-chained ring + data-drawn short chords, the powerlaw recipe's
# sibling) and returns the full depth histogram so the driver re-hashes the
# depth evidence every round.

BFS_DEEP_RING = 256  # structural ring 0..255: i — (i+1) mod 256
BFS_DEEP_GATE = 29  # a lineitem row draws a chord iff h16 % GATE == 0
BFS_DEEP_MAX_JUMP = 3  # chord span 2..4: local shortcuts, diameter stays deep


def deep_ring_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (u < v) edges of the deep-diameter stress graph:
    a full 256-ring plus data-derived chords (pos, pos + 2 + h%3 mod 256)
    drawn by ~1/29 of lineitem rows. Chord span is BOUNDED (<= 4), so
    shortcuts stay local and the diameter contracts only linearly with
    chord density — sf0.001 runs ~60 frontier rounds, sf0.01 ~35: the
    path-like regime the frontier loop must survive, not the diameter-2
    co-part graph. Same integer-only md5 draw family as powerlaw_edges so
    the DuckDB oracle reproduces every edge."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    k = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )

    def h16(salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), k)), 1, 4), 16, 10
        ).cast("long")

    ring = spark.range(BFS_DEEP_RING).select(
        F.col("id").alias("a"),
        ((F.col("id") + 1) % BFS_DEEP_RING).alias("b"),
    )
    chords = (
        li.select(
            h16("bdp|").alias("hp"), h16("bdj|").alias("hj"), h16("bdg|").alias("hg")
        )
        .filter(F.col("hg") % BFS_DEEP_GATE == 0)
        .select(
            (F.col("hp") % BFS_DEEP_RING).alias("a"),
            (
                (F.col("hp") % BFS_DEEP_RING + 2 + F.col("hj") % (BFS_DEEP_MAX_JUMP))
                % BFS_DEEP_RING
            ).alias("b"),
        )
    )
    return (
        ring.unionAll(chords)
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def _bfs_deep_oracle() -> str:
    """Single-source BFS depths via a bounded recursive CTE: UNION-dedup on
    (node, dist) pairs with dist capped at RING (>= any shortest path on a
    256-node graph) terminates the ring's otherwise-infinite walks, then
    MIN(dist) per node is the BFS distance. A recursive oracle (instead of
    the fixed unroll _bfs_oracle uses) because the depth here is the POINT
    — unrolling ~60 rounds of CTEs would dwarf the query."""
    n = BFS_DEEP_RING
    key = "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
    return f"""
        WITH RECURSIVE ring AS (
            SELECT i AS a, (i + 1) % {n} AS b FROM generate_series(0, {n - 1}) t(i)
        ),
        raw AS (
            SELECT ('0x' || substr(md5('bdp|' || {key}), 1, 4))::BIGINT AS hp,
                   ('0x' || substr(md5('bdj|' || {key}), 1, 4))::BIGINT AS hj,
                   ('0x' || substr(md5('bdg|' || {key}), 1, 4))::BIGINT AS hg
            FROM lineitem
        ),
        ch AS (
            SELECT hp % {n} AS a,
                   (hp % {n} + 2 + hj % {BFS_DEEP_MAX_JUMP}) % {n} AS b
            FROM raw WHERE hg % {BFS_DEEP_GATE} = 0
        ),
        e AS (
            SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
            FROM (SELECT a, b FROM ring UNION ALL SELECT a, b FROM ch)
        ),
        und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        r AS (
            SELECT 0 AS node, 0 AS dist
            UNION
            SELECT und.v AS node, r.dist + 1 AS dist
            FROM r JOIN und ON und.u = r.node
            WHERE r.dist < {n}
        ),
        d AS (SELECT node, MIN(dist) AS dist FROM r GROUP BY node)
        SELECT CAST(dist AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM d GROUP BY 1
    """


@register("graph_bfs_deep", tags=("graph", "iterative"), oracle=_bfs_deep_oracle())
def graph_bfs_deep(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Depth histogram (dist, n_nodes) of a single-source BFS from node 0
    over the deep ring+chords graph — the frontier loop of
    graph_bfs_distances run where it is actually stressed: O(diameter)
    rounds with near-constant frontier width (bounded-span chords), instead
    of 4 fat rounds on a diameter-2 graph. Early-exits on the first empty
    frontier; the max dist row IS the measured diameter, and because the
    whole histogram is the driver-hashed result, the depth evidence is
    re-verified every round (the graph_triangle_powerlaw pattern).

    Round economics named in SCALE.md: each round costs one broadcast
    semi-join + distinct + anti-join over a frontier of ~O(chord-speed)
    nodes — latency-bound, not data-bound. On a 100x-deeper production
    graph this regime is scheduling-dominated; the standard escape is
    pointer doubling (exchange O(m log d) data for O(log d) rounds), which
    the CC min-label loop in dedup.py already implements — this query pins
    the frontier side of that trade."""
    import os

    from pyspark.sql import Observation

    from dblp_to_csv_spark.session import checkpoint_base

    base_dir = checkpoint_base(spark, checkpoint_dir, "_bfsdeep_")
    e_path = os.path.join(base_dir, "edges")
    deep_ring_edges(spark, sf_dir).write.mode("overwrite").parquet(e_path)
    e0 = spark.read.parquet(e_path)
    und = (
        e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .persist()
    )
    try:
        seeds = spark.createDataFrame(
            [(0, 0)], "node long, dist long"
        )
        seed_path = os.path.join(base_dir, "round_0")
        seeds.write.mode("overwrite").parquet(seed_path)
        levels = [spark.read.parquet(seed_path)]
        frontier = levels[0].select("node")
        visited = levels[0].select("node")
        for rnd in range(1, BFS_DEEP_RING + 1):
            nxt = (
                und.join(
                    F.broadcast(frontier.withColumnRenamed("node", "u")), "u", "semi"
                )
                .select(F.col("v").alias("node"))
                .distinct()
                .join(F.broadcast(visited), "node", "anti")
                .select("node", F.lit(rnd).cast("long").alias("dist"))
            )
            obs = Observation(f"bfsdeep_{rnd}")
            nxt_path = os.path.join(base_dir, f"round_{rnd}")
            nxt.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(nxt_path)
            nxt = spark.read.parquet(nxt_path)
            if obs.get["n"] == 0:
                break
            levels.append(nxt)
            frontier = nxt.select("node")
            visited = visited.union(frontier)
        dist = levels[0]
        for lv in levels[1:]:
            dist = dist.union(lv)
        return dist.groupBy("dist").agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes")
        )
    finally:
        und.unpersist()
