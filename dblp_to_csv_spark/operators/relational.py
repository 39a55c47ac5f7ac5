"""Relational operator surface (SURVEY.md §2.3): scans, filters, projections,
joins (broadcast/shuffle/semi/anti/theta), hash aggregation, grouping sets
(rollup/cube), window functions, sorts/limits/top-k, set operations, exact
percentiles, JSON scalar functions.

The reference (XMLToCSV.py) has none of these — §2.3 documents the absence —
but the engine must provide them to serve the driver's query surface. All of
it is stock DataFrame API so Catalyst handles pushdown, column pruning, join
selection (broadcast vs SMJ), partial aggregation and AQE skew handling.

Scale notes (100 TB):
* dimension joins (nation, region, part at small SF) use explicit
  ``F.broadcast`` hints — no shuffle of the fact table for those joins;
* fact-fact joins (lineitem ⋈ orders) shuffle on the join key — co-partitioned
  bucketing would remove that at deployment time, the plan is unchanged;
* aggregates rely on Catalyst's partial/final (map-side combine) split;
* top-k uses window + filter which Spark executes as a partial top-k per
  partition before the final sort at small k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1-style pricing summary (hash agg, partial/final).
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    bench=True,
    tags=("agg", "filter", "sort"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                               AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                          AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6)                               AS avg_qty,
               ROUND(AVG(l_extendedprice), 6)                          AS avg_price,
               ROUND(AVG(l_discount), 6)                               AS avg_disc,
               COUNT(*)                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan filter + hash aggregate with 8 aggregates over 2 group keys.

    Catalyst plans this as parquet scan (shipdate filter pushed down) →
    partial HashAggregate → shuffle on (returnflag, linestatus) → final
    HashAggregate: the canonical map-side-combine shape that scales linearly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-join star query: the flagship (entry() runs this).
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    bench=True,
    tags=("join", "broadcast", "agg"),
    oracle="""
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 4-way star join + aggregate (scan/filter/join/agg in one).

    lineitem⋈orders is the only fact-fact shuffle; customer is small relative
    to the facts (hash join, broadcast at low SF via AQE), nation/region are
    explicit broadcasts. At 100 TB, bucketing lineitem+orders on orderkey
    turns the fact join into a co-partitioned join with zero shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Top-k with deterministic tie-break (sort + limit pushed as partial top-k).
# --------------------------------------------------------------------------
@register(
    "top_orders_by_revenue",
    bench=True,
    tags=("join", "topk", "window"),
    oracle="""
        WITH rev AS (
            SELECT o.o_orderkey, o.o_orderdate,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o.o_orderkey, o.o_orderdate
        )
        SELECT o_orderkey, o_orderdate, revenue
        FROM rev
        QUALIFY ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey) <= 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join + agg + global top-10 (tie-break on orderkey).

    The rounded revenue is the sort key so the result set is stable across
    engines; row_number over an un-partitioned window is fine because the
    input to the sort is already one aggregated row per order and Spark
    executes limit-like top-k with partial sorts per partition.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("o_orderkey", "o_orderdate", "revenue")
    )


# --------------------------------------------------------------------------
# Market share: agg over joins, then a window over the aggregate (Q8-style).
# --------------------------------------------------------------------------
@register(
    "market_share_by_year",
    bench=True,
    tags=("join", "agg", "window"),
    oracle="""
        WITH rev AS (
            SELECT YEAR(o.o_orderdate) AS order_year, n.n_name,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS nation_rev
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        )
        SELECT CAST(order_year AS INT) AS order_year, n_name,
               ROUND(nation_rev, 2) AS nation_rev,
               ROUND(nation_rev / SUM(nation_rev) OVER (PARTITION BY order_year), 6)
                   AS market_share
        FROM rev
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: aggregate revenue per (year, nation), then a window
    over the aggregate computes each nation's share of the year's total —
    agg→window composition with the window running on the already-reduced
    frame (25×7 rows), not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("order_year"), "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("nation_rev"))
    )
    w = Window.partitionBy("order_year")
    return rev.select(
        "order_year",
        "n_name",
        F.round("nation_rev", 2).alias("nation_rev"),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(w), 6).alias("market_share"),
    )


# --------------------------------------------------------------------------
# Semi / anti joins.
# --------------------------------------------------------------------------
@register(
    "semi_join_discounted_orders",
    tags=("join", "semi"),
    oracle="""
        SELECT o.o_orderkey, o.o_orderpriority
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
        )
    """,
)
def semi_join_discounted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: orders having at least one deep-discount lineitem.

    Semi join never duplicates the left side and lets Spark stop probing per
    key — cheaper than join+distinct at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "anti_join_customers_no_urgent",
    tags=("join", "anti"),
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
)
def anti_join_customers_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never placed an URGENT-priority order.
    The right side is filtered BEFORE the anti-join, so the build side is
    ~20% of orders and the pushed predicate reaches the scan.

    Replaced ``anti_join_customers_without_orders`` (round 9 vacuity
    audit): the synthetic generator gives every customer at least one
    order at sf≤0.01, so the unfiltered anti-join returned 0 rows — a
    hash-green driver row that proved nothing about anti-join semantics.
    The priority predicate is scale-proof: a customer's chance of having
    no urgent order is binomial (~0.8^orders_per_customer), so the result
    is a stable non-empty fraction of customers at every scale factor."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Broadcast join (explicit hint).
# --------------------------------------------------------------------------
@register(
    "broadcast_join_part_agg",
    bench=True,
    tags=("join", "broadcast", "agg"),
    oracle="""
        SELECT p.p_brand,
               ROUND(SUM(l.l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size >= 25
        GROUP BY p.p_brand
    """,
)
def broadcast_join_part_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) + aggregate: zero shuffle on the fact side for
    the join; only the final small agg shuffles. The p_size filter is applied
    before the broadcast so the broadcast relation is minimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Theta (non-equi) join.
# --------------------------------------------------------------------------
@register(
    "theta_join_nation_pairs",
    tags=("join", "theta"),
    oracle="""
        SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
        FROM nation a
        JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def theta_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join: unordered nation pairs within a region. The equi part
    (regionkey) hashes; the `<` residual filters inside the join — Spark does
    NOT fall back to a nested-loop join because one key is an equi key."""
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


# --------------------------------------------------------------------------
# Window functions: partitioned top-k, running totals, lag deltas.
# --------------------------------------------------------------------------
@register(
    "window_top_orders_per_customer",
    bench=True,
    tags=("window", "topk"),
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window; one shuffle on the partition
    key, then a per-partition sort — the scalable idiom for 'top N per key'."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_revenue",
    tags=("window",),
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total
        FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer total with an explicit ROWS frame (identical
    semantics in both engines; the orderkey tie-break makes it deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag_event_delta",
    tags=("window", "lag"),
    oracle="""
        SELECT user_id, event_id,
               ROUND(value - LAG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), 6) AS delta
        FROM events
    """,
)
def window_lag_event_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta per user ordered by time — the building block for
    sessionization and as-of logic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


# --------------------------------------------------------------------------
# Grouping sets: rollup / cube.
# --------------------------------------------------------------------------
@register(
    "rollup_lineitem_status",
    tags=("agg", "rollup"),
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (per-flag, per-flag+status, grand total).
    Spark expands grouping sets inside a single aggregate — one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "cube_orders_status_priority",
    tags=("agg", "cube"),
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@register(
    "union_by_name_schema_evolution",
    tags=("setop", "schema"),
    oracle="""
        SELECT o_orderkey AS record_key, o_totalprice AS amount,
               o_orderstatus AS status, NULL AS segment
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT c_custkey AS record_key, c_acctbal AS amount,
               NULL AS status, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 10 = 0
    """,
)
def union_by_name_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with partially-overlapping
    columns combined by NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True)) — how a pipeline appends a new
    batch whose schema gained/lost fields without positional breakage."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("record_key"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("record_key"),
        F.col("c_acctbal").alias("amount"),
        F.col("c_mktsegment").alias("segment"),
    )
    return o.unionByName(c, allowMissingColumns=True)


@register(
    "setop_union_nations",
    tags=("setop",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nation keys present in customers or suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect_nations",
    tags=("setop",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of nation keys with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_urgent_unfinished",
    tags=("setop",),
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderstatus = 'F'
    """,
)
def setop_except_urgent_unfinished(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): customers with an urgent order but no
    finished order. DataFrame.subtract is EXCEPT DISTINCT; exceptAll would
    be multiset EXCEPT ALL (removes one occurrence per match), a different
    operator.

    Replaced ``setop_except_nations`` (round 9 vacuity audit): nation-key
    granularity saturates — all 25 nations have both customers and
    suppliers at every SF, so the EXCEPT returned 0 rows and its driver
    hash proved nothing. Customer-key granularity scales with the data and
    both predicates are independent binomials, so the difference is a
    stable non-empty fraction at every scale factor."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(finished)


@register(
    "setop_multiset_all_nations",
    tags=("setop",),
    oracle="""
        WITH i AS (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
        ),
        x AS (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
        )
        SELECT nationkey, 'intersect_all' AS op,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM i GROUP BY nationkey
        UNION ALL
        SELECT nationkey, 'except_all', CAST(COUNT(*) AS BIGINT)
        FROM x GROUP BY nationkey
    """,
)
def setop_multiset_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — INTERSECT ALL / EXCEPT ALL keep occurrence
    counts (each match consumes ONE occurrence from each side), the
    semantics the DISTINCT variants above deliberately discard.
    ``intersectAll`` yields min(count_left, count_right) copies per key and
    ``exceptAll`` max(count_left − count_right, 0) — reported here as
    per-key multiplicities so the multiset arithmetic itself is what the
    oracle hashes. Spark plans both as count-comparing aggregates, not
    row-at-a-time removal — one shuffle per side, no join explosion."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    i = (
        c.intersectAll(sup)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("nationkey", F.lit("intersect_all").alias("op"), "n")
    )
    x = (
        c.exceptAll(sup)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("nationkey", F.lit("except_all").alias("op"), "n")
    )
    return i.unionAll(x)


# --------------------------------------------------------------------------
# Distinct aggregates and exact percentiles.
# --------------------------------------------------------------------------
@register(
    "distinct_customers_per_status",
    tags=("agg", "distinct"),
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate alongside a plain count (Catalyst plans the expand +
    two-phase distinct aggregation automatically)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "median_price_by_status",
    tags=("agg", "percentile"),
    oracle="""
        SELECT o_orderstatus,
               ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median_price,
               ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def median_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). The approx variant (`approx_percentile`) is registered
    separately without an oracle because sketch outputs are engine-specific."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "approx_distinct_users",
    tags=("agg", "approx"),
    oracle=None,  # HLL sketches are engine-specific; rows-only check.
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch path
    used at 100 TB where exact distinct would shuffle every key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
    )


@register(
    "approx_percentile_prices",
    tags=("agg", "approx"),
    oracle=None,  # KLL/GK sketches are engine-specific; rows-only check.
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch) p50/p95/p99 per order status — the
    bounded-memory quantile path for 100 TB (exact percentiles need a full
    sort per group; the sketch is one pass, mergeable, fixed size). The
    exact twin (`median_price_by_status`) is the oracle-checked one.

    The sketch is computed once as an array and projected to scalar columns:
    array-typed output trips pandas-side canonicalizers (unhashable list), and
    scalars are what a downstream consumer wants anyway."""
    o = load_table(spark, sf_dir, "orders")
    q = F.approx_percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
    )
    return o.groupBy("o_orderstatus").agg(q.alias("q")).select(
        "o_orderstatus",
        F.col("q")[0].alias("p50_price"),
        F.col("q")[1].alias("p95_price"),
        F.col("q")[2].alias("p99_price"),
    )


# --------------------------------------------------------------------------
# Scalar function gallery (string / date / math) and JSON extraction.
# --------------------------------------------------------------------------
@register(
    "scalar_functions_gallery",
    tags=("scalar",),
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT)  AS order_year,
               CAST(MONTH(o_orderdate) AS INT) AS order_month,
               UPPER(SUBSTR(o_orderpriority, 3)) AS priority_name,
               LENGTH(o_orderpriority) AS priority_len,
               CONCAT(o_orderstatus, '-', CAST(o_orderkey % 10 AS VARCHAR)) AS status_tag,
               ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
)
def scalar_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions in one projection — all JVM-side
    built-ins inside whole-stage codegen, no Python in the loop."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.upper(F.substring("o_orderpriority", 3, 1000)).alias("priority_name"),
        F.length("o_orderpriority").alias("priority_len"),
        F.concat(
            F.col("o_orderstatus"), F.lit("-"), (F.col("o_orderkey") % 10).cast("string")
        ).alias("status_tag"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


@register(
    "from_json_events",
    tags=("scalar", "json"),
    oracle="""
        SELECT event_id,
               TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_value,
               CASE WHEN TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) >= 50
                    THEN 'high' ELSE 'low' END AS k_band
        FROM events
    """,
)
def from_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing (from_json → typed struct, vs the path-based
    get_json_object in json_extract_events): the struct field is then a
    normal typed column for downstream expressions."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "map_functions_events",
    tags=("scalar", "map", "agg"),
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS clicks,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
        FROM events
        GROUP BY user_id
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate: per-user map<event_type, count> built with
    map_from_entries, then element_at lookups. The map is the engine-side
    representation; the result projects scalar lookups so it stays
    hash-comparable (map column order is engine-specific)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    # NULL is not a legal map key in Spark (NULL_MAP_KEY crash), and the
    # lookups below only probe literal types — collect_list skips NULL
    # elements, so NULL-typed entries stay out of the map while users with
    # ONLY NULL-typed events still get a row (empty map → 0 counts),
    # matching the oracle's GROUP BY + FILTER semantics.
    entry = F.when(
        F.col("event_type").isNotNull(), F.struct("event_type", "n")
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(entry)).alias("counts")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("counts", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("counts", "purchase"), F.lit(0)).alias("purchases"),
    )


@register(
    "json_extract_events",
    tags=("scalar", "json"),
    oracle="""
        SELECT event_type,
               CAST(SUM(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT)
                   AS sum_k,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column, then
    aggregate. Uses get_json_object (JVM-side JSON path) on the Spark side;
    the oracle extracts the same field with a regex so it has no dependency
    on DuckDB's JSON extension."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Join completeness: full outer, null-safe equality, positional lateral.
# --------------------------------------------------------------------------
@register(
    "full_outer_join_customer_activity",
    tags=("join", "outer"),
    oracle="""
        WITH left_side AS (
            SELECT c_custkey, c_name FROM customer WHERE c_custkey < 50
        ),
        right_side AS (
            SELECT o_custkey, COUNT(*) AS n_orders
            FROM orders
            WHERE o_custkey BETWEEN 25 AND 75
            GROUP BY o_custkey
        )
        SELECT COALESCE(c_custkey, o_custkey) AS custkey,
               c_name,
               CAST(n_orders AS BIGINT) AS n_orders
        FROM left_side FULL OUTER JOIN right_side ON c_custkey = o_custkey
    """,
)
def full_outer_join_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over deliberately part-overlapping key ranges, so the
    result exercises all three row classes: left-only (customer, no orders
    in range), matched, right-only (orders whose customer is outside the
    left range). COALESCE merges the key — the standard outer-join idiom."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50).select(
        "c_custkey", "c_name"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").between(25, 75))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
    )


@register(
    "null_safe_join_suppliers",
    tags=("join", "null-semantics"),
    oracle="""
        WITH s AS (
            SELECT s_suppkey,
                   CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS nk
            FROM supplier
        )
        SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b
        FROM s a JOIN s b
          ON a.nk IS NOT DISTINCT FROM b.nk AND a.s_suppkey < b.s_suppkey
    """,
)
def null_safe_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM):
    nulls match each other instead of dropping out — the semantics needed
    when the join key legitimately contains 'unknown' groups. Nulls are
    synthesized deterministically (every 7th supplier) since the testdata
    has none. Spark plans `<=>` as a hash join (null-safe keys are still
    equi-keys), not a nested loop."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        F.col("a.nk").eqNullSafe(F.col("b.nk"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"), F.col("b.s_suppkey").alias("supp_b")
    )


@register(
    "posexplode_order_lines",
    tags=("lateral", "array"),
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(i AS INT) AS pos,
               lines[CAST(i + 1 AS INT)] AS linenumber
        FROM per_order, unnest(range(0, len(lines))) AS t(i)
    """,
)
def posexplode_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional lateral explode (posexplode): each array element with its
    0-based position — the ordinality-preserving unnest. Arrays are sorted
    before exploding so positions are deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines")
    )
    return per_order.select(
        "l_orderkey", F.posexplode("lines").alias("pos", "linenumber")
    )


@register(
    "integrity_audit",
    tags=("agg", "join", "quality"),
    oracle="""
        SELECT 'lineitem_without_order' AS violation,
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n
        UNION ALL
        SELECT 'order_without_customer',
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'lineitem_without_part',
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM part p
                                       WHERE p.p_partkey = l.l_partkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'customer_without_nation',
               CAST((SELECT COUNT(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT)
    """,
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the sanity pass a pipeline runs BEFORE
    trusting its joins: orphan counts for each foreign-key edge of the
    schema (lineitem→orders, orders→customer, lineitem→part,
    customer→nation). Inner joins silently DROP orphaned rows; this report
    is how you learn the drop happened (a healthy extract reads all
    zeros, and a nonzero row tells you which upstream feed broke).

    Scale shape: each check is one LEFT ANTI join + count — anti joins
    plan as broadcast/shuffled hash joins with no fan-out (at most one
    output row per probe row), the dimension sides broadcast where small,
    and the four counts union into a 4-row report. No subquery runs per
    row; the NOT EXISTS in the oracle desugars to the same anti join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(name, child, parent, ck, pk):
        n = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        return n.select(F.lit(name).alias("violation"), "n")

    return (
        orphans("lineitem_without_order", li, orders, "l_orderkey", "o_orderkey")
        .unionAll(
            orphans("order_without_customer", orders, customer, "o_custkey", "c_custkey")
        )
        .unionAll(
            orphans("lineitem_without_part", li, part, "l_partkey", "p_partkey")
        )
        .unionAll(
            orphans("customer_without_nation", customer, nation, "c_nationkey", "n_nationkey")
        )
    )


# --- CDC MERGE / upsert apply ----------------------------------------------

# Keyspace offset for synthesized insert/dirty keys. Must stay beyond any
# real o_orderkey at every supported scale factor (TPC-H max key is
# 6,000,000 x SF, so 10**12 is safe through SF ~166,000): the r8 value of
# 1,000,000 collided with real keys above SF ~0.17, silently turning
# synthesized inserts into updates — and the oracle mirrored the same
# arithmetic, so parity checks could not catch the drift (ADVICE r8).
MERGE_INSERT_OFFSET = 10**12

_MERGE_CHANGES_SQL = f"""
    changes AS (
        SELECT o_orderkey, o_custkey, 'U' AS op, 'X' AS new_status,
               o_totalprice + 10.0 AS new_price, 1 AS change_seq
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U', 'Y',
               o_totalprice + 20.0, 2
        FROM orders WHERE o_orderkey % 100 = 3
        UNION ALL
        SELECT o_orderkey, NULL, 'D', NULL, NULL, 1
        FROM orders WHERE o_orderkey % 10 = 7
        UNION ALL
        SELECT o_orderkey + {MERGE_INSERT_OFFSET}, o_custkey, 'I', 'N',
               o_totalprice + 0.5, 1
        FROM orders WHERE o_orderkey % 10 = 5
    ),
    latest AS (
        SELECT * FROM changes
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_orderkey
            ORDER BY change_seq DESC, op,
                     new_status NULLS FIRST, new_price NULLS FIRST,
                     o_custkey NULLS FIRST
        ) = 1
    )
"""


@register(
    "merge_upsert_orders",
    tags=("relational", "join", "cdc"),
    oracle=f"""
        WITH {_MERGE_CHANGES_SQL}
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN t.o_orderkey IS NULL THEN s.o_custkey
                    ELSE t.o_custkey END AS o_custkey,
               CASE WHEN s.op IS NULL THEN t.o_orderstatus
                    ELSE s.new_status END AS o_orderstatus,
               ROUND(CASE WHEN s.op IS NULL THEN t.o_totalprice
                          ELSE s.new_price END, 6) + 0.0 AS o_totalprice,
               CASE WHEN s.op IS NULL THEN 'kept'
                    WHEN t.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'updated' END AS merge_action
        FROM orders t FULL OUTER JOIN latest s
          ON t.o_orderkey = s.o_orderkey
        WHERE NOT COALESCE(s.op = 'D', FALSE)
          AND NOT (t.o_orderkey IS NULL AND s.op <> 'I')
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert contract) as a batch
    operator: apply a CDC change feed — inserts, updates, deletes, with
    LATEST-WINS conflict resolution on change_seq — onto the orders table
    in one pass. Matched+D drops the row, matched+U rewrites it, unmatched
    +I inserts, unmatched U/D are no-ops (standard MERGE), untouched rows
    pass through tagged 'kept'. The change feed is synthesized
    deterministically from orders itself (keys ≡3 mod 10 update — twice,
    proving the seq-dedup — ≡7 delete, ≡5 insert at a keyspace offset).

    Scale shape: latest-wins is a per-key window (row_number over
    change_seq desc) on the CHANGE FEED only — feeds are deltas, orders of
    magnitude smaller than the target, so this never touches the corpus;
    the apply is ONE full-outer equi-join on the key (AQE picks broadcast
    when the delta is small; bucketed targets co-locate it) and the
    actions resolve as in-row CASEs — no second pass, no driver loop. This
    is the batch core the foreachBatch streaming upsert sink replays per
    micro-batch."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")

    def feed(pred, key, cust, op, status, price, seq):
        return orders.filter(pred).select(
            key.alias("o_orderkey"),
            cust.alias("s_custkey"),
            F.lit(op).alias("op"),
            F.lit(status).cast("string").alias("new_status"),
            price.alias("new_price"),
            F.lit(seq).alias("change_seq"),
        )

    null_l = F.lit(None)
    changes = (
        feed(k % 10 == 3, k, F.col("o_custkey"), "U", "X",
             F.col("o_totalprice") + 10.0, 1)
        .unionAll(feed(k % 100 == 3, k, F.col("o_custkey"), "U", "Y",
                       F.col("o_totalprice") + 20.0, 2))
        .unionAll(feed(k % 10 == 7, k, null_l.cast("long"), "D",
                       None, null_l.cast("double"), 1))
        .unionAll(feed(k % 10 == 5, k + MERGE_INSERT_OFFSET,
                       F.col("o_custkey"), "I", "N",
                       F.col("o_totalprice") + 0.5, 1))
    )
    return merge_apply(orders, changes)


def merge_apply(target: DataFrame, changes: DataFrame) -> DataFrame:
    """The MERGE INTO core as a library operator: ``target`` has columns
    (o_orderkey, o_custkey, o_orderstatus, o_totalprice); ``changes`` has
    (o_orderkey, s_custkey, op ∈ {'U','D','I'}, new_status, new_price,
    change_seq). Latest-wins on change_seq per key, then one full-outer
    equi-join applies the actions (matched+D drops, matched+U rewrites,
    unmatched+I inserts, unmatched U/D no-op, untouched rows tagged
    'kept'). A feed SHOULD carry unique (key, change_seq); when it does
    not, the winner is still DETERMINISTIC — ties break on
    (op, new_status, new_price, s_custkey) ascending with nulls first, so
    two runs (and the DuckDB oracle) always pick the same row; only
    fully-identical duplicate rows are interchangeable, which is harmless
    (review r8 session 4). Semantics are property-tested against a
    dict-based Python reference on random feeds (including seq
    collisions) in tests/test_merge_property.py."""
    w = Window.partitionBy("o_orderkey").orderBy(
        F.desc("change_seq"),
        F.asc("op"),
        F.asc_nulls_first("new_status"),
        F.asc_nulls_first("new_price"),
        F.asc_nulls_first("s_custkey"),
    )
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    t = target.withColumnRenamed("o_orderkey", "t_key").alias("t")
    s = latest.alias("s")
    j = t.join(s, F.col("t_key") == F.col("s.o_orderkey"), "full")
    t_missing = F.col("t_key").isNull()
    s_missing = F.col("s.op").isNull()
    action = (
        F.when(s_missing, "kept")
        .when(t_missing, "inserted")
        .otherwise("updated")
    )
    return j.filter(
        ~F.coalesce(F.col("s.op") == "D", F.lit(False))
        & ~(t_missing & (F.col("s.op") != "I"))
    ).select(
        F.coalesce(F.col("t_key"), F.col("s.o_orderkey")).alias("o_orderkey"),
        F.when(t_missing, F.col("s_custkey"))
        .otherwise(F.col("t.o_custkey"))
        .alias("o_custkey"),
        F.when(s_missing, F.col("t.o_orderstatus"))
        .otherwise(F.col("new_status"))
        .alias("o_orderstatus"),
        (
            F.round(
                F.when(s_missing, F.col("t.o_totalprice")).otherwise(
                    F.col("new_price")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("o_totalprice"),
        action.alias("merge_action"),
    )


@register(
    "incremental_agg_merge",
    tags=("relational", "agg", "cdc"),
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) + 0.0 AS total_price,
               ROUND(SUM(o_totalprice) / COUNT(*), 6) + 0.0 AS avg_price,
               ROUND(MIN(o_totalprice), 6) + 0.0 AS min_price,
               ROUND(MAX(o_totalprice), 6) + 0.0 AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL aggregate maintenance (materialized-view refresh): the
    per-status order summary maintained by MERGING partial-aggregate
    states — base state ⊕ delta state — instead of rescanning the base.
    Every statistic is kept in its ALGEBRAIC form (sum, count, min, max);
    avg derives from merged sum/count at read time — the partial/final
    split Spark itself uses inside every hash aggregate, lifted to the
    storage layer. Here the base state (orderkey % 10 ≠ 0) and delta
    (% 10 = 0) are both computed from the table so the oracle is simply
    the full-table aggregate; in production the base state is READ from
    the stored view and only the delta is scanned — refresh cost follows
    the delta, not the corpus.

    Scale shape: two partial aggregates (map-side combinable) + one merge
    aggregate over |keys| × 2 rows. Nothing quadratic, nothing rescanned;
    the merge works for any commutative-monoid statistic (extend with HLL
    registers / GK summaries for approx-distinct and quantiles — the same
    sketches the approx_* queries already verify)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("o_totalprice").alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = partial(orders.filter(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionAll(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("cnt").cast("long").alias("n_orders"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)
    return merged.select(
        "o_orderstatus",
        "n_orders",
        (F.round(F.col("s"), 2) + F.lit(0.0)).alias("total_price"),
        r6(F.col("s") / F.col("n_orders")).alias("avg_price"),
        r6(F.col("mn")).alias("min_price"),
        r6(F.col("mx")).alias("max_price"),
    )


ORDER_STATUS_DOMAIN = ("O", "F", "P")

# Same contract as MERGE_INSERT_OFFSET: synthesized dirty rows must get keys
# no real order can hold at any supported SF, or they stop being unique and
# the dup_orderkey count drifts (mirrored by the oracle, so invisible to
# parity — ADVICE r8).
DIRTY_KEY_OFFSET = 10**12


@register(
    "constraint_audit_orders",
    tags=("relational", "agg", "quality"),
    oracle=f"""
        WITH dirty AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate
            FROM orders
            UNION ALL
            SELECT o_orderkey + {DIRTY_KEY_OFFSET}, NULL, o_orderstatus,
                   o_totalprice, o_orderdate
            FROM orders WHERE o_orderkey % 1000 = 1
            UNION ALL
            SELECT o_orderkey + {DIRTY_KEY_OFFSET}, o_custkey, 'Z', o_totalprice,
                   o_orderdate
            FROM orders WHERE o_orderkey % 1000 = 2
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, -o_totalprice, NULL
            FROM orders WHERE o_orderkey % 1000 = 3
        ),
        a AS (
            SELECT CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT)
                       AS null_custkey,
                   CAST(COUNT(*) FILTER (o_orderstatus NOT IN
                       ({", ".join(repr(s) for s in ORDER_STATUS_DOMAIN)}))
                       AS BIGINT) AS bad_status,
                   CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                       AS dup_orderkey,
                   CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT)
                       AS nonpositive_price,
                   CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT)
                       AS null_orderdate
            FROM dirty
        )
        SELECT 'null_custkey' AS constraint_name, null_custkey AS n_violations FROM a
        UNION ALL SELECT 'bad_status', bad_status FROM a
        UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM a
        UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM a
        UNION ALL SELECT 'null_orderdate', null_orderdate FROM a
    """,
)
def constraint_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality CONSTRAINT audit (the dbt-test / Deequ
    shape): not-null, accepted-values, uniqueness, positivity, and
    completeness checks over orders evaluated in ONE aggregate pass and
    reported as (constraint_name, n_violations) rows — the contract table
    a pipeline gates a publish on. Complements `integrity_audit` (which
    covers the cross-table foreign-key edges).

    Scale shape: every check is a conditional count inside a single
    partial/final aggregate (the uniqueness check adds the one
    count-distinct expand); the unpivot to report rows happens on the
    1-row aggregate result via stack — the corpus is scanned once,
    shuffled never."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    )
    k = F.col("o_orderkey")
    dirty = (
        orders.unionAll(
            orders.filter(k % 1000 == 1).select(
                (k + DIRTY_KEY_OFFSET).alias("o_orderkey"),
                F.lit(None).cast("long").alias("o_custkey"),
                "o_orderstatus", "o_totalprice", "o_orderdate",
            )
        )
        .unionAll(
            orders.filter(k % 1000 == 2).select(
                (k + DIRTY_KEY_OFFSET).alias("o_orderkey"), "o_custkey",
                F.lit("Z").alias("o_orderstatus"),
                "o_totalprice", "o_orderdate",
            )
        )
        .unionAll(
            orders.filter(k % 1000 == 3).select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                (-F.col("o_totalprice")).alias("o_totalprice"),
                F.lit(None).cast("timestamp").alias("o_orderdate"),
            )
        )
    )
    # coalesce: SUM over an EMPTY table is NULL on Spark while the oracle's
    # COUNT(*) FILTER is 0 — an empty audit must report zero violations
    cnt = lambda c: F.coalesce(F.sum(c.cast("int")), F.lit(0)).cast("long")
    a = dirty.agg(
        cnt(F.col("o_custkey").isNull()).alias("null_custkey"),
        cnt(~F.col("o_orderstatus").isin(*ORDER_STATUS_DOMAIN)).alias(
            "bad_status"
        ),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
        .cast("long")
        .alias("dup_orderkey"),
        cnt(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        cnt(F.col("o_orderdate").isNull()).alias("null_orderdate"),
    )
    return a.select(
        F.expr(
            "stack(5, 'null_custkey', null_custkey, 'bad_status', bad_status,"
            " 'dup_orderkey', dup_orderkey,"
            " 'nonpositive_price', nonpositive_price,"
            " 'null_orderdate', null_orderdate)"
        ).alias("constraint_name", "n_violations")
    )


# --------------------------------------------------------------------------
# SCD Type-2 dimension build: versioned state history from an event log.
#
# The classic warehouse operator the reference has no analogue for: given an
# append-only event stream, produce the slowly-changing-dimension history of
# each user's state (here: the event_type they last emitted), one row per
# state RUN with [valid_from, valid_to) validity and an is_current flag.
# --------------------------------------------------------------------------
@register(
    "scd2_user_state",
    tags=("window", "time", "cdc"),
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type AS state, ts,
                   CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
        ),
        runs AS (
            SELECT user_id, state, ts,
                   CAST(SUM(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id, state
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS run_id
            FROM ordered
        ),
        collapsed AS (
            SELECT user_id, run_id, state,
                   MIN(ts) AS valid_from, COUNT(*) AS n_events
            FROM runs GROUP BY user_id, run_id, state
        )
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY valid_from, run_id) AS BIGINT) AS version,
               state, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                    ORDER BY valid_from, run_id) AS valid_to,
               (LEAD(valid_from) OVER (PARTITION BY user_id
                    ORDER BY valid_from, run_id) IS NULL) AS is_current,
               n_events
        FROM collapsed
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build from an append-only event log: collapse each
    user's event sequence into state RUNS (consecutive identical event_type),
    then emit one dimension row per run with ``[valid_from, valid_to)``
    validity, a per-user version number, and ``is_current`` on the open row.

    Shape: lag → change flag → running sum (run id) → per-run aggregate →
    lead for the closing timestamp. Every window and the aggregate share the
    SAME partitioning key (user_id), so Catalyst plans ONE shuffle and runs
    the entire chain inside it — the pattern that survives 100 TB: state
    history cost is one exchange regardless of how many windows stack.
    Ties inside a user's sequence break on (event_id, event_type) — ingest
    order, then state as the conflicting-dupkey tiebreak — matching the
    oracle's ORDER BY ts, event_id, event_type exactly (see scd2_runs)."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_runs(ev)


def scd2_runs(ev: DataFrame) -> DataFrame:
    """The SCD2 run-collapse chain shared by `scd2_user_state` and the
    point-in-time join: lag → change flag → running run id → per-run
    aggregate → lead, all on the user_id partitioning (one exchange).

    event_type is the FINAL sort tiebreak (r13 conflicting-dupkey sweep):
    an event log SHOULD carry unique (ts, event_id) per user, but when a
    CDC replay emits the same (ts, event_id) under two different states,
    an (ts, event_id)-only ordering leaves the tied rows' relative order
    unspecified on BOTH engines — run boundaries (and therefore version
    numbers) would depend on partitioning luck. With the state tiebreak the
    total order is a key, so the history is a pure function of the input
    multiset."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    run = (
        ev.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            "ts",
            chg.alias("chg"),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id", "state")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "run_id", "state")
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    # run_id tiebreaks duplicate valid_from (two runs can share a timestamp
    # when a state flips inside one ts — review r9 session 3)
    wv = Window.partitionBy("user_id").orderBy("valid_from", "run_id")
    return run.select(
        "user_id",
        F.row_number().over(wv).cast("long").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time join: fact rows looked up against a versioned dimension.
# --------------------------------------------------------------------------
_PIT_FACT = "purchase"


@register(
    "scd2_point_in_time_join",
    tags=("join", "time", "cdc"),
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_id, event_type AS state, ts,
                   CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WHERE event_type <> '{_PIT_FACT}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
        ),
        runs AS (
            SELECT user_id, state, ts,
                   CAST(SUM(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id, state
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS run_id
            FROM ordered
        ),
        collapsed AS (
            SELECT user_id, run_id, state, MIN(ts) AS valid_from
            FROM runs GROUP BY user_id, run_id, state
        ),
        dim AS (
            SELECT user_id, state, valid_from,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY valid_from, run_id) AS BIGINT) AS version,
                   LEAD(valid_from) OVER (PARTITION BY user_id
                        ORDER BY valid_from, run_id) AS valid_to
            FROM collapsed
        ),
        facts AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = '{_PIT_FACT}'
        )
        SELECT f.event_id, f.user_id, f.ts, f.value,
               d.state AS state_at, d.version AS state_version,
               d.valid_from AS state_since
        FROM facts f
        LEFT JOIN dim d
          ON d.user_id = f.user_id
         AND f.ts >= d.valid_from
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against a Type-2 slowly-changing
    dimension: every `purchase` fact row is joined to the state the user
    was in WHEN it happened — the canonical warehouse/feature-store
    temporal-correctness join (no leakage of future state into a training
    example). The dimension is the SCD2 run history built from the
    non-`purchase` events (shared `scd2_runs` chain); facts that precede
    a user's first state survive the left join with NULL state.

    Plan shape: an equi-join on user_id with the validity interval as a
    RESIDUAL predicate — NOT a range/interval explode. Because SCD2
    intervals partition each user's timeline, every fact matches at most
    one dimension row, so the join never amplifies. Both sides shuffle once
    on user_id (the dimension chain already runs inside that exchange);
    at 100 TB this is a co-partitioned fact-dim merge where the dimension
    side is versions, not events — orders of magnitude smaller."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_runs(ev.filter(F.col("event_type") != _PIT_FACT)).select(
        F.col("user_id").alias("d_user_id"),
        F.col("state").alias("state_at"),
        F.col("version").alias("state_version"),
        F.col("valid_from").alias("state_since"),
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == _PIT_FACT).select(
        "event_id", "user_id", "ts", "value"
    )
    cond = (
        (facts.user_id == dim.d_user_id)
        & (facts.ts >= dim.state_since)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to))
    )
    return facts.join(dim, cond, "left").select(
        "event_id", "user_id", "ts", "value",
        "state_at", "state_version", "state_since",
    )


# --------------------------------------------------------------------------
# Privacy / data-governance: k-anonymity over quasi-identifier columns —
# the release gate a pipeline runs before publishing user-adjacent data
# (Sweeney 2002). A group of rows sharing a quasi-identifier combination
# smaller than K re-identifies its members; the audit lists the violating
# combinations, the release suppresses them.
# --------------------------------------------------------------------------
K_ANONYMITY = 5
# quasi-identifiers: nation x market segment x account-balance band (the
# salary-band case) — the combination that gets sparse enough to re-identify
_QUASI_SQL = (
    "c_nationkey, c_mktsegment, "
    "CAST(FLOOR(c_acctbal / 1000) AS INT) AS acctbal_band"
)
_QUASI_GROUP = "c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS INT)"


def _quasi_cols():
    return [
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("acctbal_band"),
    ]


@register(
    "privacy_k_anonymity_audit",
    tags=("privacy", "quality", "agg"),
    oracle=f"""
        SELECT {_QUASI_SQL}, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer
        GROUP BY {_QUASI_GROUP}
        HAVING COUNT(*) < {K_ANONYMITY}
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment, account-balance
    band) quasi-identifier triple: every combination shared by fewer than
    K_ANONYMITY customers is a re-identification risk and is reported with
    its group size — the governance gate a pipeline runs before publishing
    user-adjacent data (Sweeney 2002).

    Scale shape: one hash aggregate over the quasi-identifier key (map-side
    combined — each task forwards at most |distinct combinations| rows) and
    a HAVING filter on the aggregated frame. No joins, no windows; the
    violating set is by definition the sparse tail of the group-size
    distribution."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(*_quasi_cols())
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < K_ANONYMITY)
    )


@register(
    "privacy_k_anonymous_release",
    tags=("privacy", "quality", "join"),
    oracle=f"""
        WITH q AS (SELECT c_custkey, {_QUASI_SQL} FROM customer),
        ok AS (
            SELECT c_nationkey, c_mktsegment, acctbal_band
            FROM q
            GROUP BY 1, 2, 3
            HAVING COUNT(*) >= {K_ANONYMITY}
        )
        SELECT c_custkey, c_nationkey, c_mktsegment, acctbal_band
        FROM q JOIN ok USING (c_nationkey, c_mktsegment, acctbal_band)
    """,
)
def privacy_k_anonymous_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymous RELEASE: rows whose quasi-identifier group reaches
    K — suppression of the audit\'s violating tail, published at the
    granularity of the generalized band (the raw balance never leaves).

    Scale shape: the passing-group table comes from one map-side-combined
    aggregate and is BROADCAST back onto the corpus scan as an equi-filter
    — the corpus itself never shuffles (quasi-identifier combinations are
    few by construction; a quasi-key too high-cardinality to broadcast is
    already k-anonymity-violating almost everywhere). Plan-gated: scan +
    broadcast join, no corpus exchange."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), *_quasi_cols()
    )
    keys = ["c_nationkey", "c_mktsegment", "acctbal_band"]
    ok = (
        c.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= K_ANONYMITY)
        .drop("n")
    )
    return c.join(F.broadcast(ok), keys).select(
        "c_custkey", "c_nationkey", "c_mktsegment", "acctbal_band"
    )
