"""Association analysis: market-basket co-occurrence mining with apriori
item pruning and PMI/lift scoring (SURVEY.md §2.4 training-pipeline
extensions — collocation/co-occurrence statistics over grouped facts).

The reference (XMLToCSV.py) has no analytics surface; this module extends
the engine the way FP-growth/apriori front-ends extend a warehouse: the
candidate-pair space is pruned by item frequency BEFORE the quadratic
per-basket pair expansion, which is what keeps the op feasible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

# Apriori-style item floor: items below the 25th percentile of basket
# frequency never enter the pair join. Data-derived (a quantile, not an
# absolute count) so the prune neither vanishes nor goes total as the scale
# factor moves.
ITEM_FREQ_QUANTILE = 0.25
# Absolute pair-support floor: a pair seen once is noise at any scale.
PAIR_MIN_SUPPORT = 2


@register(
    "cooccurrence_parts_pmi",
    tags=("association", "agg", "join"),
    oracle=f"""
        WITH basket AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM basket),
        freq AS (
            SELECT item, COUNT(*) AS item_n FROM basket GROUP BY item
        ),
        cut AS (
            SELECT quantile_cont(item_n, {ITEM_FREQ_QUANTILE}) AS cutoff
            FROM freq
        ),
        kept AS (
            SELECT basket.basket, basket.item, freq.item_n
            FROM basket JOIN freq USING (item), cut
            WHERE freq.item_n >= cut.cutoff
        ),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   COUNT(*) AS pair_n
            FROM kept a JOIN kept b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
            HAVING COUNT(*) >= {PAIR_MIN_SUPPORT}
        )
        SELECT pairs.item_a, pairs.item_b,
               CAST(pairs.pair_n AS BIGINT) AS pair_n,
               CAST(fa.item_n AS BIGINT) AS n_a,
               CAST(fb.item_n AS BIGINT) AS n_b,
               ROUND(CAST(pairs.pair_n * n.n_baskets AS DOUBLE)
                     / CAST(fa.item_n * fb.item_n AS DOUBLE), 6) AS lift,
               ROUND(LN(CAST(pairs.pair_n * n.n_baskets AS DOUBLE)
                     / CAST(fa.item_n * fb.item_n AS DOUBLE)), 6) AS pmi
        FROM pairs
        JOIN freq fa ON fa.item = pairs.item_a
        JOIN freq fb ON fb.item = pairs.item_b, n
    """,
)
def cooccurrence_parts_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over order line items with PMI and lift
    scoring: which parts are ordered together more often than chance.

    Shape: distinct (basket, item) → item-frequency table → apriori prune
    (items below the 25% frequency quantile never enter
    the pair join) → per-basket self-join with ``item_a < item_b`` → pair
    support with an absolute floor of PAIR_MIN_SUPPORT=2 → PMI
    ``ln(pair_n·N / (n_a·n_b))`` from integer-exact BIGINT products so the
    doubles agree bit-for-bit with the oracle.

    At 100 TB: the pair expansion is quadratic ONLY in basket size (bounded
    — a TPC-H order has ≤7 lines; a retail basket tens), and the self-join
    co-partitions both sides on the basket key, so one exchange feeds it.
    The item-frequency table is vocabulary-sized (items, not rows) and
    broadcasts to both the prune and the final scoring join; the quantile
    cutoff is a 1-row broadcast. This is the classic apriori observation:
    pruning infrequent ITEMS before pair formation removes the long tail
    that would otherwise dominate the pair shuffle.

    r14 optimization round: the distinct (basket, item) frame and the
    vocabulary-sized frequency table each parquet-checkpoint ONCE. The
    lazy plan referenced ``basket`` from five consumers (freq → cut /
    kept_items / fa / fb, n_baskets, and both self-join sides), and Spark
    re-evaluated the lineitem scan + distinct shuffle under each one —
    the before-plan carries 27 shuffle Exchanges (36 with broadcast
    builds) and six lineitem scans for what is logically one distinct +
    one aggregate (guide §2.4: remove duplicated subtrees; measured at
    sf0.1 in the bench series — plans/r14/cooccurrence_parts_pmi_*)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    ck = checkpoint_base(spark, None, "_pmi_")
    basket_path = os.path.join(ck, "basket")
    (
        # fan-out-gated scan (guide §2.5): integer distinct — order-exact;
        # without it the scan+partial-distinct pass runs in one task on the
        # single-row-group bench parquet.
        fan_out_small(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
        .select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        )
        .distinct()
        .write.mode("overwrite")
        .parquet(basket_path)
    )
    basket = spark.read.parquet(basket_path)
    freq_path = os.path.join(ck, "freq")
    basket.groupBy("item").agg(F.count("*").alias("item_n")).write.mode(
        "overwrite"
    ).parquet(freq_path)
    freq = spark.read.parquet(freq_path)
    cut = freq.agg(
        F.expr(f"percentile(item_n, {ITEM_FREQ_QUANTILE})").alias("cutoff")
    )
    n_baskets = basket.agg(
        F.count_distinct("basket").alias("n_baskets")
    )
    # Item-level (vocabulary-sized) surviving-item table: the prune reaches
    # each self-join side as ONE broadcast semi-join, and the frequencies
    # attach AFTER the pair aggregate, so the heavy chain is never repeated.
    kept_items = (
        freq.crossJoin(F.broadcast(cut))
        .filter(F.col("item_n") >= F.col("cutoff"))
        .select("item", "item_n")
    )
    kept = basket.join(F.broadcast(kept_items.select("item")), "item").select(
        "basket", "item"
    )
    a = kept.select("basket", F.col("item").alias("item_a"))
    # shuffled-hash, not sort-merge (guide §3.1): the per-basket self-join
    # needs no sorted output, and the build side's per-partition hash table
    # is bounded by the shuffle partition count — skipping both sorts
    # measured 2.48 → 2.08 s at sf0.1 (interleaved best-of-3; an in-row
    # collect_set pair expansion variant measured 2.61 and was rejected).
    b = kept.select("basket", F.col("item").alias("item_b")).hint("shuffle_hash")
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= PAIR_MIN_SUPPORT)
    )
    fa = kept_items.select(
        F.col("item").alias("item_a"), F.col("item_n").alias("n_a")
    )
    fb = kept_items.select(
        F.col("item").alias("item_b"), F.col("item_n").alias("n_b")
    )
    scored = pairs.join(F.broadcast(fa), "item_a").join(F.broadcast(fb), "item_b")
    ratio = (F.col("pair_n") * F.col("n_baskets")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return scored.crossJoin(F.broadcast(n_baskets)).select(
        "item_a",
        "item_b",
        F.col("pair_n").cast("long").alias("pair_n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(ratio, 6).alias("lift"),
        F.round(F.log(ratio), 6).alias("pmi"),
    )
