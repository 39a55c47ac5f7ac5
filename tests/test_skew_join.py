"""AQE skew-join demonstration (ROADMAP #7): a join where 80% of the left
side shares one key must be split by adaptive execution — the executed plan
carries the SortMergeJoin(skew=true) marker — while producing exactly the
same rows. This is the runtime half of the engine's skew story (the
compile-time half is the salted aggregation, salted_agg_event_types)."""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 100).alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        joined = left.join(right, "k")
        rows = joined.count()
        # materialize THIS DataFrame's query execution to read the final
        # adaptive plan (explain() would re-plan from scratch)
        collected = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan.splitlines()[:10]
        assert rows == len(collected) == 400_000
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_salted_join_plan_is_salted_smj(spark):
    """The registered salted-join query must actually shuffle on
    (key, salt): SortMergeJoin present (the merge hint defeats the
    100-row-dim broadcast that would make the demonstration vacuous)
    and both join keys in the condition."""
    from dblp_to_csv_spark.registry import all_queries

    df = all_queries()["skew_join_salted_events"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan.splitlines()[:12]
    assert "salt" in plan and "hot_key" in plan


def test_salted_join_hot_key_uses_all_salts(spark):
    """ADVICE r13: the salt must be decorrelated from the hot-key rule.
    Hot key 0 = even event_ids, so a plain event_id % 16 salt only ever
    hit the 8 even salt values — halving the demonstrated mitigation. The
    pmod(hash(event_id), 16) salt must spread the hot key across (nearly)
    all 16 reducer slots, and never go negative."""
    from dblp_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    salts = [
        r["salt"]
        for r in ev.filter(F.col("event_id") % 2 == 0)
        .select(F.pmod(F.hash("event_id"), F.lit(16)).alias("salt"))
        .distinct()
        .collect()
    ]
    assert len(salts) >= 14, sorted(salts)
    assert all(0 <= s < 16 for s in salts), sorted(salts)


def test_salted_join_hot_key_is_hot(spark):
    """Fixture honesty: key 0 must actually carry ~half the fact rows —
    if a testdata regeneration flattened event_id parity the query would
    stop demonstrating anything."""
    import duckdb

    n, hot = duckdb.sql(
        """
        SELECT COUNT(*),
               SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
        FROM read_parquet('/root/testdata/sf0.01/events.parquet')
        WHERE event_id IS NOT NULL
        """
    ).fetchone()
    assert hot >= n * 0.4, (hot, n)
