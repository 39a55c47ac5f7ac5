"""Partition-layout pruning proofs on the physical plan: static pruning for
literal predicates on the partition column, DYNAMIC partition pruning (DPP)
when the pruning predicate only materializes through a dimension join —
the scan must carry a dynamicpruning subquery, not read all partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from dblp_to_csv_spark.plans.layout import write_partitioned
from dblp_to_csv_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _fact(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    write_partitioned(load_table(spark, SF_SMOKE, "events"), path, "event_type")
    return spark.read.parquet(path)


def test_static_partition_pruning(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    plan = (
        fact.filter(F.col("event_type") == "view")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the literal predicate lands in PartitionFilters, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_dynamic_partition_pruning_through_dim_join(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert")],
        "event_type string, family string",
    )
    j = fact.join(dim, "event_type").filter(F.col("family") == "convert")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the join itself broadcasts the dim, no shuffle of the fact side
    assert "BroadcastHashJoin" in plan
    rows = j.count()
    direct = fact.filter(F.col("event_type") == "purchase").count()
    assert rows == direct > 0
