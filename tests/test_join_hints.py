"""Join-strategy hint surface: the optimizer-control API a tuning engineer
uses when AQE's choice is wrong. Each hint must actually flip the physical
strategy — asserted on the executed plan, same discipline as the plan gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from dblp_to_csv_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _sides(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    return orders, cust


def test_broadcast_hint(spark):
    orders, cust = _sides(spark)
    plan = _plan_of(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey))
    assert "BroadcastHashJoin" in plan


def test_merge_hint_forces_smj(spark):
    orders, cust = _sides(spark)
    plan = _plan_of(
        orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    )
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint(spark):
    orders, cust = _sides(spark)
    plan = _plan_of(
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
    )
    assert "ShuffledHashJoin" in plan


def test_sql_hint_comment_form(spark):
    orders, cust = _sides(spark)
    orders.createOrReplaceTempView("h_orders")
    cust.createOrReplaceTempView("h_cust")
    plan = _plan_of(
        spark.sql(
            "SELECT /*+ MERGE(c) */ o.o_orderkey FROM h_orders o "
            "JOIN h_cust c ON o.o_custkey = c.c_custkey"
        )
    )
    assert "SortMergeJoin" in plan
