"""Misra-Gries two-pass heavy hitters: the no-false-negative guarantee
under adversarial partitioning, the summary-size bound, and the plan
shape (operators/statistics.py::heavy_hitters_words)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.statistics import (
    HH_K,
    HH_PHI,
    heavy_hitters_words,
    mg_partition_summaries,
)
from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _oracle_rows(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return sorted(
        con.execute(all_queries()["heavy_hitters_words"].oracle).fetchall()
    )


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_result_independent_of_partitioning(spark, parts):
    """The MG candidate set varies with partition boundaries; the recounted
    + thresholded RESULT must not — it equals the full-GROUP BY oracle for
    ANY partitioning (the pigeonhole guarantee made operational)."""
    docs = load_table(spark, SF_SMOKE, "documents").repartition(parts)
    from dblp_to_csv_spark.functions.text import words

    tok = docs.select(F.explode(words("text")).alias("word"))
    cand = mg_partition_summaries(tok).select("word").distinct()
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    got = (
        tok.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(HH_PHI) * F.col("total")))
        .select("word", "cnt")
    )
    want = {(w, c) for w, c, _ in _oracle_rows(SF_SMOKE)}
    assert {(r["word"], r["cnt"]) for r in got.collect()} == want


def test_summary_size_bounded(spark):
    """Every partition's MG summary carries at most HH_K counters — the
    property that makes pass 1 shuffle-free and memory-bounded."""
    docs = load_table(spark, SF_SMOKE, "documents").repartition(4)
    from dblp_to_csv_spark.functions.text import words

    tok = docs.select(
        F.explode(words("text")).alias("word"), F.spark_partition_id()
    ).select("word")
    summ = mg_partition_summaries(tok)
    # 4 partitions x <= HH_K entries
    assert summ.count() <= 4 * HH_K


def test_plan_narrow_pass_then_candidate_recount(spark):
    plan = (
        heavy_hitters_words(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan  # pass 1: the narrow summary
    assert "BroadcastHashJoin" in plan  # pass 2: candidate semi-join
    assert "SortMergeJoin" not in plan
