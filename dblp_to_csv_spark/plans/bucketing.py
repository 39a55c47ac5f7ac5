"""Bucketed co-located joins — the zero-shuffle fact-fact join strategy the
100 TB deployment relies on (SURVEY.md §7: 'bucketing lineitem+orders on
orderkey turns the fact join into a co-partitioned join').

Spark bucketing hash-partitions data INTO FILES at write time (bucketBy +
saveAsTable); a join of two tables bucketed on the same key by the same
bucket count needs no exchange at read time — the physical plan shows
SortMergeJoin with NO ShuffleExchange on either side. tests/test_bucketing.py
asserts exactly that on the plan text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed managed table (warehouse dir = spark conf
    spark.sql.warehouse.dir). At scale n_buckets is sized so each bucket of
    the largest table fits an executor's sort budget."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — Catalyst sees the
    matching output partitionings and elides both shuffles."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
