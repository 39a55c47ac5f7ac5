"""Structured Streaming over the events table (SURVEY.md §2.3 M4): the
streaming twins of the batch time-series operators — tumbling windows with a
watermark for late data, and session windows.

The reference has no streaming semantics at all (its incremental XML parse is
pipelining, not event-time processing); these exist because a 100 TB pipeline
ingests events continuously. The aggregation code is IDENTICAL to the batch
path (same groupBy(window(...)) expressions) — Spark's unified API means the
batch queries in operators/timeseries.py are the replay/backfill mode of
these streams.

Tests drive them with trigger(availableNow=True) against the parquet fixture
and assert equality with the batch result (tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream twin of sources.tables.load_table(..., 'events'): explicit
    schema (streams cannot infer), nanos→timestamp conversion identical to
    the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # the file-stream source wants a directory; glob-filter to the one table
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(batch.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling-window counts per event type with a late-data
    watermark: state for a window is dropped once the watermark passes its
    end, so state size is bounded by (windows in flight × event types) —
    constant per key at any throughput."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (session_window merges events within the gap):
    the streaming-stateful equivalent of the batch lag/cumsum sessionization
    in operators/timeseries.py."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
