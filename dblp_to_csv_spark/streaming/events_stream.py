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
    schema (streams cannot infer), ts normalization shared with the batch
    loader (sources.tables.normalize_events_ts).

    Conf hygiene caveat (review r8): a stream over a TIMESTAMP(NANOS) file
    re-reads nanosAsLong at EVERY micro-batch's scan planning — the conf is
    NOT captured by the stream's schema, so restoring it after setup (the
    batch loader's hygiene) would crash the first micro-batch with
    'Illegal Parquet type: INT64 (TIMESTAMP(NANOS))'. For that encoding the
    conf is left SET on the session for the stream's lifetime — the lesser
    evil, documented here; the MICROS/NTZ encoding needs no conf at all."""
    from dblp_to_csv_spark.sources.tables import normalize_events_ts, temp_conf

    with temp_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
        batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(batch.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos encoding: every micro-batch scan needs the conf — set it
        # for the session lifetime (see docstring)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file-stream source wants a directory; glob-filter to the table
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(stream)


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


def stream_dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — the streaming twin of dedup_exact_documents
    (operators/dedup.py): key on an md5 content fingerprint (32-byte state
    key, never the payload) and keep the first arrival.

    dropDuplicatesWithinWatermark bounds state by the watermark horizon:
    a fingerprint's state row is dropped once the watermark passes its event
    time, so memory is O(events per watermark window), independent of stream
    lifetime — the property that makes streaming dedup viable at all at
    ingest scale (a plain dropDuplicates would grow state forever)."""
    return (
        events.withColumn(
            "fingerprint",
            # to_json(struct(...)) keeps field boundaries unambiguous under
            # NULLs — concat_ws silently drops null fields, letting rows
            # that differ only in WHICH field is null collide on one hash
            F.md5(F.to_json(F.struct("event_id", "user_id", "event_type", "value"))),
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def stream_static_enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static dimension
    snapshot (customer market segment). The static side is re-read per
    micro-batch and broadcast — no streaming state at all; this is the
    standard shape for slowly-changing dims at ingest (swap the snapshot
    under the path to 'update' the dim)."""
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "user_id", "ts", "event_type", "value", "c_mktsegment"
    )


def stream_stream_purchase_attribution(
    views: DataFrame, purchases: DataFrame, horizon: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same user's
    view events within the preceding ``horizon`` — the streaming attribution
    twin of the batch as-of join (operators/timeseries.py).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's buffered state is limited to the horizon +
    watermark slack — the two conditions Spark REQUIRES before it will run a
    stream-stream join with bounded state. Inner-join matches emit as soon
    as both rows have arrived (the watermark only gates state eviction)."""
    v = views.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", "1 hour").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    return p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")


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


def stream_upsert_keep_latest(
    events: DataFrame, target_dir: str, checkpoint_dir: str
):
    """foreachBatch upsert sink: maintain a parquet table holding the LATEST
    event per user, merged per micro-batch — the streaming materialization
    of the keep-latest compaction (operators/dedup.py
    `dedup_latest_order_per_customer`), and the idiom for any
    streaming-upsert target that has no native MERGE (with a Delta/Iceberg
    table the batch body becomes one MERGE INTO statement; the
    foreachBatch scaffolding is identical).

    Exactly-once discipline: the streaming engine replays a failed batch
    with the SAME batch_id; the merge body is idempotent (keep-latest of a
    union is insensitive to re-application of the same rows), so replays
    converge instead of duplicating. State lives in the target table itself
    — no streaming state store beyond source offsets in the checkpoint.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from pyspark.sql import Window

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        new = batch.select("user_id", "ts", "event_id", "event_type", "value")
        # crash recovery for the rename-swap below. Two windows:
        # (a) crash after target→_old but before _next→target: target is
        #     missing and the fully-merged table sits in _next — finish the
        #     swap, or the replayed merge would see "first batch" and lose
        #     all prior state;
        # (b) crash during the final _old cleanup: target is complete and
        #     _old is stale — just remove it. Directory RENAMES are atomic,
        #     so no state is ever partially deleted while readable (the
        #     earlier rmtree-then-move protocol could crash mid-delete and
        #     leave a PARTIAL target that replay treated as authoritative —
        #     permanent row loss, review r8).
        if not os.path.isdir(target_dir) and os.path.isdir(target_dir + "_next"):
            shutil.move(target_dir + "_next", target_dir)
        if os.path.isdir(target_dir + "_old"):
            shutil.rmtree(target_dir + "_old")
        # existence check, not try/except: a transient READ failure on an
        # existing target must raise (so the engine retries the batch), not
        # be mistaken for "first batch" and silently discard all prior state
        current = (
            spark.read.parquet(target_dir) if os.path.isdir(target_dir) else None
        )
        merged = new if current is None else current.unionByName(new)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # rewrite-on-merge: correct for parquet (no transactional MERGE);
        # collect-free, one shuffle on user_id. The new table lands fully in
        # _next BEFORE the swap, then two ATOMIC renames replace the target
        # (target→_old, _next→target) and the stale _old is deleted last —
        # every crash point leaves either the old complete table or the new
        # complete table, never a partial one. A transactional table format
        # closes even the missing-target instant via MERGE.
        latest.write.mode("overwrite").parquet(target_dir + "_next")
        if os.path.isdir(target_dir):
            os.rename(target_dir, target_dir + "_old")
        os.rename(target_dir + "_next", target_dir)
        if os.path.isdir(target_dir + "_old"):
            shutil.rmtree(target_dir + "_old")

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_overlaps(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of the batch ``interval_overlap_join_bucketed``
    (ROADMAP #22): pairs of overlapping 1-hour error-event intervals as a
    stream-stream SELF-join. The batch operator's three moves port intact —
    each interval explodes onto its ≤ 2 hour buckets, the join keys on the
    bucket (the equi-key that hash-partitions state; without it a
    stream-stream join has no shuffle key and every task scans all state),
    and a pair emits only from its canonical bucket, so no dedup pass.

    What streaming adds: BOTH sides carry watermarks and the join condition
    bounds the two event times within one interval length — the two
    prerequisites Spark demands before it will run a stream-stream join
    with bounded state (state ≈ one interval length + watermark slack per
    bucket). Second arithmetic is calendar-naive (TIMESTAMP_NTZ), matching
    the batch operator's DST-safe contract."""
    from dblp_to_csv_spark.operators.timeseries import IVL_EPOCH, IVL_LEN_S

    naive_s = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'{IVL_EPOCH} 00:00:00',"
        " CAST(ts AS TIMESTAMP_NTZ))"
    )
    base = (
        events.filter(F.col("event_type") == "error")
        .withColumn("s", naive_s)
        .withColumn("e", F.col("s") + IVL_LEN_S)
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / IVL_LEN_S),
                    F.floor((F.col("e") - 1) / IVL_LEN_S),
                )
            ),
        )
    )
    a = base.withWatermark("ts", watermark).select(
        F.col("event_id").alias("event_a"),
        F.col("ts").alias("ts_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        F.col("bucket").alias("bucket_a"),
    )
    b = base.withWatermark("ts", watermark).select(
        F.col("event_id").alias("event_b"),
        F.col("ts").alias("ts_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        F.col("bucket").alias("bucket_b"),
    )
    cond = (
        (F.col("bucket_a") == F.col("bucket_b"))
        & (F.col("event_a") < F.col("event_b"))
        & (F.col("sa") < F.col("eb"))
        & (F.col("sb") < F.col("ea"))
        # event-time range bound for state eviction (overlap implies it,
        # but Spark's state-cleanup analysis needs it stated on the
        # WATERMARKED columns)
        & (F.col("ts_b") >= F.col("ts_a") - F.expr(f"INTERVAL {IVL_LEN_S} SECOND"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {IVL_LEN_S} SECOND"))
        & (
            F.col("bucket_a")
            == F.floor(F.greatest(F.col("sa"), F.col("sb")) / IVL_LEN_S)
        )
    )
    return a.join(b, cond).select(
        "event_a",
        "event_b",
        (
            F.least(F.col("ea"), F.col("eb"))
            - F.greatest(F.col("sa"), F.col("sb"))
        ).alias("overlap_s"),
    )
