"""Structured Streaming tests: drive the streaming twins with
trigger(availableNow=True) over the parquet fixture and check agreement with
the batch operators (SURVEY.md §2.3 M4)."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE


def _run_stream(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_stream_tumbling_equals_batch(spark):
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.streaming import load_events_stream, stream_tumbling_counts

    stream = load_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    q = _run_stream(stream_tumbling_counts(stream), "tumbling_test")
    got = _canon(spark.sql("SELECT * FROM tumbling_test").toPandas())
    want = _canon(all_queries()["tumbling_window_events"].fn(spark, SF_SMOKE).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    q.stop()


def test_stream_session_windows_run(spark):
    from dblp_to_csv_spark.streaming import load_events_stream, stream_session_windows

    stream = load_events_stream(spark, SF_SMOKE)
    q = _run_stream(stream_session_windows(stream), "session_test")
    out = spark.sql("SELECT * FROM session_test").toPandas()
    assert len(out) > 0
    assert {"session_start", "session_end", "user_id", "n_events"} == set(out.columns)
    # sessions are disjoint per user and ordered
    assert (out["session_end"] >= out["session_start"]).all()
    assert out["n_events"].sum() > 0
    q.stop()


def test_stream_stateful_user_profiles(spark):
    """applyInPandasWithState: final per-user state equals the batch
    aggregate over the same data."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import load_events_stream
    from dblp_to_csv_spark.streaming.stateful import stream_user_profiles

    stream = load_events_stream(spark, SF_SMOKE)
    q = (
        stream_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        # update mode appends one row per (batch, user): keep the max count
        spark.sql("SELECT user_id, n_events FROM profiles_test")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .set_index("user_id")["n_events"]
    )
    want = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("user_id")["n"]
    )
    assert got.sort_index().tolist() == want.sort_index().tolist()
    q.stop()


def test_stream_dedup_drops_duplicates(spark):
    """Union the stream with itself (every event twice) — streaming dedup
    must restore the exact batch-distinct cardinality."""
    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import load_events_stream, stream_dedup_events

    doubled = load_events_stream(spark, SF_SMOKE).unionAll(
        load_events_stream(spark, SF_SMOKE)
    )
    q = (
        stream_dedup_events(doubled)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT fingerprint) AS d FROM dedup_test").first()
    want = load_table(spark, SF_SMOKE, "events").count()
    assert got["n"] == want  # doubled input, deduped back to once each
    assert got["d"] == want
    q.stop()


def test_stream_static_enrich_matches_batch(spark):
    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import load_events_stream, stream_static_enrich

    customers = load_table(spark, SF_SMOKE, "customer")
    q = (
        stream_static_enrich(load_events_stream(spark, SF_SMOKE), customers)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _canon(spark.sql("SELECT * FROM enrich_test").toPandas())
    ev = load_table(spark, SF_SMOKE, "events")
    from pyspark.sql import functions as F

    want = _canon(
        ev.join(
            customers.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            "user_id",
            "left",
        )
        .select("event_id", "user_id", "ts", "event_type", "value", "c_mktsegment")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["c_mktsegment"].notna().all()  # every user_id hit the dim
    q.stop()


def test_stream_stream_join_matches_batch_interval_join(spark):
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import (
        load_events_stream,
        stream_stream_purchase_attribution,
    )

    stream = load_events_stream(spark, SF_SMOKE)
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = (
        stream_stream_purchase_attribution(views, purchases)
        .writeStream.format("memory")
        .queryName("attribution_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _canon(spark.sql("SELECT * FROM attribution_test").toPandas())

    ev = load_table(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    want = _canon(
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 hours")),
        )
        .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    q.stop()


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: a checkpointed query that already
    processed the input emits NOTHING new when restarted on the same
    checkpoint — the file source's offsets live in the checkpoint, the
    property that makes streaming jobs safely re-runnable."""
    from dblp_to_csv_spark.streaming import load_events_stream, stream_tumbling_counts

    ckpt = str(tmp_path / "ckpt")
    out1 = (
        stream_tumbling_counts(load_events_stream(spark, SF_SMOKE))
        .writeStream.format("memory")
        .queryName("restart_run1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    out1.awaitTermination(120)
    n1 = spark.sql("SELECT COUNT(*) n FROM restart_run1").first()["n"]
    progress1 = out1.lastProgress["numInputRows"] if out1.lastProgress else None
    out1.stop()
    assert n1 > 0

    out2 = (
        stream_tumbling_counts(load_events_stream(spark, SF_SMOKE))
        .writeStream.format("memory")
        .queryName("restart_run2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    out2.awaitTermination(120)
    # restart consumed no new input (offsets recovered from the checkpoint)
    total_in2 = sum(
        p.get("numInputRows", 0) for p in [out2.lastProgress or {}]
    )
    out2.stop()
    assert total_in2 == 0, f"restart reprocessed {total_in2} rows (expected 0)"
    assert progress1 is None or progress1 > 0


def test_multimodal_decode_plumbing(spark):
    from dblp_to_csv_spark.operators.multimodal import BMP_WIDTH
    from dblp_to_csv_spark.registry import all_queries

    out = all_queries()["multimodal_decode_bmp"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) == 500
    assert list(out.columns) == [
        "doc_id", "ok", "width", "height", "pixel_sum", "top_left",
    ]
    ok = out[out["ok"]]
    assert len(ok) > 0
    assert (ok["width"].between(1, BMP_WIDTH)).all()
    assert (ok["height"] >= 1).all()
    assert (ok["pixel_sum"] > 0).all()


def test_multimodal_resize_plumbing(spark):
    """binary→binary mapInPandas: every payload lands at exactly the target
    size, type stays binary, content is a prefix of the original."""
    from dblp_to_csv_spark.operators.multimodal import (
        resize_payloads,
        with_binary_payload,
    )
    from dblp_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    resized = resize_payloads(
        with_binary_payload(docs).select("doc_id", "payload"), target_bytes=64
    )
    assert dict(resized.dtypes)["payload"] == "binary"
    out = resized.toPandas()
    assert len(out) == 500
    assert (out["n_bytes"] == 64).all()
    assert out["payload"].map(len).eq(64).all()


def test_stream_upsert_keep_latest(spark, tmp_path):
    """foreachBatch upsert: after draining the stream, the target parquet
    table holds exactly the batch keep-latest result (one row per user,
    latest by (ts, event_id)); a second run over the same source is a no-op
    (idempotent merge)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import load_events_stream
    from dblp_to_csv_spark.streaming.events_stream import stream_upsert_keep_latest

    target = str(tmp_path / "latest")

    def run(ckpt: str) -> None:
        q = stream_upsert_keep_latest(
            load_events_stream(spark, SF_SMOKE), target, str(tmp_path / ckpt)
        )
        q.awaitTermination(180)
        q.stop()

    run("ckpt1")
    got = spark.read.parquet(target).toPandas().sort_values("user_id")

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        load_table(spark, SF_SMOKE, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
        .sort_values("user_id")
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["event_id"].tolist() == want["event_id"].tolist()

    run("ckpt2")  # fresh checkpoint: same source replayed into the target
    again = spark.read.parquet(target).toPandas().sort_values("user_id")
    assert again["event_id"].tolist() == want["event_id"].tolist()


def test_stream_observe_metrics_per_batch(spark, tmp_path):
    """df.observe on a STREAM: per-microbatch QA counters (rows, summed
    event values, null counts) surface in StreamingQueryProgress
    .observedMetrics — the zero-extra-cost monitoring hook a production
    ingest uses for funnel dashboards and data-quality alerts."""
    import shutil

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table

    events = load_table(spark, SF_SMOKE, "events")
    schema = events.schema
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(SF_SMOKE + "/events.parquet", src_dir / "part-0.parquet")
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(str(src_dir))
        .observe(
            "ingest_qa",
            F.count(F.lit(1)).alias("rows"),
            F.sum("value").alias("value_sum"),
            F.count(F.when(F.col("value").isNull(), 1)).alias("null_values"),
        )
    )
    q = (
        src.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("obs_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    observed = [
        p.observedMetrics["ingest_qa"]
        for p in q.recentProgress
        if "ingest_qa" in (p.observedMetrics or {})
    ]
    assert observed, "no observed metrics surfaced in progress"
    total_rows = sum(m["rows"] for m in observed)
    assert total_rows == events.count()
    import math

    got = sum(m["value_sum"] for m in observed)
    want = events.agg(F.sum("value")).collect()[0][0]
    assert math.isclose(got, want, rel_tol=1e-9)


def test_stream_windowed_type_mix_equals_batch_monitor(spark):
    """The windowed drift monitor's aggregation core under Structured
    Streaming: per-(hour window, event_type) counts with a watermark must
    equal the batch drift_chi2_by_window observation frame — the chi-square
    fold is driver-side arithmetic over this tiny frame, so count parity IS
    monitor parity."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming import load_events_stream

    stream = load_events_stream(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = _run_stream(agg, "drift_mix_test")
    got = _canon(spark.sql("SELECT * FROM drift_mix_test").toPandas())
    ev = load_table(spark, SF_SMOKE, "events")
    want = _canon(
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    q.stop()


def test_stateful_last_event_is_event_time_latest(spark, tmp_path):
    """Regression (review r8): 'last_event_type' must be the EVENT-TIME
    latest, not the arrival-latest — a late (older-ts) event in a later
    micro-batch used to overwrite the stored value because state carried
    no ordering key."""
    import json as _json

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.streaming.stateful import stream_user_profiles

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": i, "user_id": u, "ts": ts, "event_type": et,
                     "value": 1.0}
                )
                for i, u, ts, et in rows
            )
        )

    lake = str(tmp_path / "lake")

    def run_once():
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, "
                "event_type string, value double"
            ).json(str(src))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(lake)

        # foreachBatch sink: the memory sink cannot recover from a
        # checkpoint across restarts, and the checkpoint is the point —
        # batch 2 must arrive in a SEPARATE micro-batch with carried state
        q = (
            stream_user_profiles(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    # batch 1: the user's true latest event (purchase @ 12:00)
    land("b1.json", [(1, 7, "2024-01-01 10:00:00", "view"),
                     (2, 7, "2024-01-01 12:00:00", "purchase")])
    run_once()
    # batch 2: a LATE event with an older timestamp (click @ 11:00)
    land("b2.json", [(3, 7, "2024-01-01 11:00:00", "click")])
    run_once()
    rows = sorted(
        spark.read.parquet(lake).filter(F.col("user_id") == 7).collect(),
        key=lambda r: r["n_events"],
    )
    latest = rows[-1]  # update mode emits one row per batch; max n = final
    assert latest["n_events"] == 3
    assert latest["last_event_type"] == "purchase"  # event-time latest wins


def test_stream_ewma_equals_batch(spark, tmp_path):
    """stream_user_ewma under the declared ordering contract (event-time-
    ordered delivery: the corpus split into three time-range parquet files,
    one micro-batch each) must reproduce the batch ewma_event_values row
    for row — same per-event EWMA from carried O(EWMA_LAGS) state."""
    import math

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.timeseries import ewma_event_values
    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming.stateful import stream_user_ewma

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    cuts = [lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3]
    src = tmp_path / "src"
    for i, part in enumerate(
        [
            ev.filter(F.col("ts") <= cuts[0]),
            ev.filter((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])),
            ev.filter(F.col("ts") > cuts[1]),
        ]
    ):
        part.coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    lake = str(tmp_path / "lake")
    q = (
        stream_user_ewma(stream)
        .writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(lake)
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        r["event_id"]: r["ewma"] for r in spark.read.parquet(lake).collect()
    }
    want = {
        r["event_id"]: r["ewma"]
        for r in ewma_event_values(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want) and len(got) > 100
    for eid, w in want.items():
        g = got[eid]
        assert (g is None) == (w is None), eid
        if w is not None:
            # Python round() is banker's, Spark round() half-up: allow the
            # 6th-decimal ulp on exact ties, nothing more
            assert math.isclose(g, w, abs_tol=1.1e-6), (eid, g, w)


def test_stream_interval_overlaps_equals_batch(spark):
    """The stream-stream bucketed interval self-join must emit exactly the
    batch interval_overlap_join_bucketed pair set (inner join: matches emit
    once both sides arrive; the watermark only gates state eviction)."""
    from dblp_to_csv_spark.operators.timeseries import (
        interval_overlap_join_bucketed,
    )
    from dblp_to_csv_spark.streaming.events_stream import (
        load_events_stream,
        stream_interval_overlaps,
    )

    stream = load_events_stream(spark, SF_SMOKE)
    q = (
        stream_interval_overlaps(stream)
        .writeStream.format("memory")
        .queryName("ivl_overlap_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        (r["event_a"], r["event_b"], r["overlap_s"])
        for r in spark.sql("SELECT * FROM ivl_overlap_test").collect()
    }
    want = {
        (r["event_a"], r["event_b"], r["overlap_s"])
        for r in interval_overlap_join_bucketed(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(want) > 50, "fixture too weak: few overlapping intervals"


def test_stream_group_bottomk_matches_batch_sketch(spark):
    """Streaming bottom-k sketch: the final per-group state (p50/p95 over
    the k smallest md5(event_id) rows) must equal the BATCH per-group
    sketch over the same data — the mergeability property as a streaming
    parity pin (each micro-batch merges and re-cuts, so chunking cannot
    change the final draw)."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.streaming import load_events_stream
    from dblp_to_csv_spark.streaming.stateful import stream_group_bottomk

    stream = load_events_stream(spark, SF_SMOKE)
    q = (
        stream_group_bottomk(stream)
        .writeStream.format("memory")
        .queryName("bottomk_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per (batch, group); the single-file fixture
    # runs exactly one availableNow batch, so the table IS the final state
    # (one row per group — asserted by the index comparison below)
    got = (
        spark.sql("SELECT event_type, p50, p95 FROM bottomk_test")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    batch = (
        all_queries()["sketch_bottomk_quantiles_by_group"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .pivot(index="event_type", columns="q", values="est")
        .sort_index()
    )
    assert list(got.index) == list(batch.index)
    for et in got.index:
        assert abs(got.loc[et, "p50"] - batch.loc[et, 0.5]) < 1e-9, et
        assert abs(got.loc[et, "p95"] - batch.loc[et, 0.95]) < 1e-9, et
    q.stop()


def test_stream_group_bottomk_state_merge_across_batches(spark):
    """The state-restore + merge+re-cut path (state.exists) that the
    single-batch availableNow test cannot reach: drive the update function
    directly with a fake GroupState across two chunked invocations and
    assert the final emission equals the one-shot result — the streaming
    sketch's actual across-micro-batch contract."""
    import pandas as pd

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming.stateful import _update_group_bottomk

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    # all events as ONE synthetic group (the function never reads the key
    # from the rows) so the sample exceeds k and the re-cut actually cuts
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "value")
        .toPandas()
    )
    from dblp_to_csv_spark.operators.statistics import BOTTOMK_GROUP_K

    assert len(ev) > BOTTOMK_GROUP_K

    def final_emission(chunk_lists):
        state = FakeState()
        out = None
        for chunks in chunk_lists:
            out = list(
                _update_group_bottomk(("click",), iter(chunks), state)
            )[0]
        return out

    one_shot = final_emission([[ev]])
    # two micro-batches, the second itself split into two chunks (the
    # multiple-pdfs-per-group delivery shape), arbitrary order
    halves = [ev.iloc[: len(ev) // 2], ev.iloc[len(ev) // 2 :]]
    q1 = halves[1].iloc[: len(halves[1]) // 2]
    q2 = halves[1].iloc[len(halves[1]) // 2 :]
    chunked = final_emission([[halves[0]], [q2, q1]])
    for col in ("k_used", "p50", "p95"):
        assert one_shot[col].iloc[0] == chunked[col].iloc[0], col


def test_stream_group_bottomk_tolerates_null_event_id(spark):
    """NULL-id hardening (ADVICE r11): a micro-batch chunk whose event_id
    column was widened to float64 by pandas (nullable batch) must neither
    crash on int(NaN) nor let the NULL row draw a sample slot — mirroring
    the batch twin, where md5(NULL) = NULL yields no draw. The result must
    equal the same batch with the NULL rows absent."""
    import pandas as pd

    from dblp_to_csv_spark.sources.tables import load_table
    from dblp_to_csv_spark.streaming.stateful import _update_group_bottomk

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "value")
        .limit(600)
        .toPandas()
    )
    # the nullable delivery shape: float64 ids with NaN holes
    holed = ev.copy()
    holed["event_id"] = holed["event_id"].astype("float64")
    holed.loc[holed.index[::7], "event_id"] = float("nan")
    clean = ev[~pd.isna(holed["event_id"]).values]

    def run(pdf):
        state = FakeState()
        return list(_update_group_bottomk(("click",), iter([pdf]), state))[0]

    got, want = run(holed), run(clean)
    for col in ("k_used", "p50", "p95"):
        assert got[col].iloc[0] == want[col].iloc[0], col
