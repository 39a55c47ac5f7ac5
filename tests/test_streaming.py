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


def test_multimodal_decode_plumbing(spark):
    from dblp_to_csv_spark.registry import all_queries

    out = all_queries()["multimodal_decode_stub"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) == 500
    assert list(out.columns) == ["doc_id", "n_bytes", "format", "width", "height", "ok"]
    assert (out["ok"]).all()
    assert (out["width"].between(1, 64)).all()
    assert (out["n_bytes"] > 0).all()
