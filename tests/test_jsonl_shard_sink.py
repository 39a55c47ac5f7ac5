"""The ``jsonl-shards`` Python Data Source sink: roundtrip fidelity,
manifest/commit atomicity contract, overwrite vs append semantics, gzip,
and option validation. Also covers the plain ORC built-in roundtrip (the
one columnar alternative format shipped inside Spark — engine completeness
for SURVEY §2.4 I/O)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest

from dblp_to_csv_spark.sources.jsonl import read_jsonl_documents
from dblp_to_csv_spark.sources.jsonl_shard_sink import (
    MANIFEST_NAME,
    JsonlShardDataSource,
)
from dblp_to_csv_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(JsonlShardDataSource)
    return spark


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_shard_sink_roundtrip_and_manifest(registered, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(registered).repartition(4)
    docs.write.format("jsonl-shards").option("path", out).mode(
        "overwrite"
    ).save()

    shards = sorted(glob.glob(os.path.join(out, "shard-*.jsonl")))
    assert len(shards) == 4
    assert [os.path.basename(s) for s in shards] == [
        f"shard-{i:05d}.jsonl" for i in range(4)
    ]
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_shards"] == 4
    assert manifest["n_rows"] == docs.count()
    assert sum(s["rows"] for s in manifest["shards"]) == manifest["n_rows"]
    assert not glob.glob(os.path.join(out, "_tmp-*"))

    back = read_jsonl_documents(registered, out, quarantine_corrupt=False)
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(*docs.columns).collect()}
    assert a == b


def test_shard_sink_overwrite_replaces(registered, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(registered)
    docs.repartition(4).write.format("jsonl-shards").option("path", out).mode(
        "overwrite"
    ).save()
    docs.limit(10).repartition(1).write.format("jsonl-shards").option(
        "path", out
    ).mode("overwrite").save()
    shards = glob.glob(os.path.join(out, "shard-*.jsonl"))
    assert len(shards) == 1
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_shards"] == 1 and manifest["n_rows"] == 10


def test_shard_sink_append_extends_numbering(registered, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(registered)
    docs.limit(5).repartition(1).write.format("jsonl-shards").option(
        "path", out
    ).mode("append").save()
    docs.limit(7).repartition(2).write.format("jsonl-shards").option(
        "path", out
    ).mode("append").save()
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "shard-*"))
    )
    assert names == ["shard-00000.jsonl", "shard-00001.jsonl", "shard-00002.jsonl"]
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_shards"] == 3 and manifest["n_rows"] == 12


def test_shard_sink_gzip(registered, tmp_path):
    out = str(tmp_path / "gz")
    _docs(registered).limit(20).repartition(1).write.format(
        "jsonl-shards"
    ).option("path", out).option("compress", "gzip").mode("overwrite").save()
    [shard] = glob.glob(os.path.join(out, "shard-*.jsonl.gz"))
    with gzip.open(shard, "rt", encoding="utf-8") as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == 20 and {"doc_id", "text"} <= set(lines[0])


def test_shard_sink_rejects_bad_options(registered, tmp_path):
    df = _docs(registered).limit(1)
    with pytest.raises(Exception, match="unsupported compress"):
        df.write.format("jsonl-shards").option("path", str(tmp_path)).option(
            "compress", "lz9"
        ).mode("overwrite").save()
    with pytest.raises(Exception, match="'path' is required"):
        df.write.format("jsonl-shards").mode("overwrite").save()


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """Engine I/O completeness: the built-in ORC columnar format round-trips
    the lineitem slice with schema and values intact."""
    out = str(tmp_path / "orc")
    li = load_table(spark, SF, "lineitem").limit(100)
    li.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == li.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_shard_sink_streaming_batches_and_manifest(registered, tmp_path):
    """Streaming twin: two source files at maxFilesPerTrigger=1 under
    availableNow become two committed batches, each with its own shard set;
    the merged manifest carries per-batch entries and the total row count."""
    src = tmp_path / "src"
    src.mkdir()
    docs = _docs(registered)
    # single parquet FILES (the file-stream source does not recurse into
    # the directory layout df.write.parquet produces)
    docs.limit(6).toPandas().to_parquet(src / "a.parquet")
    docs.limit(10).toPandas().to_parquet(src / "b.parquet")
    out = str(tmp_path / "stream_out")
    os.makedirs(out, exist_ok=True)

    stream = (
        registered.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.format("jsonl-shards")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["format"] == "jsonl-shards-stream/v1"
    assert manifest["n_rows"] == 16
    assert set(manifest["batches"]) == {"0", "1"}
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "batch-*"))
    )
    assert names == [
        "batch-000000-shard-00000.jsonl",
        "batch-000001-shard-00000.jsonl",
    ]
    # restart on the same checkpoint: nothing new to process, nothing changes
    q2 = (
        registered.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.format("jsonl-shards")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    manifest2 = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest2["n_rows"] == 16 and set(manifest2["batches"]) == {"0", "1"}


def test_shard_sink_streaming_complete_mode_replaces(registered, tmp_path):
    """outputMode('complete') (overwrite=True): each microbatch is a full
    snapshot, so the manifest and shard set must hold ONLY the latest
    batch — never the accumulated history (review r9 session 3)."""
    src = tmp_path / "src"
    src.mkdir()
    docs = _docs(registered)
    docs.limit(6).toPandas().to_parquet(src / "a.parquet")
    docs.limit(10).toPandas().to_parquet(src / "b.parquet")
    out = str(tmp_path / "complete_out")

    agg = (
        registered.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .groupBy("lang")
        .count()
    )
    q = (
        agg.writeStream.format("jsonl-shards")
        .outputMode("complete")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    # only the LAST batch's snapshot survives
    assert set(manifest["batches"]) == {"1"}
    rows = []
    for p in glob.glob(os.path.join(out, "batch-*")):
        assert os.path.basename(p).startswith("batch-000001-")
        with open(p, encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    # snapshot equals the batch aggregate over BOTH files (cumulative state)
    want = {
        (r["lang"], r["count"])
        for r in docs.limit(6)
        .unionAll(docs.limit(10))
        .groupBy("lang")
        .count()
        .toPandas()
        .to_dict("records")
    }
    assert {(r["lang"], r["count"]) for r in rows} == want


def test_shard_sink_append_skips_orphaned_shards(registered, tmp_path):
    """Crash recovery: a prior commit that renamed its shards but died
    before the manifest landed leaves shard files the manifest doesn't
    know about. Append must number PAST what is on disk — not os.replace()
    onto committed data (advisor r9)."""
    out = str(tmp_path / "corpus")
    docs = _docs(registered)
    docs.limit(5).repartition(1).write.format("jsonl-shards").option(
        "path", out
    ).mode("append").save()
    first = open(os.path.join(out, "shard-00000.jsonl"), "rb").read()
    # simulate the crash window: shard present, manifest gone
    os.remove(os.path.join(out, MANIFEST_NAME))
    docs.limit(7).repartition(1).write.format("jsonl-shards").option(
        "path", out
    ).mode("append").save()
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "shard-*"))
    )
    assert names == ["shard-00000.jsonl", "shard-00001.jsonl"]
    assert open(os.path.join(out, "shard-00000.jsonl"), "rb").read() == first
    # the rewritten manifest accounts for the NEW commit only (the orphan
    # predates any manifest), but the orphan's bytes survive untouched
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_rows"] == 7
    assert manifest["shards"][0]["shard"] == "shard-00001.jsonl"


def test_shard_sink_put_protocol_roundtrip(registered, tmp_path):
    """commit-protocol=put publishes through the object-store path (copy +
    single-shot manifest PUT) and produces the identical dataset."""
    out = str(tmp_path / "put")
    docs = _docs(registered)
    docs.repartition(3).write.format("jsonl-shards").option("path", out).option(
        "commit-protocol", "put"
    ).mode("overwrite").save()
    shards = sorted(glob.glob(os.path.join(out, "shard-*.jsonl")))
    assert len(shards) == 3
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_rows"] == docs.count()
    assert not glob.glob(os.path.join(out, "_tmp-*"))
    back = read_jsonl_documents(registered, out, quarantine_corrupt=False)
    assert back.count() == docs.count()


def test_shard_sink_put_protocol_never_renames(tmp_path, monkeypatch):
    """Unit-level (no Spark): drive the writer directly with the put
    protocol while os.replace/os.rename are rigged to raise — proving the
    object-store path needs no atomic rename anywhere in commit."""
    import pyarrow as pa

    from dblp_to_csv_spark.sources import jsonl_shard_sink as mod

    out = tmp_path / "store"
    w = mod.JsonlShardWriter(
        {"path": str(out), "commit-protocol": "put"}, overwrite=True
    )
    batch = pa.RecordBatch.from_pylist([{"a": 1}, {"a": 2}])
    msg = w.write(iter([batch]))

    def no_rename(*a, **k):
        raise AssertionError("rename is not available on this store")

    monkeypatch.setattr(mod.os, "replace", no_rename)
    monkeypatch.setattr(mod.os, "rename", no_rename)
    w.commit([msg])
    manifest = json.load(open(out / MANIFEST_NAME))
    assert manifest["n_rows"] == 2 and manifest["n_shards"] == 1
    lines = open(out / "shard-00000.jsonl").read().splitlines()
    assert [json.loads(l)["a"] for l in lines] == [1, 2]
    assert not list(out.glob("_tmp-*"))


def test_shard_sink_rejects_bad_protocol(registered, tmp_path):
    df = _docs(registered).limit(1)
    with pytest.raises(Exception, match="unsupported commit-protocol"):
        df.write.format("jsonl-shards").option("path", str(tmp_path)).option(
            "commit-protocol", "teleport"
        ).mode("overwrite").save()


def test_shard_sink_streaming_put_protocol_idempotent_no_rename(
    tmp_path, monkeypatch
):
    """VERDICT r10 item 6: streaming parity for commit-protocol=put.
    Unit-level (no Spark): drive JsonlShardStreamWriter directly with
    os.replace/os.rename rigged to raise — two batches commit through the
    object-store path, then batch 1 REPLAYS (checkpoint recovery) and must
    land on the SAME final keys with the manifest entry REPLACED, never
    duplicated. Proves the streaming writer shares the rename-free
    publication plumbing, not just the option parsing."""
    import pyarrow as pa

    from dblp_to_csv_spark.sources import jsonl_shard_sink as mod

    out = tmp_path / "stream_store"
    w = mod.JsonlShardStreamWriter(
        {"path": str(out), "commit-protocol": "put"}, overwrite=False
    )

    def no_rename(*a, **k):
        raise AssertionError("rename is not available on this store")

    monkeypatch.setattr(mod.os, "replace", no_rename)
    monkeypatch.setattr(mod.os, "rename", no_rename)

    def commit_batch(batch_id, values):
        batch = pa.RecordBatch.from_pylist([{"a": v} for v in values])
        w.commit([w.write(iter([batch]))], batch_id)

    commit_batch(0, [1, 2])
    commit_batch(1, [3])
    commit_batch(1, [3])  # replay after checkpoint recovery

    manifest = json.load(open(out / MANIFEST_NAME))
    assert manifest["format"] == "jsonl-shards-stream/v1"
    assert set(manifest["batches"]) == {"0", "1"}
    assert manifest["n_rows"] == 3  # replay replaced, not appended
    names = sorted(os.path.basename(p) for p in out.glob("batch-*"))
    assert names == [
        "batch-000000-shard-00000.jsonl",
        "batch-000001-shard-00000.jsonl",
    ]
    lines = open(out / "batch-000001-shard-00000.jsonl").read().splitlines()
    assert [json.loads(l)["a"] for l in lines] == [3]
    assert not list(out.glob("_tmp-*"))  # orphan sweep works without rename


def test_shard_sink_streaming_put_protocol_end_to_end(registered, tmp_path):
    """The same put plumbing under a real availableNow stream: dataset
    identical to rename mode, no rename-temp residue."""
    src = tmp_path / "src_put"
    src.mkdir()
    docs = _docs(registered)
    docs.limit(6).toPandas().to_parquet(src / "a.parquet")
    out = str(tmp_path / "stream_put_out")
    os.makedirs(out, exist_ok=True)
    q = (
        registered.readStream.schema(docs.schema)
        .parquet(str(src))
        .writeStream.format("jsonl-shards")
        .option("path", out)
        .option("commit-protocol", "put")
        .option("checkpointLocation", str(tmp_path / "ckpt_put"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["n_rows"] == 6
    assert not glob.glob(os.path.join(out, "_tmp-*"))
    back = read_jsonl_documents(registered, out, quarantine_corrupt=False)
    assert back.count() == 6
