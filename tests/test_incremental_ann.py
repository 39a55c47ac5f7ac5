"""Streaming incremental ANN (operators/incremental.py, r13 — VERDICT r12
item 7): the persistent-index pattern composed with the IVF coarse
quantizer. Stateful I/O — pytest-gated, no DuckDB oracle by design
(COVERAGE.md exception register)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.incremental import (
    IVF_RETRAIN_GROWTH,
    ivf_index_append,
    ivf_index_probe,
    ivf_index_train,
)
from tests.conftest import SF_SMOKE


def _emb(spark, sf_dir=SF_SMOKE):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        )
        .distinct()
    )


def test_probe_finds_exact_duplicate(spark, tmp_path):
    """A query identical to an indexed vector must come back as its own
    top-1 at cos_sim 1.0 — the nearest-centroid assignment puts identical
    vectors in the same cell, so single-cell probing already recovers it."""
    idx = str(tmp_path / "ann")
    emb = _emb(spark)
    ivf_index_train(spark, emb, idx, k=8)
    probe_src = emb.filter(F.col("vec_id") < 4)
    queries = probe_src.select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "emb"
    )
    top = ivf_index_probe(spark, queries, idx, top_k=3).collect()
    best = {r["query_id"]: r for r in top if r["rank"] == 1}
    for qid in (10_000, 10_001, 10_002, 10_003):
        assert best[qid]["neighbor_id"] == qid - 10_000
        assert best[qid]["cos_sim"] == 1.0


def test_probe_is_deterministic_and_excludes_self(spark, tmp_path):
    idx = str(tmp_path / "ann")
    emb = _emb(spark)
    ivf_index_train(spark, emb, idx, k=8)
    queries = emb.filter(F.col("vec_id") < 8)
    a = sorted(map(tuple, ivf_index_probe(spark, queries, idx).collect()))
    b = sorted(map(tuple, ivf_index_probe(spark, queries, idx).collect()))
    assert a == b and len(a) > 0
    assert all(q != n for q, n, _, _ in a), "self-match leaked into top-k"


def test_probe_plan_prunes_store_partitions(spark, tmp_path):
    """The store scan must carry PartitionFilters on cell — probe cost
    proportional to the probed cells, not the index."""
    idx = str(tmp_path / "ann")
    ivf_index_train(spark, _emb(spark), idx, k=8)
    plan = (
        spark.read.parquet(f"{idx}/vectors")
        .filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:500]


def test_append_probes_history_and_declared_retrain_trigger(spark, tmp_path):
    """Continuous ingest: appended vectors are probe-visible immediately
    (under the OLD centroids — no implicit re-cluster), and the retrain
    signal fires exactly when the store crosses IVF_RETRAIN_GROWTH x the
    trained size."""
    idx = str(tmp_path / "ann")
    emb = _emb(spark)
    history = emb.filter(F.col("vec_id") < 300)
    ivf_index_train(spark, history, idx, k=8)
    n_trained = spark.read.parquet(f"{idx}/meta").first()["n_trained"]
    assert n_trained == 300

    # small append: below the growth trigger, but immediately probeable
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    assert ivf_index_append(spark, b1, idx) is False
    q = emb.filter(F.col("vec_id") == 320).select(
        F.lit(77_000).alias("vec_id"), "emb"
    )
    top1 = [r for r in ivf_index_probe(spark, q, idx, top_k=1).collect()]
    assert top1[0]["neighbor_id"] == 320 and top1[0]["cos_sim"] == 1.0

    # crossing 2x the trained size flips the declared trigger
    b2 = emb.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 500))
    shifted = b2.select((F.col("vec_id") + 1_000).alias("vec_id"), "emb")
    b3 = b2.select((F.col("vec_id") + 2_000).alias("vec_id"), "emb")
    assert ivf_index_append(spark, b2, idx) is False  # 500 < 600
    assert ivf_index_append(spark, shifted, idx) is True  # 650 >= 600
    # retraining resets the trigger baseline
    store = spark.read.parquet(f"{idx}/vectors").select("vec_id", "emb")
    ivf_index_train(spark, store, idx)
    assert spark.read.parquet(f"{idx}/meta").first()["n_trained"] == 650
    assert ivf_index_append(spark, b3, idx) is False
    assert IVF_RETRAIN_GROWTH == 2.0  # the documented amortized-rebuild rule


def test_streaming_foreachbatch_incremental_ann(spark, tmp_path):
    """The production composition: an embedding STREAM probes each
    microbatch against the persistent IVF index via foreachBatch (neighbors
    come only from vectors the stream already ingested), then appends
    itself — the similarity family's continuous-ingest shape."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "ann")
    hits = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")

    emb_rows = {
        r["vec_id"]: [float(x) for x in r["emb"]]
        for r in _emb(spark).filter(F.col("vec_id") < 40).collect()
    }
    ivf_index_train(
        spark,
        _emb(spark).filter(F.col("vec_id") < 20),
        idx,
        k=4,
    )

    def land(name, ids, shift):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"vec_id": i + shift, "emb": emb_rows[i]})
                for i in ids
            )
        )

    def handle(batch_df, batch_id):
        ivf_index_probe(spark, batch_df, idx, top_k=1).write.mode(
            "append"
        ).parquet(hits)
        ivf_index_append(spark, batch_df, idx)

    def run_once():
        q = (
            spark.readStream.schema("vec_id long, emb array<double>")
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: duplicates of HISTORY vectors 3 and 7 under shifted ids
    land("b1.json", [3, 7], shift=500)
    run_once()
    got = {r["query_id"]: r for r in spark.read.parquet(hits).collect()}
    assert got[503]["neighbor_id"] == 3 and got[503]["cos_sim"] == 1.0
    assert got[507]["neighbor_id"] == 7 and got[507]["cos_sim"] == 1.0

    # batch 2: a duplicate of BATCH 1's vector — history the stream built
    land("b2.json", [3], shift=600)
    run_once()
    got = {r["query_id"]: r for r in spark.read.parquet(hits).collect()}
    # vec 603 == vec 503 == vec 3: top-1 ties at cos 1.0, id-ascending
    # tie-break picks the oldest copy deterministically
    assert got[603]["cos_sim"] == 1.0 and got[603]["neighbor_id"] == 3
