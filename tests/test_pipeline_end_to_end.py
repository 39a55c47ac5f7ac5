"""Capstone composition: the full training-data pipeline as ONE chain —
quality gate → near-dup canonical corpus → sequence packing → deterministic
shard export with manifest. Each stage is an already-verified operator; this
test pins that they COMPOSE (schemas line up, counts reconcile stage to
stage, the manifest the loader reads matches what was written, and a rerun
is byte-deterministic).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.curation import curate_corpus
from dblp_to_csv_spark.operators.pipeline import (
    PACK_BUDGET,
    assign_pack_chunks,
    observed_keep_gate,
)
from dblp_to_csv_spark.plans.export import write_training_shards
from tests.conftest import SF_SMOKE


def _run_pipeline(spark, out_dir: str) -> dict:
    from dblp_to_csv_spark.sources.tables import load_table

    # stage 1: quality gate (with funnel metrics riding the same pass)
    kept, obs = observed_keep_gate(spark, SF_SMOKE)
    kept_ids = kept.select("doc_id")
    # stage 2: near-dup canonical corpus (one MinHash→CC chain); the
    # canonical report carries ids — join back to documents for payloads
    canonical_ids = curate_corpus(spark, SF_SMOKE)["keep_canonical"].select("doc_id")
    corpus = (
        load_table(spark, SF_SMOKE, "documents")
        .join(canonical_ids, "doc_id")
        .join(kept_ids, "doc_id")
        .select("doc_id", "text", "lang")
    ).cache()  # consumed by packing, shard write, and counts below
    # stage 3: pack the CURATED corpus into context windows — the real
    # operator policy (assign_pack_chunks), not a stand-in projection
    packed = assign_pack_chunks(corpus)
    # stage 4: deterministic shard export + manifest
    manifest = write_training_shards(
        corpus, out_dir, id_col="doc_id", n_shards=4, fmt="parquet"
    )
    pack_stats = (
        packed.groupBy("bucket")
        .agg(
            F.countDistinct("chunk_id").alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("chunk_id").alias("min_chunk"),
        )
        .collect()
    )
    out = {
        "metrics": obs.get,
        "n_corpus": corpus.count(),
        "n_packed": packed.count(),
        "pack_stats": pack_stats,
        "manifest": manifest,
    }
    corpus.unpersist()
    return out


def test_full_pipeline_composes_and_reconciles(spark, tmp_path):
    out = str(tmp_path / "shards")
    r = _run_pipeline(spark, out)
    # funnel reconciles: gate output ≥ final corpus (dedup only removes)
    assert r["metrics"]["rows_kept"] >= r["n_corpus"] > 0
    # packing assigned every curated doc exactly once, into a window count
    # bounded by the per-bucket token mass (the concat-chunk invariant)
    assert r["n_packed"] == r["n_corpus"]
    for row in r["pack_stats"]:
        assert row["n_chunks"] <= row["total_tokens"] // PACK_BUDGET + 1
        assert row["min_chunk"] == 0
    # manifest matches the files the loader will read
    assert r["manifest"]["total_rows"] == r["n_corpus"]
    back = spark.read.parquet(out)
    assert back.count() == r["n_corpus"]
    with open(os.path.join(out, "_manifest.json"), encoding="utf-8") as f:
        assert json.load(f) == r["manifest"]
    # every surviving doc passed BOTH gates: unique doc_ids, no nulls
    assert back.select("doc_id").distinct().count() == r["n_corpus"]


def test_full_pipeline_rerun_is_deterministic(spark, tmp_path):
    a = _run_pipeline(spark, str(tmp_path / "a"))
    b = _run_pipeline(spark, str(tmp_path / "b"))
    assert a["manifest"]["shards"] == b["manifest"]["shards"]
    assert a["n_corpus"] == b["n_corpus"]
    pa = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "a")).collect()
    )
    pb = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "b")).collect()
    )
    assert pa == pb
