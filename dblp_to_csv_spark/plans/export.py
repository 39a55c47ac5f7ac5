"""Training-data export: deterministic sharding of a curated corpus into
size-bounded files plus a manifest — the hand-off artifact a training job
consumes (each data-loader worker claims whole shards; shard assignment must
be stable across re-runs so resumed exports and incremental re-materializations
agree).

Shard assignment is a pure function of the id (md5-bucket, like every
sampling decision in this engine — see operators/pipeline.py), NOT
round-robin or rand(): a document lands in the same shard on every run,
every engine, every retry. ``partitionBy("shard")`` writes each shard as its
own directory in ONE pass (no per-shard loop, no repartition storm);
`maxRecordsPerFile` bounds the file size inside a shard.

At 100 TB you raise ``n_shards`` so each shard stays loader-sized; the write
remains a single job whose only movement is the hash-partition shuffle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars of the
    id, mod n_shards — stable across runs/engines (the same construction the
    sampling operators use)."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Shard ``df`` deterministically and write one directory per shard in a
    single pass; returns (and writes) a manifest dict with per-shard row
    counts — the artifact a loader uses to plan epochs without listing
    files. ``fmt`` is ``parquet`` (training default) or ``json`` (JSONL
    interchange)."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet or json, got {fmt!r}")
    sharded = with_shard(df, id_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("shard")
        .format(fmt)
        .save(out_dir)
    )
    # manifest from the written data (read back = what the loader will see)
    spark = df.sparkSession
    try:
        written = spark.read.format(fmt).load(out_dir)
        counts = {
            int(r["shard"]): int(r["n"])
            for r in written.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
    except Exception as e:
        # a zero-row input writes no data files at all (partitionBy of an
        # empty frame) — that's a legitimate all-zero manifest, not an error
        if "UNABLE_TO_INFER_SCHEMA" not in str(e) and "Unable to infer schema" not in str(e):
            raise
        counts = {}
    manifest = {
        "format": fmt,
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": sum(counts.values()),
        "shards": {str(k): counts.get(k, 0) for k in range(n_shards)},
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
