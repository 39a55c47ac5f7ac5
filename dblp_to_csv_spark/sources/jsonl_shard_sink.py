"""``jsonl-shards`` — a Spark 4 Python Data Source SINK: deterministic,
atomically-published JSONL shard export (the writer half of the extension
surface; the reader half is the ``dblp-xml`` envelope source).

    spark.dataSource.register(JsonlShardDataSource)
    (df.write.format("jsonl-shards")
       .option("path", "/corpus/out")
       .option("compress", "gzip")        # optional
       .mode("overwrite" | "append")
       .save())

Why a custom sink instead of ``df.write.json``: training-data consumers
(dataloader manifests, WebDataset-style shard lists) need (a) stable shard
names derived from the partition id, (b) a machine-readable manifest with
per-shard row counts, and (c) all-or-nothing publication. This sink
implements the classic two-phase commit the built-in file sinks use
internally, but surfaces it through the PUBLIC Python API:

* each task streams its Arrow batches to ``_tmp-<uuid>`` in the target
  directory (task-local, no coordination, retry-safe — an abandoned temp
  from a failed attempt is never referenced and is swept on commit);
* the task's commit message carries (tmp name, final shard name, rows);
* the DRIVER commit renames every temp to ``shard-NNNNN.jsonl[.gz]`` and
  writes ``_MANIFEST.json`` LAST — a reader that requires the manifest sees
  either the complete dataset or nothing;
* abort deletes the temps.

At 100 TB the data plane is unchanged (task-local sequential writes, one
file per partition — exactly how the parquet committer scales); only the
O(#shards) rename/manifest step runs on the driver, the same contract as
Spark's file-commit protocol v1. NOTE: ``path`` uses plain ``os`` I/O, so
on a multi-node cluster it must be a shared filesystem mount (NFS/Lustre/
fuse-mounted object store); a pure object-store deployment would swap the
opener/rename for the store's multipart+finalize API — the two-phase
protocol is unchanged.
"""

from __future__ import annotations

import gzip
import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

MANIFEST_NAME = "_MANIFEST.json"


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_name: str
    rows: int


class JsonlShardWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl-shards: option 'path' is required")
        compress = (options.get("compress") or "none").lower()
        if compress not in ("none", "gzip"):
            raise ValueError(
                f"jsonl-shards: unsupported compress '{compress}' (none|gzip)"
            )
        self.compress = compress
        self.overwrite = overwrite

    # -- executor side ----------------------------------------------------
    def write(self, iterator: Iterator) -> _ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp_name = f"_tmp-{uuid.uuid4().hex}"
        tmp_path = os.path.join(self.path, tmp_name)
        opener = gzip.open if self.compress == "gzip" else open
        rows = 0
        with opener(tmp_path, "wt", encoding="utf-8") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, ensure_ascii=False, default=str))
                    f.write("\n")
                    rows += 1
        return _ShardCommit(tmp_name=tmp_name, rows=rows)

    # -- driver side ------------------------------------------------------
    def _shard_name(self, i: int) -> str:
        ext = ".jsonl.gz" if self.compress == "gzip" else ".jsonl"
        return f"shard-{i:05d}{ext}"

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        # an optimized-empty plan runs 0 tasks, so no task ran makedirs
        os.makedirs(self.path, exist_ok=True)
        keep = {m.tmp_name for m in messages if m is not None}
        prior: list[dict] = []
        if self.overwrite:
            # FILES only: a colocated subdirectory (checkpoint, _temporary)
            # is not ours to delete — and must not abort the commit
            for name in os.listdir(self.path):
                full = os.path.join(self.path, name)
                if (
                    name not in keep
                    and not name.startswith("_tmp-")
                    and os.path.isfile(full)
                ):
                    os.remove(full)
        else:
            # append: keep existing shards, continue the numbering, and
            # carry their manifest entries into the rewritten manifest
            manifest_path = os.path.join(self.path, MANIFEST_NAME)
            if os.path.exists(manifest_path):
                with open(manifest_path, encoding="utf-8") as f:
                    prior = json.load(f).get("shards", [])
        shards = list(prior)
        for i, m in enumerate(
            (m for m in messages if m is not None), start=len(prior)
        ):
            final = self._shard_name(i)
            os.replace(
                os.path.join(self.path, m.tmp_name), os.path.join(self.path, final)
            )
            shards.append({"shard": final, "rows": m.rows})
        # sweep temps abandoned by failed/retried attempts
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("_tmp-") and os.path.isfile(full):
                os.remove(full)
        manifest = {
            "format": "jsonl-shards/v1",
            "compress": self.compress,
            "n_shards": len(shards),
            "n_rows": sum(s["rows"] for s in shards),
            "shards": shards,
        }
        tmp_manifest = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}")
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        # the manifest lands LAST, atomically: readers keyed on it see the
        # complete dataset or nothing
        os.replace(tmp_manifest, os.path.join(self.path, MANIFEST_NAME))

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except FileNotFoundError:
                    pass


class JsonlShardStreamWriter(DataSourceStreamArrowWriter):
    """Streaming twin: each microbatch publishes its own
    ``batch-BBBBBB-shard-NNNNN.jsonl[.gz]`` set and merges the manifest.
    Exactly-once comes from batchId IDEMPOTENCE, the structured-streaming
    sink contract: a batch replayed after checkpoint recovery renames onto
    the SAME final names and replaces its own manifest entry — never
    duplicates rows. Under ``outputMode("complete")`` Spark passes
    ``overwrite=True``: each microbatch is a full snapshot, so commit
    REPLACES all prior batches' shards and manifest entries instead of
    accumulating them."""

    def __init__(self, options: dict, overwrite: bool):
        self._w = JsonlShardWriter(options, overwrite=False)
        self.path = self._w.path
        self.overwrite = overwrite

    # executor side — same temp-file protocol as the batch writer
    def write(self, iterator: Iterator) -> _ShardCommit:
        return self._w.write(iterator)

    def _final_name(self, batch_id: int, i: int) -> str:
        ext = ".jsonl.gz" if self._w.compress == "gzip" else ".jsonl"
        return f"batch-{batch_id:06d}-shard-{i:05d}{ext}"

    def commit(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        os.makedirs(self.path, exist_ok=True)
        entries = []
        for i, m in enumerate(m for m in messages if m is not None):
            final = self._final_name(batchId, i)
            os.replace(
                os.path.join(self.path, m.tmp_name), os.path.join(self.path, final)
            )
            entries.append({"shard": final, "rows": m.rows})
        manifest_path = os.path.join(self.path, MANIFEST_NAME)
        batches: dict = {}
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                batches = json.load(f).get("batches", {})
        if self.overwrite:
            # complete mode: this batch IS the dataset — drop prior shards
            committed = {e["shard"] for e in entries}
            for name in os.listdir(self.path):
                full = os.path.join(self.path, name)
                if (
                    name.startswith("batch-")
                    and name not in committed
                    and os.path.isfile(full)
                ):
                    os.remove(full)
        batches[str(batchId)] = entries  # replay REPLACES the batch entry
        shards = [s for b in sorted(batches, key=int) for s in batches[b]]
        manifest = {
            "format": "jsonl-shards-stream/v1",
            "compress": self._w.compress,
            "n_shards": len(shards),
            "n_rows": sum(s["rows"] for s in shards),
            "batches": batches,
        }
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, manifest_path)
        # sweep temps abandoned by failed/retried task attempts — every
        # committed temp was renamed above, so anything left is an orphan
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("_tmp-") and os.path.isfile(full):
                os.remove(full)

    def abort(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        self._w.abort(messages)


class JsonlShardDataSource(DataSource):
    """Register with ``spark.dataSource.register(JsonlShardDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl-shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlShardStreamWriter:
        return JsonlShardStreamWriter(self.options, overwrite)
