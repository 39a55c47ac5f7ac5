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
Spark's file-commit protocol v1. ``path`` uses plain ``os`` I/O, so on a
multi-node cluster it must be a shared filesystem mount (NFS/Lustre/
fuse-mounted object store).

The publication step is abstracted behind a commit protocol
(``option("commit-protocol", "rename" | "put")``):

* ``rename`` (default, POSIX): atomic ``os.replace`` per shard, manifest
  written to a temp and renamed into place — the classic v1 committer.
* ``put`` (object-store shape): stores without atomic rename publish a
  shard by finalizing a fresh upload at the FINAL key (emulated here as
  copy-then-delete; a real store uses multipart complete) and publish the
  manifest as one single-shot PUT, which object stores make atomic at
  object granularity. The two-phase structure — data first, manifest
  LAST — is identical, so readers keyed on the manifest still see the
  complete dataset or nothing.
"""

from __future__ import annotations

import gzip
import json
import os
import re
import shutil
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


class RenameCommitProtocol:
    """POSIX publication: atomic rename for shards and the manifest."""

    name = "rename"

    def publish(self, tmp_path: str, final_path: str) -> None:
        os.replace(tmp_path, final_path)

    def write_manifest(self, manifest_path: str, payload: str) -> None:
        tmp = os.path.join(
            os.path.dirname(manifest_path), f"_tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
        os.replace(tmp, manifest_path)


class PutCommitProtocol:
    """Object-store publication: no rename anywhere. A shard is published
    by writing the bytes at the FINAL key (multipart finalize in a real
    store; emulated as copy + delete-temp here) and the manifest by one
    single-shot PUT — atomic at object granularity, which is exactly the
    guarantee object stores do provide. A reader that requires the
    manifest still observes all-or-nothing publication; a reader listing
    raw keys may see a partially-copied shard, the documented object-store
    caveat that the manifest contract exists to absorb."""

    name = "put"

    def publish(self, tmp_path: str, final_path: str) -> None:
        shutil.copyfile(tmp_path, final_path)
        os.remove(tmp_path)

    def write_manifest(self, manifest_path: str, payload: str) -> None:
        with open(manifest_path, "w", encoding="utf-8") as f:
            f.write(payload)


_PROTOCOLS = {p.name: p for p in (RenameCommitProtocol(), PutCommitProtocol())}


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
        proto = (options.get("commit-protocol") or "rename").lower()
        if proto not in _PROTOCOLS:
            raise ValueError(
                f"jsonl-shards: unsupported commit-protocol '{proto}' "
                f"({'|'.join(sorted(_PROTOCOLS))})"
            )
        self.protocol = _PROTOCOLS[proto]

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
        # Numbering continues from what is ON DISK, not just the manifest:
        # a prior commit that crashed after renaming shards but before the
        # manifest landed (or whose manifest was removed) leaves shard-NNNNN
        # files the manifest doesn't account for — numbering from
        # len(prior) alone would os.replace() onto them, silently
        # destroying committed data.
        on_disk = [
            int(mt.group(1))
            for name in os.listdir(self.path)
            if (mt := re.match(r"shard-(\d{5})\.jsonl(\.gz)?$", name))
        ]
        start = max(len(prior), max(on_disk) + 1 if on_disk else 0)
        shards = list(prior)
        for i, m in enumerate(
            (m for m in messages if m is not None), start=start
        ):
            final = self._shard_name(i)
            self.protocol.publish(
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
        # the manifest lands LAST, atomically (rename on POSIX, single-shot
        # PUT on object stores): readers keyed on it see the complete
        # dataset or nothing
        self.protocol.write_manifest(
            os.path.join(self.path, MANIFEST_NAME),
            json.dumps(manifest, indent=2, sort_keys=True),
        )

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
        self.protocol = self._w.protocol

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
            self.protocol.publish(
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
        self.protocol.write_manifest(
            manifest_path, json.dumps(manifest, indent=2, sort_keys=True)
        )
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
