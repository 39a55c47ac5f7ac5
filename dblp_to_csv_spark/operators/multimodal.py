"""Multimodal-column plumbing (SURVEY.md §2.4): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions via mapInPandas.

The container has no image/audio libraries, so the decode step is a STUB — a
clearly-marked deterministic fake behind the same mapInPandas plumbing a real
decoder would use (swap ``_fake_decode`` for PIL/ffmpeg and nothing else
changes: schema, batching, partitioning are the real thing). The test data
has no binary table either, so payloads are synthesized from documents.text
via encode() — an opaque byte column as far as the plan is concerned.

Scale notes: payload columns ride in parquet binary columns; decode is a
narrow mapInPandas (no shuffle), so it scales with input splits;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory for fat rows,
and Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
bounds per-batch memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, ok boolean"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct — the ingest
    shape for multimodal rows: (key, payload binary, meta struct)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.md5(F.col("text")).alias("checksum"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB decoder. A real implementation would be e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload)); return img.format, *img.size

    No imaging library ships in this environment, so derive deterministic
    fake dimensions from the payload bytes. Raise NotImplementedError for
    payloads a real decoder would reject (empty)."""
    if not payload:
        raise NotImplementedError("decode of empty payload (no real decoder available)")
    return "FAKE", (payload[0] % 64) + 1, (payload[-1] % 64) + 1


def decode_payloads(df: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas: batches stream through Python
    without materializing a partition, the real-decoder plumbing."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                }
            )
            decoded = pdf["payload"].map(_fake_decode)
            out["format"] = decoded.map(lambda t: t[0])
            out["width"] = decoded.map(lambda t: t[1]).astype("int32")
            out["height"] = decoded.map(lambda t: t[2]).astype("int32")
            out["ok"] = True
            yield out

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


@register(
    "multimodal_metadata",
    tags=("multimodal", "scalar"),
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               'text/plain' AS mime
        FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload column — the JVM-side
    part of the multimodal path (byte length, checksum, mime tag)."""
    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
    )


@register(
    "multimodal_decode_stub",
    tags=("multimodal", "pandas-udf"),
    oracle=None,  # decoder is a stub; plumbing is tested, output is fake
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path end-to-end (stub decoder): binary column →
    Arrow batches → Python → typed decoded frame."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_payloads(with_binary_payload(docs))
