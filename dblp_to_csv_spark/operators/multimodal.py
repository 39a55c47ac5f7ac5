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


# --------------------------------------------------------------------------
# Frame sampling (video-shaped fan-out), resize (binary→binary), and feature
# extraction (binary→histogram, oracle-checked).
# --------------------------------------------------------------------------
N_FRAMES = 4
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes long, "
    "frame_checksum string"
)


def sample_frames(df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame-sampling plumbing (video path): each payload fans out to
    ``n_frames`` evenly-spaced byte windows — the 1→N row shape real frame
    extraction has (swap the window slicing for ffmpeg keyframe decode and
    nothing else changes). Narrow mapInPandas: fan-out happens inside the
    task, no shuffle; output size is bounded by n_frames × input rows."""
    import hashlib

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if not payload:
                    # zero frames for an empty payload — matches the oracle's
                    # LEAST(n, length)=0 semantics; raising would fail the
                    # whole job over one degenerate row
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    chunk = payload[i * step : i * step + step]
                    rows.append(
                        (doc_id, i, i * step, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_offset", "frame_bytes", "frame_checksum",
                ],
            )

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    tags=("multimodal", "pandas-udf"),
    oracle=f"""
        WITH d AS (
            SELECT doc_id, text,
                   GREATEST(length(text) // {N_FRAMES}, 1) AS step,
                   LEAST({N_FRAMES}, length(text)) AS nf
            FROM documents
        )
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * step AS BIGINT) AS frame_offset,
               CAST(length(substr(text, CAST(i * step + 1 AS INT), CAST(step AS INT)))
                    AS BIGINT) AS frame_bytes,
               md5(substr(text, CAST(i * step + 1 AS INT), CAST(step AS INT)))
                   AS frame_checksum
        FROM d, unnest(range(0, nf)) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampling fan-out end-to-end, oracle-verified: ASCII payloads
    make the byte windows equal DuckDB's substr windows, so the checksums of
    every sampled frame hash-match — the mapInPandas 1→N plumbing itself is
    what the oracle checks."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs).select("doc_id", "payload"))


RESIZED_SCHEMA = "doc_id long, payload binary, n_bytes long"


def resize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing (image path): binary→binary mapInPandas transform —
    the stub 'resize' truncates/pads payloads to ``target_bytes`` (a real one
    would be PIL thumbnail + re-encode; the binary-in/binary-out batch shape
    is identical). Library function, not a registered query: binary outputs
    are for downstream sinks, not the driver's scalar canonicalizer."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: bytes(p)[:target_bytes].ljust(target_bytes, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": resized.map(len),
                }
            )

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


N_FEATURE_BINS = 32  # 256 byte values / 8 per bin


@register(
    "multimodal_feature_extract",
    tags=("multimodal", "pandas-udf"),
    oracle=f"""
        SELECT doc_id,
               CAST(ascii(substr(text, CAST(i AS INT), 1)) // 8 AS INT) AS bin,
               COUNT(*) AS n_bytes
        FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
        GROUP BY 1, 2
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads — a REAL extractor (32-bin
    byte-value histogram via numpy over Arrow batches), not a stub, so the
    whole mapInPandas path is oracle-verified: documents.text is pure ASCII,
    making byte histograms equal DuckDB's per-character code-point histogram.
    Output is exploded (doc_id, bin, n_bytes) — integer-only, so no
    float-rounding divergence is possible. A real pipeline would emit the
    dense vector column instead; the plumbing is identical."""
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr >> 3, minlength=N_FEATURE_BINS)
                for b in np.nonzero(hist)[0]:
                    rows.append((doc_id, int(b), int(hist[b])))
            yield pd.DataFrame(rows, columns=["doc_id", "bin", "n_bytes"])

    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).select("doc_id", "payload").mapInPandas(
        feature_batches, "doc_id long, bin int, n_bytes long"
    )
