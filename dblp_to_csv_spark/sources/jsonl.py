"""JSONL corpus I/O (SURVEY.md §2.4 context): the interchange format LLM
training corpora actually ship in — one JSON object per line, gzip-friendly,
append-only. The reference reads XML only; a pipeline engine needs the
corpus formats on both ends:

* ``read_jsonl_documents`` — schema-EXPLICIT ``spark.read.json``: no
  inference pass (the same cost/correctness argument as the DTD-derived XML
  schemas — inference is a full extra corpus read, and a field absent from
  the sampled lines would be silently dropped), PERMISSIVE mode with a
  ``_corrupt_record`` column so malformed lines are quarantined, not lost.
* ``write_jsonl_documents`` — line-delimited export of any documents-shaped
  frame.
* ``write_training_shards`` (plans/export.py builds on this) — see there.

At 100 TB: JSON text scans are splittable (newline-framed) and parallelize
like any text source; gzip members are one task each — prefer zstd-framed
or uncompressed JSONL for ingest, parquet for everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_jsonl_documents(
    spark: SparkSession, path: str, quarantine_corrupt: bool = True
) -> DataFrame:
    """Read a documents-shaped JSONL corpus with the explicit schema (no
    inference pass). With ``quarantine_corrupt``, malformed lines surface in
    ``_corrupt_record`` instead of failing the read or vanishing — the
    caller splits them off with ``.filter("_corrupt_record IS NULL")``.

    Spark caveat: a query whose referenced columns are ONLY the corrupt
    column (e.g. ``.filter(corrupt.isNotNull()).count()``) is rejected on a
    raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — select at least one
    data column alongside it, or land the frame to parquet first."""
    schema = DOCUMENTS_SCHEMA
    if quarantine_corrupt:
        schema = T.StructType(
            [*DOCUMENTS_SCHEMA.fields, T.StructField("_corrupt_record", T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl_documents(df: DataFrame, path: str) -> None:
    """Line-delimited JSON export (one object per line, Spark's json sink)."""
    df.write.mode("overwrite").json(path)
