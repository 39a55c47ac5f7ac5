"""Parquet source for the driver's synthetic tables (TESTDATA.md).

Columnar parquet scans give Catalyst predicate pushdown + column pruning for
free; every query in the engine goes through these loaders so the scan side is
uniform. At 100 TB these would be partitioned tables — the loaders accept any
directory layout spark.read.parquet understands.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation"}


@contextmanager
def temp_conf(spark: SparkSession, key: str, value: str):
    """Set a SQL conf for the duration of the block, then restore/unset it —
    the conf-hygiene idiom for shared sessions (the conf is captured at
    DataFrame creation, so restoring before execution stays correct)."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects unless
        # nanos are surfaced as long. Set on the LIVE session (it is a
        # runtime-settable SQL conf) so externally-created sessions — e.g.
        # the driver harness's — work, then RESTORED so a shared session's
        # later TIMESTAMP(NANOS) reads aren't silently bigint-ified.
        with temp_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
            df = spark.read.parquet(path)
    else:
        df = spark.read.parquet(path)
    # events.ts has shipped in two parquet encodings across driver versions:
    # TIMESTAMP(NANOS) (surfaces as epoch-nanos LongType under nanosAsLong)
    # and TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaces as
    # TIMESTAMP_NTZ). Normalize both to TIMESTAMP so every downstream
    # operator (unix_micros, window, date_trunc) sees one type.
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """ts → TIMESTAMP, whichever parquet encoding the file shipped with —
    ONE definition shared by the batch loader and the events stream reader
    (the two had drifted-prone verbatim copies, review r8):

    * epoch-nanos LongType (TIMESTAMP(NANOS) under nanosAsLong): INTEGER
      division to micros — epoch nanos exceed 2^53, double math would
      corrupt the low digits; same truncation DuckDB applies on read.
    * TIMESTAMP_NTZ (TIMESTAMP(MICROS, isAdjustedToUTC=false)):
      reinterpret in the session timezone; collect() converts back via the
      same zone, so naive wall-clock values round-trip and match DuckDB's
      naive read of the identical file."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
