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


def input_bytes(df: DataFrame) -> int:
    """Total bytes of the files backing ``df`` (file:-scheme URIs resolved
    via os.stat). Returns a huge sentinel when nothing resolves OR when ANY
    file fails to resolve (foreign scheme, encoded path, stat error):
    a partially-resolved total would silently UNDERCOUNT — e.g. an
    object-store corpus with one local sidecar file — and route a huge
    input to a scale-unsafe branch, so unknown means unknown."""
    total = 0
    try:
        files = df.inputFiles()
    except Exception:
        return 1 << 62
    if not files:
        return 1 << 62
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        if uri.startswith("file:") and not uri.startswith("file://"):
            path = uri[5:]
        try:
            total += os.path.getsize(path)
        except OSError:
            return 1 << 62
    return total


# Scan fan-out gate (optimization guide §2.5, "input skew: one huge
# unsplittable file — repartition immediately after the read"): the driver's
# sf tables are single-FILE, single-ROW-GROUP parquet, so a parquet scan
# resolves to one non-empty task no matter the core count (byte-range splits
# assign a row group to the task holding its midpoint), and the first stage
# of every consumer — tokenize, md5, explode, pair fan-out — runs serial.
# Below the gate the scan is hash-repartitioned to the session default
# parallelism on caller-named key columns (deterministic row→partition under
# task retries, per §2.5's rand()-repartition warning; the keys must spread —
# a unique id is ideal). Above the gate the natural split count already
# covers the cluster and the extra exchange would only add a corpus shuffle,
# so at 100 TB the gate never fires. 256 MiB ≈ 2 default split sizes: past
# that the scan has enough genuine splits to keep a stage busy.
#
# ONLY apply this on paths whose downstream aggregates are ORDER-EXACT
# (string/integer min/max/count/distinct, md5 keys, collect_set consumed as a
# set): a floating-point SUM/AVG's partial-combine tree changes with the
# partitioning, and 6-dp rounding does not absorb every reassociation — the
# fan-out must never be able to move a declared query's hash.
SMALL_SCAN_FANOUT_BYTES = 256 << 20


def fan_out_small(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a small scan to ``defaultParallelism`` on ``keys``
    so per-row CPU downstream uses the whole cluster; identity above the
    byte gate (see SMALL_SCAN_FANOUT_BYTES)."""
    if input_bytes(df) > SMALL_SCAN_FANOUT_BYTES:
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism, *keys)
