"""Typed CSV source: read back the engine's own output (K1 CSV + K2 sidecar
header) as a properly-typed DataFrame — completing the round trip so the CSV
tables are first-class inputs, not just sink artifacts.

The sidecar header (`name:type` / `name:type[]`, ';'-separated — reference
format, XMLToCSV.py:284-305) drives the casts:

* integer → LongType (DecimalType(38,0) fallback is unnecessary: values the
  lattice labeled integer but exceeding int64 stay strings in the CELLS —
  the reference never casts values either, SURVEY.md §7.4.2 — so we cast
  with try_cast and keep nulls for overflow, documented),
* float → double, date → date, datetime → timestamp, boolean → boolean,
* `type[]` → split on '|' (the A2 delimiter) then element-wise cast.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SPARK_TYPES = {
    "integer": "long",
    "int": "long",
    "float": "double",
    "date": "date",
    "datetime": "timestamp",
    "boolean": "boolean",
    "string": "string",
}


def parse_annotated_header(header_path: str) -> list[tuple[str, str, bool]]:
    """→ [(column, lattice_type, is_array)] from a sidecar header file."""
    with open(header_path, encoding="utf-8") as f:
        text = f.read().strip()
    out = []
    for part in text.split(";"):
        name, _, typ = part.rpartition(":")
        is_array = typ.endswith("[]")
        if is_array:
            typ = typ[:-2]
        if typ == "ID":  # neo4j dialect: `<element>:ID` is the id column
            name, typ = "id", "integer"
        out.append((name, typ, is_array))
    return out


def _typed(col: Column, typ: str, is_array: bool) -> Column:
    spark_type = _SPARK_TYPES.get(typ, "string")
    if is_array:
        # '' rehydrates to NULL, not an empty array: the writer serializes
        # the all-absent (null) array as '' (flatten.py normalizes empty →
        # null so absence behaves like a missing scalar), so an empty-array
        # rehydration inverted isNotNull/size predicates after a round trip
        # (review r8)
        arr = F.when(col == "", F.lit(None).cast("array<string>")).otherwise(
            F.split(col, r"\|")
        )
        if spark_type == "string":
            return arr
        return F.transform(arr, lambda x: x.try_cast(spark_type))
    if spark_type == "string":
        return col
    return col.try_cast(spark_type)


def infer_csv_types(df: DataFrame, sample_rows: int | None = None) -> dict[str, str]:
    """Run the engine's own ladder+lattice over a string-typed frame: one
    aggregate collecting the observed-type set per column, folded through
    unify_types — the reference's pass-1+annotate semantics applied to any
    CSV (ROADMAP #5: typed reads of NON-annotated outputs)."""
    from dblp_to_csv_spark.functions.type_inference import (
        detect_type_column,
        unify_types,
    )

    sample = df.limit(sample_rows) if sample_rows else df
    row = sample.agg(
        *[F.collect_set(detect_type_column(F.col(c))).alias(c) for c in df.columns]
    ).collect()[0]
    return {c: unify_types(set(row[c] or []) or {"any"}) for c in df.columns}


def read_inferred_csv(spark: SparkSession, csv_path: str, header: bool = True) -> DataFrame:
    """Read a ';'-separated CSV (e.g. the engine's non-annotated output) and
    cast each column per the inferred lattice type."""
    raw = (
        spark.read.option("sep", ";")
        .option("quote", '"')
        .option("escape", '"')
        .option("header", str(header).lower())
        # the sink quotes embedded newlines; without multiLine a quoted
        # newline splits one record across two (review r8). Cost: multiLine
        # files are not split within a file — acceptable for reading back
        # the engine's own sink output (many files per table at scale).
        .option("multiLine", "true")
        .csv(csv_path)
    )
    types = infer_csv_types(raw)
    return raw.select(
        *[_typed(F.coalesce(F.col(c), F.lit("")), types[c], False).alias(c) for c in raw.columns]
    )


def read_annotated_csv(
    spark: SparkSession, csv_path: str, header_path: str | None = None
) -> DataFrame:
    """Read an engine-written table with its sidecar header applied: columns
    named and cast per the annotation. Works on single files and directory
    outputs (the sink's two modes)."""
    if header_path is None:
        path, ext = os.path.splitext(csv_path)
        header_path = f"{path}_header{ext}"
    schema = parse_annotated_header(header_path)
    raw = (
        spark.read.option("sep", ";")
        .option("quote", '"')
        .option("escape", '"')
        .option("header", "false")
        .option("multiLine", "true")  # see read_inferred_csv
        .csv(csv_path)
    )
    if len(raw.columns) != len(schema):
        raise ValueError(
            f"{csv_path}: {len(raw.columns)} columns vs {len(schema)} in header"
        )
    cols = []
    for raw_name, (name, typ, is_array) in zip(raw.columns, schema):
        # empty CSV cells arrive as null; '' and missing are the same thing
        # in the reference's model (restval='', XMLToCSV.py:101)
        c = F.coalesce(F.col(raw_name), F.lit(""))
        cols.append(_typed(c, typ, is_array).alias(name))
    return raw.select(*cols)
