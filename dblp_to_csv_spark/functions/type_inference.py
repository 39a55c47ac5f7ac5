"""Type inference: the reference's 6-type lattice over strings.

Re-implements the semantics of the reference's per-value detection ladder
(`get_type`, XMLToCSV.py:246-281) and per-column unification
(`get_high_level_type`, XMLToCSV.py:314-331) — NOT with Catalyst's
TypeCoercion/schema-inference rules, which differ (they accept signed ints and
exponents; the reference does not — SURVEY.md §4.3.1).

Two implementations are provided:

* ``detect_type_py`` — exact reference semantics as a pure Python function
  (including the unicode-digit and leading-zero quirks, SURVEY.md §1.3),
  used by unit tests and available for an exact Pandas-UDF path;
* ``detect_type_column`` — a JVM-side Column expression ladder used in the
  hot path (ETL annotation over billions of values). Matches the Python
  version including unicode digits: integer/float use ``\\p{Nd}`` classes
  (CPython: ``int()``/``float()`` accept exactly Nd digit runs, while
  ``str.isdigit()``-but-not-Nd characters like ``²`` fail ``int()`` and fall
  through to string); date/datetime stay ASCII ``[0-9]`` because BOTH
  ``date.fromisoformat`` and ``strptime`` reject non-ASCII digits.

The DuckDB-oracle twin of the expression ladder lives in
``operators/reference_ops.py`` so the driver verifies engine parity.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

TYPE_ANY = "any"
TYPE_INTEGER = "integer"
TYPE_FLOAT = "float"
TYPE_DATE = "date"
TYPE_DATETIME = "datetime"
TYPE_BOOLEAN = "boolean"
TYPE_STRING = "string"

# Reference regexes (XMLToCSV.py:279-281): \d in Python matches unicode Nd
# digits; the Column ladder below mirrors that with \p{Nd} for integer/float.
_FLOAT_RE = re.compile(r"^\d+\.\d+$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DATETIME_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}(:\d{2})?$")


def detect_type_py(value: str | None) -> str:
    """Per-value type detection with exact reference semantics
    (XMLToCSV.py:246-281): empty→any; unsigned-digits+int()→integer;
    ``\\d+.\\d+``→float; ISO date→date; ``YYYY-MM-DD HH:MM[:SS]``→datetime;
    true/false→boolean; else string. No signs, no exponents, leading zeros
    accepted, arbitrary precision."""
    if value is None or value == "":
        return TYPE_ANY
    if value.isdigit():
        try:
            int(value)
            return TYPE_INTEGER
        except ValueError:
            pass
    if _FLOAT_RE.match(value):
        try:
            float(value)
            return TYPE_FLOAT
        except ValueError:
            pass
    if _DATE_RE.match(value):
        try:
            date.fromisoformat(value)
            return TYPE_DATE
        except ValueError:
            pass
    if _DATETIME_RE.match(value):
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M"):
            try:
                datetime.strptime(value, fmt)
                return TYPE_DATETIME
            except ValueError:
                continue
    if value.lower() in ("true", "false"):
        return TYPE_BOOLEAN
    return TYPE_STRING


def detect_type_column(col: Column | str) -> Column:
    """The detection ladder as a single JVM-side CASE expression — runs inside
    whole-stage codegen, no Python in the loop. Exact twin of
    ``detect_type_py`` including the unicode-digit quirks (module docstring);
    Java regex \\p{Nd} is unicode-aware without any flag."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull() | (c == ""), TYPE_ANY)
        .when(c.rlike(r"^\p{Nd}+$"), TYPE_INTEGER)
        .when(c.rlike(r"^\p{Nd}+\.\p{Nd}+$"), TYPE_FLOAT)
        # try_cast stays inside whole-stage codegen and does real calendar /
        # clock validation (2020-02-30, 25:30 → null), matching both the
        # reference's fromisoformat checks and DuckDB's TRY_CAST; the strict
        # regex gate in front rejects the extra formats cast would accept.
        # (try_to_timestamp(format) was ~1000× slower here — exception-driven
        # interpreted fallback.)
        # year-0000 guard: java.time (and DuckDB) accept proleptic year 0,
        # but the reference's date.fromisoformat/strptime reject it
        # (datetime.MINYEAR == 1) — found by the hypothesis ladder property.
        # substr, not regex lookahead: the DuckDB twin runs on RE2, which
        # has no lookahead, and the two ladders must stay expression-twins.
        .when(
            c.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
            & (c.substr(1, 4) != "0000")
            & c.try_cast("date").isNotNull(),
            TYPE_DATE,
        )
        # hour-24 guard: DuckDB's TRY_CAST follows Postgres in accepting
        # '24:00' as next-day midnight, while both strptime and Spark's
        # try_cast reject it — redundant on the Spark side (try_cast
        # already returns NULL) but kept so the two ladders stay literal
        # expression-twins.
        .when(
            c.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}(:[0-9]{2})?$")
            & (c.substr(1, 4) != "0000")
            & (c.substr(12, 2) != "24")
            & c.try_cast("timestamp").isNotNull(),
            TYPE_DATETIME,
        )
        .when(F.lower(c).isin("true", "false"), TYPE_BOOLEAN)
        .otherwise(TYPE_STRING)
    )


# DuckDB twin of detect_type_column, kept adjacent so the two ladders are
# reviewed together. {col} is substituted with the column expression.
DETECT_TYPE_SQL = """
    CASE
      WHEN {col} IS NULL OR {col} = '' THEN 'any'
      WHEN regexp_matches({col}, '^\\p{{Nd}}+$') THEN 'integer'
      WHEN regexp_matches({col}, '^\\p{{Nd}}+\\.\\p{{Nd}}+$') THEN 'float'
      WHEN regexp_matches({col}, '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$')
           AND substr({col}, 1, 4) <> '0000'
           AND TRY_CAST({col} AS DATE) IS NOT NULL THEN 'date'
      WHEN regexp_matches({col}, '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}} [0-9]{{2}}:[0-9]{{2}}(:[0-9]{{2}})?$')
           AND substr({col}, 1, 4) <> '0000'
           AND substr({col}, 12, 2) <> '24'
           AND TRY_CAST(CASE WHEN length({col}) = 16 THEN {col} || ':00' ELSE {col} END
                        AS TIMESTAMP) IS NOT NULL THEN 'datetime'
      WHEN LOWER({col}) IN ('true', 'false') THEN 'boolean'
      ELSE 'string'
    END
"""


def unify_types(observed: set[str]) -> str:
    """Column-level unification lattice, exact reference semantics
    (XMLToCSV.py:314-331): drop 'any'; empty→string; singleton→itself; any
    'string' member→string; exactly {integer,float}→float; exactly
    {date,datetime}→datetime; anything else→string."""
    types = set(observed) - {TYPE_ANY}
    if not types:
        return TYPE_STRING
    if len(types) == 1:
        return next(iter(types))
    if TYPE_STRING in types:
        return TYPE_STRING
    if types == {TYPE_INTEGER, TYPE_FLOAT}:
        return TYPE_FLOAT
    if types == {TYPE_DATE, TYPE_DATETIME}:
        return TYPE_DATETIME
    return TYPE_STRING


def unify_types_column(types_array: Column) -> Column:
    """The unification lattice over an ``array<string>`` of observed types as
    a JVM-side expression (distributed twin of ``unify_types`` — used when
    unification itself must stay on executors, e.g. per-column over thousands
    of columns)."""
    t = F.array_distinct(F.array_remove(types_array, TYPE_ANY))
    n = F.size(t)
    return (
        F.when(n == 0, TYPE_STRING)
        .when(n == 1, F.element_at(t, 1))
        .when(F.array_contains(t, TYPE_STRING), TYPE_STRING)
        .when((n == 2) & F.array_contains(t, TYPE_INTEGER) & F.array_contains(t, TYPE_FLOAT), TYPE_FLOAT)
        .when((n == 2) & F.array_contains(t, TYPE_DATE) & F.array_contains(t, TYPE_DATETIME), TYPE_DATETIME)
        .otherwise(TYPE_STRING)
    )
