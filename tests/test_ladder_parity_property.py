"""Property-based cross-engine parity: for arbitrary inputs INCLUDING unicode
digits, the pure Python reference ladder (detect_type_py) and the DuckDB CASE
twin (DETECT_TYPE_SQL) agree. The Spark Column ladder's parity with DuckDB is
covered by the type_detect_ladder oracle query; this closes the remaining
pair at property-test breadth (SURVEY.md §5.2.3).

One documented deviation (COVERAGE.md #7): CPython's _strptime accepts
unicode digits in the YEAR field only (its month/day/hour sub-patterns
compile to ASCII alternations), so a datetime-shaped string with non-ASCII
digits can be 'datetime' to the reference but 'string' to the SQL ladders.
The property encodes exactly that exception; a deterministic test pins the
known cases so drift in either direction fails loudly."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.functions.type_inference import (
    DETECT_TYPE_SQL,
    detect_type_py,
)

_LADDER_Q = (
    "SELECT "
    + DETECT_TYPE_SQL.format(col="v")
    + " AS t FROM (SELECT CAST(? AS VARCHAR) AS v)"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)
# unicode digit runs: Arabic-Indic (٠-٩), Extended Arabic-Indic (۰-۹),
# Devanagari (०-९), plus the isdigit-but-not-int superscript ²
unicode_digitish = st.text(
    alphabet="0123456789٠١٢٣٤٥٦٧٨٩۰۱۲۳۴۵۶۷۸۹०१२३४५६७८९²-. :",
    max_size=20,
)
# bias toward the interesting shapes: digit runs, dates, dots, signs
numericish = st.one_of(
    st.from_regex(r"[0-9]{1,20}", fullmatch=True),
    st.from_regex(r"[0-9]{1,5}\.[0-9]{0,5}", fullmatch=True),
    st.from_regex(r"[0-9]{4}-[0-9]{2}-[0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}(:[0-9]{2})?", fullmatch=True),
    st.sampled_from(["true", "FALSE", "True", "", "-1", "+2", "1e9", ".5", "5.", "١٢٣", "٣٤.٥"]),
)


def _expected_sql(value: str) -> str:
    """What the SQL ladders should return, given the reference verdict:
    identical, except the documented strptime-year unicode quirk."""
    got_py = detect_type_py(value)
    if got_py == "datetime" and not value.isascii():
        return "string"
    return got_py


@settings(max_examples=300, deadline=None)
@given(st.one_of(ascii_text, unicode_digitish, numericish))
def test_python_ladder_matches_duckdb(duck, value):
    got_duck = duck.execute(_LADDER_Q, [value]).fetchone()[0]
    assert got_duck == _expected_sql(value), repr(value)


@pytest.mark.parametrize(
    "value,py_verdict,sql_verdict",
    [
        ("١٢٣", "integer", "integer"),  # int() accepts Nd — now matched
        ("12٣", "integer", "integer"),  # mixed ASCII+Nd
        ("۱۲۳", "integer", "integer"),  # Extended Arabic-Indic
        ("²", "string", "string"),  # isdigit but int() rejects (No category)
        ("٣٤.٥", "float", "float"),  # float() accepts Nd
        ("٢٠٢٠-٠١-٠١", "string", "string"),  # fromisoformat is ASCII-only
        ("٢٠٢٠-01-01 12:30", "datetime", "string"),  # the strptime year quirk
        ("2020-01-01 12:3٠", "datetime", "string"),  # trailing-digit quirk
        ("2020-٠١-01 12:30", "string", "string"),  # month field is ASCII-only
        # proleptic year 0: java.time/DuckDB casts accept it, Python's
        # MINYEAR=1 rejects — the ladders carry an explicit substr guard
        # so all three engines agree on 'string' (hypothesis-found, r8)
        ("0000-01-01", "string", "string"),
        ("0000-12-31 23:59:59", "string", "string"),
        ("0001-01-01", "date", "date"),  # first valid proleptic year
        # hour 24: Postgres/DuckDB accept '24:00' as next-day midnight,
        # strptime and Spark's try_cast reject it — the ladders carry an
        # explicit hour guard so all three engines agree (probe-found, r8)
        ("2020-01-01 24:00", "string", "string"),
        ("2020-01-01 24:00:00", "string", "string"),
        ("2020-01-01 23:59", "datetime", "datetime"),
        ("2021-02-29", "string", "string"),  # calendar check: non-leap
        ("2020-02-29", "date", "date"),  # leap day accepted everywhere
    ],
)
def test_documented_datetime_deviation(duck, value, py_verdict, sql_verdict):
    assert detect_type_py(value) == py_verdict
    assert duck.execute(_LADDER_Q, [value]).fetchone()[0] == sql_verdict
