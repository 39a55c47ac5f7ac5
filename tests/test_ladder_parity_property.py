"""Property-based cross-engine parity: for arbitrary ASCII inputs, the pure
Python reference ladder (detect_type_py), and the DuckDB CASE twin
(DETECT_TYPE_SQL) agree. The Spark Column ladder's parity with DuckDB is
covered by the type_detect_ladder oracle query; this closes the remaining
pair at property-test breadth (SURVEY.md §5.2.3).

Scope: ASCII only — the documented deviation is non-ASCII digits (the
reference's int() accepts them, the SQL ladders do not; COVERAGE.md
deviations #6)."""

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
# bias toward the interesting shapes: digit runs, dates, dots, signs
numericish = st.one_of(
    st.from_regex(r"[0-9]{1,20}", fullmatch=True),
    st.from_regex(r"[0-9]{1,5}\.[0-9]{0,5}", fullmatch=True),
    st.from_regex(r"[0-9]{4}-[0-9]{2}-[0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}(:[0-9]{2})?", fullmatch=True),
    st.sampled_from(["true", "FALSE", "True", "", "-1", "+2", "1e9", ".5", "5."]),
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(ascii_text, numericish))
def test_python_ladder_matches_duckdb(duck, value):
    got_py = detect_type_py(value)
    got_duck = duck.execute(_LADDER_Q, [value]).fetchone()[0]
    assert got_py == got_duck, repr(value)
