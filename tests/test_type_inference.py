"""Unit + property tests for the type ladder (T1) and lattice (A4) —
SURVEY.md §5.2.3. The [verified] quirk cases from SURVEY.md §1.3 are asserted
exactly."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from dblp_to_csv_spark.functions.type_inference import (
    TYPE_ANY,
    TYPE_BOOLEAN,
    TYPE_DATE,
    TYPE_DATETIME,
    TYPE_FLOAT,
    TYPE_INTEGER,
    TYPE_STRING,
    detect_type_py,
    unify_types,
)

QUIRKS = {
    "": TYPE_ANY,
    "007": TYPE_INTEGER,  # leading zeros accepted
    "42": TYPE_INTEGER,
    "12345678901234567890": TYPE_INTEGER,  # arbitrary precision
    "٠١": TYPE_INTEGER,  # unicode digits accepted by int()
    "²": TYPE_STRING,  # isdigit() true but int() fails
    "-5": TYPE_STRING,  # no sign support
    "+3": TYPE_STRING,
    "3.14": TYPE_FLOAT,
    ".5": TYPE_STRING,
    "5.": TYPE_STRING,
    "1e5": TYPE_STRING,
    "2020-01-01": TYPE_DATE,
    "2020-13-01": TYPE_STRING,  # regex passes, fromisoformat fails
    "2020-1-1": TYPE_STRING,  # strict zero-padded regex
    "2020-01-01 10:30": TYPE_DATETIME,
    "2020-01-01 10:30:45": TYPE_DATETIME,
    "2020-01-01T10:30:45": TYPE_STRING,  # T separator not accepted
    "TRUE": TYPE_BOOLEAN,
    "False": TYPE_BOOLEAN,
    "hello": TYPE_STRING,
    "1-10": TYPE_STRING,
}


def test_detect_type_quirks():
    for value, want in QUIRKS.items():
        assert detect_type_py(value) == want, value


def test_detect_type_none():
    assert detect_type_py(None) == TYPE_ANY


LATTICE_CASES = [
    (set(), TYPE_STRING),
    ({TYPE_ANY}, TYPE_STRING),
    ({TYPE_INTEGER}, TYPE_INTEGER),
    ({TYPE_ANY, TYPE_INTEGER}, TYPE_INTEGER),
    ({TYPE_INTEGER, TYPE_FLOAT}, TYPE_FLOAT),
    ({TYPE_DATE, TYPE_DATETIME}, TYPE_DATETIME),
    ({TYPE_INTEGER, TYPE_BOOLEAN}, TYPE_STRING),
    ({TYPE_INTEGER, TYPE_DATE}, TYPE_STRING),
    ({TYPE_INTEGER, TYPE_FLOAT, TYPE_DATE}, TYPE_STRING),
    ({TYPE_STRING, TYPE_INTEGER}, TYPE_STRING),
]


def test_unify_lattice_cases():
    for types, want in LATTICE_CASES:
        assert unify_types(types) == want, types


ALL_TYPES = [
    TYPE_ANY,
    TYPE_INTEGER,
    TYPE_FLOAT,
    TYPE_DATE,
    TYPE_DATETIME,
    TYPE_BOOLEAN,
    TYPE_STRING,
]


@given(st.sets(st.sampled_from(ALL_TYPES)))
def test_unify_idempotent_and_any_transparent(types):
    unified = unify_types(types)
    assert unified in ALL_TYPES and unified != TYPE_ANY
    # folding the result back in is a no-op (idempotence)
    assert unify_types(types | {unified}) == unified
    # 'any' never changes the outcome
    assert unify_types(types | {TYPE_ANY}) == unified


@given(st.sets(st.sampled_from(ALL_TYPES)), st.sets(st.sampled_from(ALL_TYPES)))
def test_unify_merge_consistency(a, b):
    # unify(a ∪ b) == unify({unify(a)} ∪ b) unless unify(a) collapses detail
    # the lattice needs — the reference folds the *full set*, so we only
    # assert the weaker, true property: union is order-insensitive.
    assert unify_types(a | b) == unify_types(b | a)
