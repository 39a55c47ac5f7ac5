"""Tie-down rounding convention (functions/rounding.py; ROADMAP 23, r9
verdict item 8): exact dyadic half-boundaries — the ONLY values where
Spark's BigDecimal rounding and DuckDB's scaled-double rounding can land
one step apart — round DOWN identically on both engines, zeros stay +0.0,
and non-tie values are untouched by the nudge."""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import (
    ROUND_TIES_DOWN_SQL,
    round_ties_down,
)

# (value, scale, expected): each value is EXACTLY representable in binary
# and sits exactly on a half-boundary of the scale — the hazard class.
TIES = [
    (0.0703125, 6, 0.070312),  # 9/128  -> 70312.5 at 6 dp
    (0.0078125, 6, 0.007812),  # 1/128
    (0.5, 0, 0.0),  # the simplest tie
    (2.25, 1, 2.2),  # 9/4 at 1 dp
    (0.015625, 5, 0.01562),  # 1/64 at 5 dp
]

NON_TIES = [(0.07031251, 6), (1.0 / 3.0, 6), (123.456789, 6), (0.1, 6)]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_round(spark, x: float, d: int) -> float:
    return (
        spark.range(1)
        .select(round_ties_down(F.lit(x), d).alias("r"))
        .collect()[0]["r"]
    )


def _duck_round(duck, x: float, d: int) -> float:
    sql = ROUND_TIES_DOWN_SQL.format(expr=repr(x), scale=d)
    return duck.execute(f"SELECT {sql}").fetchone()[0]


@pytest.mark.parametrize("x,d,want", TIES)
def test_exact_ties_round_down_on_both_engines(spark, duck, x, d, want):
    s, k = _spark_round(spark, x, d), _duck_round(duck, x, d)
    assert s == k == want


@pytest.mark.parametrize("x,d", NON_TIES)
def test_non_ties_unchanged_by_nudge(spark, duck, x, d):
    plain = round(x, d)
    s, k = _spark_round(spark, x, d), _duck_round(duck, x, d)
    assert s == k
    assert math.isclose(s, plain, rel_tol=0, abs_tol=10.0**-d / 2)


def test_zero_normalizes_to_positive_zero(spark, duck):
    s, k = _spark_round(spark, 0.0, 6), _duck_round(duck, 0.0, 6)
    assert math.copysign(1.0, s) == 1.0, "Spark produced -0.0"
    assert math.copysign(1.0, k) == 1.0, "DuckDB produced -0.0"


def test_dyadic_jaccard_end_to_end(spark, duck, tmp_path):
    """A constructed corpus whose exact Jaccard is 9/128 — a true dyadic
    half-boundary at 6 dp: the registered query and its oracle must agree
    (this is the input class that motivated the convention)."""
    import pandas as pd

    from dblp_to_csv_spark.registry import all_queries

    # doc pair sharing exactly 9 of 128 distinct shingles: |A|=67, |B|=70,
    # inter=9 -> union = 67+70-9 = 128. Build from distinct 3-shingles:
    # a run of n+2 distinct words yields n distinct shingles.
    def doc(words):
        return " ".join(words)

    shared = [f"s{i}" for i in range(11)]  # 11 words -> 9 shingles
    a_only = [f"a{i}" for i in range(58)]
    b_only = [f"b{i}" for i in range(61)]
    texts = {
        1: doc(shared + a_only),  # 9 + (69-11... ) distinct shingles
        2: doc(shared + b_only),
    }
    # shingle counts: doc1 words = 11+58=69 -> 67 shingles; doc2 = 72 -> 70.
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(texts[k]) for k in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    entry = all_queries()["dedup_ngram_jaccard"]
    got = entry.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(entry.oracle).df()
    # threshold filter drops 9/128 (=0.0703) pairs; compare the RAW pair
    # frame instead via the jac CTE embedded in the oracle
    from dblp_to_csv_spark.operators.dedup import _jaccard_pairs

    raw = _jaccard_pairs(spark, str(tmp_path)).toPandas()
    assert len(raw) == 1
    assert raw.loc[0, "jaccard"] == 0.070312  # tie went DOWN
    jac_sql = entry.oracle.split("SELECT doc_a")[0] + (
        "SELECT doc_a, doc_b, jaccard FROM jac"
    )
    oracle_raw = con.execute(jac_sql).df()
    assert oracle_raw.loc[0, "jaccard"] == 0.070312
    # and the registered (thresholded) query agrees with its oracle
    assert len(got) == len(want) == 0
