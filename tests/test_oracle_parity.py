"""Driver-harness mimic: run every registered query on Spark and its DuckDB
oracle twin side-by-side at sf0.01 and compare row count, column names, and
(order-insensitively) values — the same gate CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.conftest import SF_CORRECTNESS

ORACLE_QUERIES = [(n, e) for n, e in sorted(all_queries().items()) if e.oracle]
NO_ORACLE = [(n, e) for n, e in sorted(all_queries().items()) if not e.oracle]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows — makes two
    result sets comparable the way the driver's order-insensitive hash does."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        else:
            df[c] = s.astype("string")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name,entry", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_query_matches_oracle(spark, duck, name, entry):
    got = _canon(entry.fn(spark, SF_CORRECTNESS).toPandas())
    want = _canon(duck.execute(entry.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a, b = got[c].to_numpy(), want[c].to_numpy()
            # Signed-zero-strict: the driver's value hash distinguishes -0.0
            # from +0.0 (the r4 stats_agg_lineitem mismatch), so == alone
            # (which says -0.0 == 0.0) would under-report here.
            mism = [
                (x, y)
                for x, y in zip(a, b)
                if not (
                    (x == y and math.copysign(1.0, x) == math.copysign(1.0, y))
                    or (math.isnan(x) and math.isnan(y))
                )
            ]
            assert not mism, f"{name}.{c}: {len(mism)} float mismatches, first: {mism[:3]}"
        else:
            diff = got[c].compare(want[c])
            assert diff.empty, f"{name}.{c}: value mismatch\n{diff.head()}"


@pytest.mark.parametrize("name,entry", NO_ORACLE, ids=[n for n, _ in NO_ORACLE])
def test_query_without_oracle_runs(spark, name, entry):
    df = entry.fn(spark, SF_CORRECTNESS)
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name,entry", sorted(all_queries().items()), ids=sorted(all_queries())
)
def test_query_schema_is_flat(spark, name, entry):
    """The driver's pandas canonicalizer dies on array/map cells (unhashable
    list) and can't hash binary payloads stably — every registered query must
    emit a flat scalar schema (serialize arrays with array_join, '|')."""
    df = entry.fn(spark, SF_CORRECTNESS)
    hostile = [
        (c, t)
        for c, t in df.dtypes
        if any(k in t for k in ("array", "map", "struct", "binary"))
    ]
    assert not hostile, f"{name}: non-scalar output columns {hostile}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()).issubset(set(mod.queries()))
