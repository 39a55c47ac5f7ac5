"""Tiny-corpus sweep: EVERY registered query runs against a 3-rows-per-
table slice of the real driver data and must match its oracle. The
complement of the empty-corpus sweep: 3 rows reach the edges empty input
cannot — single-sample variances (NULL), NaN-vs-NULL in corr/regression
fits, windows over one row, all-zero Poisson resamples, dangling foreign
keys (the slice breaks referential integrity on purpose). First run
caught bootstrap_mean_ci throwing ANSI DIVIDE_BY_ZERO on an all-zero-
weight resample where the oracle returned NULL."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES

REAL_SF = "/root/testdata/sf0.001"
ALL_QUERIES = sorted(all_queries().items())


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("tiny_sf")
    for t in TABLES:
        tb = pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 3)
        pq.write_table(tb, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(tiny_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tiny_sf}/{t}.parquet')"
        )
    yield con
    con.close()


def _values_agree(a, b) -> bool:
    # NaN and NULL both mean "undefined here" across the engine boundary
    # (pandas reads SQL NULL as NaN in float columns anyway)
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.mark.parametrize("name,entry", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_query_survives_tiny_corpus(spark, duck, tiny_sf, name, entry):
    got = entry.fn(spark, tiny_sf).toPandas()  # the crash gate
    if entry.oracle is None:
        return
    want = duck.execute(entry.oracle).df()
    assert len(got) == len(want), (
        f"{name}: {len(got)} Spark rows vs {len(want)} oracle rows on a "
        f"3-row corpus"
    )
    assert sorted(got.columns) == sorted(want.columns)
    if len(got) == 0:
        return
    g = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), kind="mergesort", key=lambda s: s.astype(str)
    )
    w = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), kind="mergesort", key=lambda s: s.astype(str)
    )
    for c in g.columns:
        for a, b in zip(g[c].tolist(), w[c].tolist()):
            assert _values_agree(a, b), f"{name}.{c}: {a!r} != {b!r}"
