"""Tiny-corpus sweep: EVERY registered query runs against a 3-rows-per-
table slice of the real driver data and must match its oracle. The
complement of the empty-corpus sweep: 3 rows reach the edges empty input
cannot — single-sample variances (NULL), NaN-vs-NULL in corr/regression
fits, windows over one row, all-zero Poisson resamples, dangling foreign
keys (the slice breaks referential integrity on purpose). First run
caught bootstrap_mean_ci throwing ANSI DIVIDE_BY_ZERO on an all-zero-
weight resample where the oracle returned NULL."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

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
    con = duck_for(tiny_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name,entry", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_query_survives_tiny_corpus(spark, duck, tiny_sf, name, entry):
    got = entry.fn(spark, tiny_sf).toPandas()  # the crash gate
    if entry.oracle is None:
        return
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "a 3-row corpus")
