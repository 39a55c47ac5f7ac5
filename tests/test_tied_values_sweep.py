"""Tied-values sweep: every registered query vs its oracle on a corpus of
three rows per table with UNIQUE primary keys but IDENTICAL values in
every other column — every ordering tie fires at once. This is the gate
for nondeterministic tie-breaks (windows/argmax whose ordering is not a
total order pick DIFFERENT rows on each engine) and zero-variance ANSI
crashes. First run caught bare max_by/arg_max disagreeing between engines
in argmax_order_per_customer and Spark 4 ANSI's native corr throwing
DIVIDE_BY_ZERO on a zero-variance group in stats_agg_lineitem."""

from __future__ import annotations

import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

ALL_QUERIES = sorted(all_queries().items())

# one primary-key column per table, incremented to keep keys unique
_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def tied_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("tied_sf")
    for t in TABLES:
        one = pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 1).to_pandas()
        df = pd.concat([one] * 3, ignore_index=True)
        k = _KEYS[t]
        base = df[k].iloc[0]
        df[k] = [base, base + 1, base + 2]
        df.to_parquet(out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(tied_sf):
    con = duck_for(tied_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name,entry", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_query_deterministic_under_ties(spark, duck, tied_sf, name, entry):
    got = entry.fn(spark, tied_sf).toPandas()  # the crash gate
    if entry.oracle is None:
        return
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "all-tied values")
