"""Infinity-landmine sweep (the NaN sweep's IEEE sibling): the 21
oracle-checked events.value readers run against a corpus where `value`
mixes real numbers with +Inf and -Inf and must still match their DuckDB
oracles.

Unlike NaN, ±Inf is an ORDERED, meaningful value — it participates
consistently in comparisons, min/max and interpolation-free order
statistics on both engines — but it shares NaN's two failure modes:
DuckDB's variance aggregates throw outright on infinite input, and
inf − inf / inf·0 arithmetic inside means and interpolations produces
NaN mid-expression. Queries that needed the guard take the FINITE
policy (non-finite measurement ≡ missing), superseding the NaN-only
guard where both sweeps demanded it."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

INF_QUERIES = sorted(
    (n, e)
    for n, e in all_queries().items()
    if e.oracle is not None and "events" in e.oracle and "value" in e.oracle
)


@pytest.fixture(scope="module")
def inf_sf(tmp_path_factory):
    """events = a 400-row slice of real data with every 9th value +Inf and
    every 13th -Inf; other tables ride along as small slices."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("inf_sf")
    for t in TABLES:
        if t == "events":
            continue
        pq.write_table(pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 20),
                       out / f"{t}.parquet")
    tb = pq.read_table(f"{REAL_SF}/events.parquet").slice(0, 400)
    vals = tb.column("value").to_pylist()
    vals = [
        float("inf") if i % 9 == 0 else (float("-inf") if i % 13 == 0 else v)
        for i, v in enumerate(vals)
    ]
    idx = tb.schema.get_field_index("value")
    tb = tb.set_column(idx, tb.schema.field(idx), pa.array(vals, type=tb.schema.field(idx).type))
    pq.write_table(tb, out / "events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(inf_sf):
    con = duck_for(inf_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name,entry", INF_QUERIES, ids=[n for n, _ in INF_QUERIES])
def test_query_survives_inf_values(spark, duck, inf_sf, name, entry):
    got = entry.fn(spark, inf_sf).toPandas()  # the crash gate
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the infinity landmine corpus")
