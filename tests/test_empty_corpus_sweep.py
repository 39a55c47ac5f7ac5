"""Universal empty-corpus sweep: EVERY registered query runs against a
zero-row corpus (exact production schemas, derived from the driver
parquet) and must (a) not crash — the ANSI divide-by-zero / sequence(1,0)
/ empty-stack class the advisor mines one query at a time — and (b) agree
with its DuckDB oracle on row count, null masks, and values.

Empty input is where engines disagree loudest: SUM over nothing (NULL vs
0), percentile of nothing, windows over empty partitions, divisions by
zero-valued counts. One parametrized gate retires the whole class."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

ALL_QUERIES = sorted(all_queries().items())


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Zero-row twins of all ten tables, schemas read from the REAL driver
    parquet so type vintage quirks (timestamp units, float32 embeddings)
    carry over exactly."""
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{REAL_SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(empty_sf):
    con = duck_for(empty_sf)
    yield con
    con.close()


# Documented engine divergence (not a bug in either repo query): ANSI SQL
# says the () grouping set of ROLLUP/CUBE/GROUPING SETS aggregates the
# empty input into ONE grand-total row (a global aggregate); DuckDB does,
# Spark's Expand+groupBy implementation yields ZERO rows because every
# expanded grouping carries keys. Irrelevant on any non-empty corpus (the
# driver gate). Pinned exactly so a Spark-side behavior change surfaces.
GRAND_TOTAL_ON_EMPTY_DIVERGES = {
    "rollup_lineitem_status",
    "cube_orders_status_priority",
    "sql_grouping_sets",
}


@pytest.mark.parametrize("name,entry", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_query_survives_empty_corpus(spark, duck, empty_sf, name, entry):
    got = entry.fn(spark, empty_sf).toPandas()  # the crash gate
    if entry.oracle is None:
        return  # rows-only queries: surviving IS the contract
    want = duck.execute(entry.oracle).df()
    if name in GRAND_TOTAL_ON_EMPTY_DIVERGES:
        assert len(got) == 0, f"{name}: Spark now emits rows on empty input"
        assert len(want) == 1, f"{name}: DuckDB grand-total row disappeared"
        return
    assert_matches_oracle(name, got, want, "an empty corpus")
