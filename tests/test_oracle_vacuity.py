"""Vacuity gate: every DuckDB oracle must return rows at the driver's
correctness SF.

Round-9 audit motivation: three hash-green queries were proving nothing —
`graph_adamic_adar_capped`'s absolute hub cap fell below the graph's
median degree after a testdata regeneration (0 rows), the unfiltered
customers-without-orders anti-join was empty because the generator gives
every customer an order, and nation-key EXCEPT saturated (all 25 nations
have both customers and suppliers). A driver hash-match on an EMPTY
result set is vacuously green: it verifies nothing about the operator's
join/filter/aggregate semantics. This gate runs every registered oracle
in DuckDB (no Spark — cheap) and fails if any returns zero rows, so a
future testdata regeneration or threshold drift surfaces as a failing
test instead of a judge finding.

Queries that are LEGITIMATELY empty at sf0.01 must be added to EMPTY_OK
with a reason; today there are none.
"""

from __future__ import annotations

import duckdb
import pytest

from dblp_to_csv_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# name -> reason; a query listed here may return 0 rows at sf0.01.
EMPTY_OK: dict[str, str] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_nonempty_at_correctness_sf(con):
    empty = []
    for name, entry in all_queries().items():
        if entry.oracle is None or name in EMPTY_OK:
            continue
        n = con.execute(
            f"SELECT COUNT(*) FROM ({entry.oracle})"
        ).fetchone()[0]
        if n == 0:
            empty.append(name)
    assert not empty, (
        f"vacuous oracles (0 rows at sf0.01): {empty} — a hash-green "
        "driver row on these proves nothing; fix the predicate/threshold "
        "(data-derived, like the AA_CAP_QUANTILE fix) or declare EMPTY_OK "
        "with a reason"
    )
