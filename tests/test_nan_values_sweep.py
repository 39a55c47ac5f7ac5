"""NaN-landmine sweep: the 21 oracle-checked queries that read
events.value run against a corpus where `value` mixes real numbers with
IEEE NaN (and NULL) and must still match their DuckDB oracles.

NaN is where engines diverge loudest after NULL: Spark orders NaN GREATER
than any double and groups NaNs as equal; DuckDB treats NaN as greater
than infinity in ORDER BY but aggregate/quantile behavior differs by
function. The driver corpora are NaN-free, so any fix this sweep forces
must be value-identical on real data (the unicode-sweep contract)."""

from __future__ import annotations

import math

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

NAN_QUERIES = sorted(
    (n, e)
    for n, e in all_queries().items()
    if e.oracle is not None and "events" in e.oracle and "value" in e.oracle
)


@pytest.fixture(scope="module")
def nan_sf(tmp_path_factory):
    """events = a 400-row slice of real data with every 7th value NaN and
    every 11th NULL; other tables ride along as small slices."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("nan_sf")
    for t in TABLES:
        if t == "events":
            continue
        pq.write_table(pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 20),
                       out / f"{t}.parquet")
    tb = pq.read_table(f"{REAL_SF}/events.parquet").slice(0, 400)
    vals = tb.column("value").to_pylist()
    vals = [
        float("nan") if i % 7 == 0 else (None if i % 11 == 0 else v)
        for i, v in enumerate(vals)
    ]
    idx = tb.schema.get_field_index("value")
    tb = tb.set_column(idx, tb.schema.field(idx), pa.array(vals, type=tb.schema.field(idx).type))
    pq.write_table(tb, out / "events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(nan_sf):
    con = duck_for(nan_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name,entry", NAN_QUERIES, ids=[n for n, _ in NAN_QUERIES])
def test_query_survives_nan_values(spark, duck, nan_sf, name, entry):
    got = entry.fn(spark, nan_sf).toPandas()  # the crash gate
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the NaN landmine corpus")


def test_winsorize_excludes_missing_from_clipped_mean(spark, tmp_path):
    """Policy pin (ADVICE r11): a missing measurement must contribute to
    NEITHER mean. LEAST/GREATEST skip NULLs on both engines, so an
    unguarded clip silently counts every NULL/NaN row as a p05
    observation — parity holds but the value is wrong. Crafted corpus:
    values 1..20 plus one NULL and one NaN ⇒ p05=1.95, p95=19.05,
    mean_winsorized = (1.95 + Σ2..19 + 19.05)/20 = 10.5 exactly; the
    buggy clip would average 22 rows (two of them p05) ⇒ ≈9.72."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dblp_to_csv_spark.operators.statistics import winsorize_event_values

    tb = pq.read_table(f"{REAL_SF}/events.parquet").slice(0, 22)
    vals = [float(i) for i in range(1, 21)] + [None, float("nan")]
    types = ["pin"] * 22
    for col, data in (("value", pa.array(vals, type=tb.column("value").type)),
                      ("event_type", pa.array(types))):
        idx = tb.schema.get_field_index(col)
        tb = tb.set_column(idx, tb.schema.field(col).with_type(data.type), data)
    for t in TABLES:
        if t != "events":
            pq.write_table(pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 5),
                           tmp_path / f"{t}.parquet")
    pq.write_table(tb, tmp_path / "events.parquet")

    row = winsorize_event_values(spark, str(tmp_path)).collect()[0]
    assert row["p05"] == 1.95 and row["p95"] == 19.05
    assert row["n_clipped_lo"] == 1 and row["n_clipped_hi"] == 1
    assert row["mean_raw"] == 10.5
    assert row["mean_winsorized"] == 10.5, (
        "missing measurements leaked into the winsorized mean as p05"
    )
