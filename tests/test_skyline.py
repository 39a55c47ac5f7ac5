"""Skyline (Pareto frontier) gates: the two-phase distributed sweep equals
a brute-force dominance check, and phase 1 actually prunes."""

from __future__ import annotations

import pyarrow.parquet as pq

from dblp_to_csv_spark.operators.curation import skyline_documents
from tests.conftest import SF_CORRECTNESS


def _brute(points):
    out = []
    for i, (xi, yi) in points.items():
        dominated = any(
            (xj >= xi and yj >= yi) and (xj > xi or yj > yi)
            for j, (xj, yj) in points.items()
            if j != i
        )
        if not dominated:
            out.append(i)
    return set(out)


def test_two_phase_equals_bruteforce(spark):
    rows = skyline_documents(spark, SF_CORRECTNESS).collect()
    got = {r["doc_id"] for r in rows}
    # rebuild the metric space independently (python tokenizer)
    import re

    pts = {}
    for r in pq.read_table(f"{SF_CORRECTNESS}/documents.parquet").to_pylist():
        toks = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        pts[r["doc_id"]] = (
            len(toks),
            round(len(set(toks)) / max(len(toks), 1), 6),
        )
    assert got == _brute(pts)
    # frontier is a strictly decreasing staircase in y over increasing x
    sky = sorted((pts[i] for i in got))
    for (x1, y1), (x2, y2) in zip(sky, sky[1:]):
        if x2 > x1:
            assert y2 < y1


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.operators.curation import pareto_skyline_2d


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    )
)
def test_two_phase_skyline_property(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in pareto_skyline_2d(df, "id", "x", "y").collect()}
    assert got == _brute({i: (x, y) for i, x, y in rows})
