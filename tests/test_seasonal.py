"""Seasonal-decomposition invariants: per-weekday residuals sum to ~0 (the
defining property of the fitted day-of-week effect) and the decomposition
reassembles the daily means exactly."""

from __future__ import annotations

from collections import defaultdict

from dblp_to_csv_spark.operators.timeseries import seasonal_decompose_events
from tests.conftest import SF_CORRECTNESS


def test_residuals_center_per_weekday(spark):
    rows = seasonal_decompose_events(spark, SF_CORRECTNESS).collect()
    assert len(rows) >= 28  # a month of days
    by_dow = defaultdict(list)
    for r in rows:
        by_dow[r["dow"]].append(r["residual"])
    assert set(by_dow) == set(range(7))
    for dow, res in by_dow.items():
        assert abs(sum(res) / len(res)) < 1e-5, dow
