"""Error-bound gates for the sketch aggregates (VERDICT r7 #5): the two
registered approx queries are rows-only in the driver harness by declared
design (HLL/GK sketch outputs are engine-specific, no cross-engine exact
oracle) — so their accuracy contract is pinned HERE against exact Spark
computations at sf0.01 instead of being evidence-free.
"""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_hll_distinct_within_relative_error(spark):
    """approx_count_distinct is configured with rsd=0.01; HLL++ error is
    probabilistic, so gate at 5x the target (±5%) — a broken sketch (or a
    silently dropped rsd argument) lands far outside, real HLL++ lands well
    inside."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_queries()["approx_distinct_users"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_CORRECTNESS, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for etype, n in exact.items():
        assert n > 0
        rel = abs(approx[etype] - n) / n
        assert rel <= 0.05, (etype, approx[etype], n, rel)


def test_gk_percentiles_within_rank_error(spark):
    """approx_percentile runs at accuracy=10000 → rank error ≤ 1/10000.
    Gate: every returned quantile is an ACTUAL column value (GK returns
    members, not interpolations) whose empirical rank range covers a point
    within 10x the configured error of the target percentile."""
    sketch = {
        r["o_orderstatus"]: (r["p50_price"], r["p95_price"], r["p99_price"])
        for r in all_queries()["approx_percentile_prices"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    }
    rows = (
        load_table(spark, SF_CORRECTNESS, "orders")
        .select("o_orderstatus", "o_totalprice")
        .collect()
    )
    by_status: dict[str, list[float]] = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(float(r["o_totalprice"]))
    assert set(sketch) == set(by_status) and sketch
    tol = 10.0 / 10000  # 10x the configured 1/accuracy rank error
    for status, values in by_status.items():
        values.sort()
        n = len(values)
        for p, v in zip((0.5, 0.95, 0.99), sketch[status]):
            v = float(v)
            assert values[0] <= v <= values[-1]
            # v must be a member of the column (exact float round-trip)
            lo = bisect.bisect_left(values, v)
            hi = bisect.bisect_right(values, v)
            assert hi > lo, (status, p, v, "not a column value")
            # empirical rank interval [lo+1, hi] must come near p*n
            lo_rank = (lo + 1) / n
            hi_rank = hi / n
            assert lo_rank - tol <= p <= hi_rank + tol, (
                status,
                p,
                v,
                lo_rank,
                hi_rank,
            )


def test_countmin_never_underestimates(spark):
    """The count-min guarantee: est(x) >= true(x) for every point query,
    and est(x) <= true(x) + N/w in expectation-ish (checked loosely at 4x
    the expected bound so hash luck can't flake the suite)."""
    from dblp_to_csv_spark.operators.statistics import CM_WIDTH
    from dblp_to_csv_spark.registry import all_queries
    from tests.conftest import SF_CORRECTNESS

    rows = (
        all_queries()["sketch_countmin_words"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    )
    assert rows, "sketch produced no probe rows"
    total_tokens = sum(r.true_count for r in rows)  # lower bound on N
    for r in rows:
        assert r.est_count >= r.true_count, r
        assert r.overestimate == r.est_count - r.true_count
    # loose upper bound: the min over 4 rows rarely exceeds 4 * N / w
    # (true N >= sum of top-20 counts; use a generous multiple of that)
    n_floor = total_tokens
    for r in rows:
        assert r.overestimate <= max(64, 16 * n_floor // CM_WIDTH), r


def test_kmv_estimates_within_relative_error(spark):
    """KMV with k=64 has std error 1/sqrt(k-2) ~ 12.7%; gate at 4 sigma so
    hash luck can't flake, and pin the exact-when-small branch."""
    from dblp_to_csv_spark.registry import all_queries
    from tests.conftest import SF_CORRECTNESS

    rows = all_queries()["sketch_kmv_distinct"].fn(spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        if r.exact_distinct < 64:
            assert r.kmv_estimate == r.exact_distinct
        else:
            assert r.rel_error <= 0.51, r

    ops = all_queries()["sketch_kmv_set_ops"].fn(spark, SF_CORRECTNESS).collect()[0]
    assert ops.k_used >= 1
    assert abs(ops.est_union - ops.exact_union) / ops.exact_union <= 0.51
    # intersection compounds union + Jaccard error; loose sanity envelope
    assert abs(ops.est_intersection - ops.exact_intersection) <= max(
        32, 0.75 * ops.exact_union
    )
