"""Property test: merge_apply (the MERGE INTO core) equals a dict-based
Python reference on random targets and random CDC feeds — latest-wins
resolution, all four match/op classes, and pass-through rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.operators.relational import merge_apply

KEYS = st.integers(min_value=0, max_value=14)


@st.composite
def scenario(draw):
    target = {
        k: (draw(st.integers(0, 99)), draw(st.sampled_from("OFP")),
            float(draw(st.integers(1, 1000))))
        for k in draw(st.sets(KEYS, min_size=0, max_size=10))
    }
    n = draw(st.integers(0, 12))
    changes = []
    for _ in range(n):
        k = draw(KEYS)
        # seq collisions allowed: merge_apply's tie-break must make the
        # winner deterministic (review r8 session 4)
        seq = draw(st.integers(1, 3))
        op = draw(st.sampled_from(["U", "D", "I"]))
        changes.append(
            (k, draw(st.integers(0, 99)), op, draw(st.sampled_from("XYZN")),
             float(draw(st.integers(1, 1000))), seq)
        )
    return target, changes


def _reference(target, changes):
    latest = {}
    for k, cust, op, status, price, seq in changes:
        # mirror merge_apply's total order: change_seq DESC, then
        # (op, new_status, new_price, s_custkey) ASC nulls-first
        cand = (cust, op, status, price, seq)
        if k not in latest:
            latest[k] = cand
            continue
        cur = latest[k]
        key = lambda c: (-c[4], c[1], c[2], c[3], c[0])
        if key(cand) < key(cur):
            latest[k] = cand
    out = {}
    for k, (c, s, p) in target.items():
        if k not in latest:
            out[k] = (c, s, p, "kept")
        else:
            cust, op, status, price, _ = latest[k]
            if op == "D":
                continue
            out[k] = (c, status, price, "updated")  # U and I on matched apply
    for k, (cust, op, status, price, _) in latest.items():
        if k not in target and op == "I":
            out[k] = (cust, status, price, "inserted")
    return {
        k: (c, s, round(p, 6), a) for k, (c, s, p, a) in out.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sc=scenario())
def test_merge_apply_matches_reference(spark, sc):
    target, changes = sc
    tdf = spark.createDataFrame(
        [(k, c, s, p) for k, (c, s, p) in target.items()] or [(None,) * 4],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    ).filter("o_orderkey IS NOT NULL")
    cdf = spark.createDataFrame(
        changes or [(None,) * 6],
        "o_orderkey long, s_custkey long, op string, new_status string,"
        " new_price double, change_seq long",
    ).filter("o_orderkey IS NOT NULL")
    got = {
        r["o_orderkey"]: (
            r["o_custkey"], r["o_orderstatus"], round(r["o_totalprice"], 6),
            r["merge_action"],
        )
        for r in merge_apply(tdf, cdf).collect()
    }
    assert got == _reference(target, changes)
