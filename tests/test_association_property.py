"""Hypothesis differential for the market-basket PMI oracle: random basket
sets are scored by a from-scratch pure-Python apriori/PMI implementation
and by the registered DuckDB oracle SQL (no Spark — fast enough for many
examples). The oracle-parity suite then ties the Spark plan to the same
oracle, closing the triangle: Spark ≡ oracle ≡ first-principles Python."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.operators.association import (
    ITEM_FREQ_QUANTILE,
    PAIR_MIN_SUPPORT,
)
from dblp_to_csv_spark.registry import all_queries


def _python_pmi(rows: list[tuple[int, int]]):
    """First-principles apriori-pruned PMI over (basket, item) pairs."""
    baskets = {}
    for b, i in set(rows):
        baskets.setdefault(b, set()).add(i)
    n_baskets = len(baskets)
    freq: dict[int, int] = {}
    for items in baskets.values():
        for i in items:
            freq[i] = freq.get(i, 0) + 1
    if not freq:
        return {}
    # linear-interpolated quantile, the percentile/quantile_cont definition
    vals = sorted(freq.values())
    pos = ITEM_FREQ_QUANTILE * (len(vals) - 1)
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    cutoff = vals[lo] + (pos - lo) * (vals[hi] - vals[lo])
    kept = {i for i, c in freq.items() if c >= cutoff}
    pair_n: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        ks = sorted(i for i in items if i in kept)
        for x in range(len(ks)):
            for y in range(x + 1, len(ks)):
                pair_n[(ks[x], ks[y])] = pair_n.get((ks[x], ks[y]), 0) + 1
    out = {}
    for (a, b), pn in pair_n.items():
        if pn < PAIR_MIN_SUPPORT:
            continue
        lift = (pn * n_baskets) / (freq[a] * freq[b])
        out[(a, b)] = (pn, freq[a], freq[b], round(lift, 6), round(math.log(lift), 6))
    return out


basket_rows = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 8)), min_size=0, max_size=80
)


@settings(max_examples=150, deadline=None)
@given(basket_rows)
def test_pmi_oracle_matches_first_principles(rows):
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [b for b, _ in rows] or pd.Series([], dtype="int64"),
            "l_partkey": [i for _, i in rows] or pd.Series([], dtype="int64"),
        }
    )
    con = duckdb.connect()
    con.register("lineitem", lineitem)
    oracle = all_queries()["cooccurrence_parts_pmi"].oracle
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(oracle).fetchall()
    }
    con.close()
    assert got == _python_pmi(rows)
