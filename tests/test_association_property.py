"""Hypothesis differential for the market-basket PMI oracle: random basket
sets are scored by a from-scratch pure-Python apriori/PMI implementation
and by the registered DuckDB oracle SQL (no Spark — fast enough for many
examples). The oracle-parity suite then ties the Spark plan to the same
oracle, closing the triangle: Spark ≡ oracle ≡ first-principles Python."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.operators.association import (
    ITEM_FREQ_QUANTILE,
    PAIR_MIN_SUPPORT,
)
from dblp_to_csv_spark.registry import all_queries


def _r(x: float, nd: int) -> float:
    """Half-away-from-zero rounding on the exact binary double. NOTE the
    engines are not bit-identical to this at exact-half boundaries (DuckDB
    rounds via x*10^nd doubles, Spark via BigDecimal-of-shortest-repr), so
    assertions compare display floats with a one-rounding-step tolerance —
    the SEMANTICS under test (bin ids, counts, classes, integer-derived
    ratios) stay exact."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _close(a: float, b: float, nd: int = 6) -> bool:
    return abs(a - b) <= 1.5 * 10 ** (-nd)


def _rows_match(got: dict, want: dict, float_idx: tuple, nd: int = 6) -> None:
    assert set(got) == set(want), (set(got) ^ set(want))
    for k, gv in got.items():
        wv = want[k]
        for i, (g, w) in enumerate(zip(gv, wv)):
            if i in float_idx:
                assert _close(g, w, nd), (k, i, g, w)
            else:
                assert g == w, (k, i, g, w)


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
        out[(a, b)] = (pn, freq[a], freq[b], _r(lift, 6), _r(math.log(lift), 6))
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
    _rows_match(got, _python_pmi(rows), float_idx=(3, 4))


def _python_hist(prices: list[float], bins: int = 16):
    if not prices:
        return {}
    lo, hi = min(prices), max(prices)
    total = len(prices)
    out: dict[int, int] = {}
    width = (hi - lo) / bins
    for x in prices:
        if width == 0:  # constant column OR denormal-range underflow
            b = 0
        else:
            b = min(int(math.floor((x - lo) / width)), bins - 1)
        out[b] = out.get(b, 0) + 1
    return {
        b: (_r(lo + b * width, 6), _r(lo + (b + 1) * width, 6), n,
            _r(n / total, 6))
        for b, n in out.items()
    }


prices_strategy = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(prices_strategy)
def test_histogram_oracle_matches_first_principles(prices):
    lineitem = pd.DataFrame(
        {"l_extendedprice": pd.Series(prices, dtype="float64")}
    )
    con = duckdb.connect()
    con.register("lineitem", lineitem)
    oracle = all_queries()["histogram_equiwidth_prices"].oracle
    got = {
        r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(oracle).fetchall()
    }
    con.close()
    _rows_match(got, _python_hist(prices), float_idx=(0, 1, 3))


def _python_abc(rows: list[tuple[int, float, float]]):
    sums: dict[int, float] = {}
    for part, price, disc in rows:
        sums[part] = sums.get(part, 0.0) + price * (1 - disc)
    # HALF-AWAY rounding (Spark round / DuckDB ROUND), not Python's
    # banker's round() — the same divergence the r8 Arrow-quantizer fix hit
    cents = {p: int(math.floor(s * 100 + 0.5)) for p, s in sums.items()}
    total = sum(cents.values())
    out = {}
    cum = 0
    for p in sorted(cents, key=lambda p: (-cents[p], p)):
        cum += cents[p]
        share = cum / total
        cls = "A" if share <= 0.8 else ("B" if share <= 0.95 else "C")
        out[p] = (_r(cents[p] / 100.0, 2), _r(share, 6), cls)
    return out


abc_rows = st.lists(
    st.tuples(
        st.integers(0, 10),
        st.floats(min_value=0.01, max_value=1e4, allow_nan=False),
        st.sampled_from([0.0, 0.05, 0.1]),
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=150, deadline=None)
@given(abc_rows)
def test_abc_oracle_matches_first_principles(rows):
    lineitem = pd.DataFrame(
        {
            "l_partkey": [p for p, _, _ in rows],
            "l_extendedprice": [x for _, x, _ in rows],
            "l_discount": [d for _, _, d in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", lineitem)
    oracle = all_queries()["parts_abc_pareto"].oracle
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(oracle).fetchall()}
    con.close()
    _rows_match(got, _python_abc(rows), float_idx=(0, 1))
