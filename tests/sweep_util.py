"""Shared harness for the degenerate-corpus sweeps (empty / tiny / tied):
one comparator and one DuckDB-view helper so the three gates cannot drift
apart in comparison semantics."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from dblp_to_csv_spark.sources.tables import TABLES

REAL_SF = "/root/testdata/sf0.001"


def duck_for(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def values_agree(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def assert_matches_oracle(name: str, got: pd.DataFrame, want: pd.DataFrame, label: str):
    assert len(got) == len(want), (
        f"{name}: {len(got)} Spark rows vs {len(want)} oracle rows on {label}"
    )
    assert sorted(got.columns) == sorted(want.columns)
    if len(got) == 0:
        return
    g = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), kind="mergesort", key=lambda s: s.astype(str)
    )
    w = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), kind="mergesort", key=lambda s: s.astype(str)
    )
    for c in g.columns:
        for a, b in zip(g[c].tolist(), w[c].tolist()):
            assert values_agree(a, b), f"{name}.{c}: {a!r} != {b!r}"
