"""Invariant gates for the round-11 session-2 operators, beyond oracle
parity: the mathematical properties that make each operator TRUSTWORTHY
(mergeability for the sketch, information-theoretic bounds for MI and the
isotropy report, the partition property for the k-anonymity pair). Oracle
parity says both engines agree; these say they agree on the right thing."""

from __future__ import annotations

import duckdb
import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.operators.statistics import BOTTOMK_K
from dblp_to_csv_spark.operators.relational import K_ANONYMITY
from tests.conftest import SF_CORRECTNESS

SF = SF_CORRECTNESS


def test_bottomk_sketch_is_mergeable():
    """The property that makes bottom-k a SKETCH: cutting the union of two
    partial bottom-k states to k rows equals the bottom-k of the whole
    input, for any split. Verified on the real table with the real hash."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW h AS SELECT md5(l_orderkey || '|' || l_linenumber) AS hk"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    whole = [
        r[0]
        for r in con.execute(
            f"SELECT hk FROM h ORDER BY hk LIMIT {BOTTOMK_K}"
        ).fetchall()
    ]
    # arbitrary 2-way split (hash parity of the last hex digit)
    parts = []
    for pred in ("ascii(substr(hk, 32, 1)) % 2 = 0", "ascii(substr(hk, 32, 1)) % 2 = 1"):
        parts += [
            r[0]
            for r in con.execute(
                f"SELECT hk FROM h WHERE {pred} ORDER BY hk LIMIT {BOTTOMK_K}"
            ).fetchall()
        ]
    merged = sorted(parts)[:BOTTOMK_K]
    assert merged == whole


def test_bottomk_estimates_bounded_by_sample_extremes(spark):
    """Every quantile estimate must lie inside the sampled value range, and
    rel_error must be the |est-exact|/exact the columns imply."""
    df = all_queries()["sketch_bottomk_quantiles"].fn(spark, SF).toPandas()
    assert list(df["q"]) == [0.25, 0.5, 0.75, 0.95]
    assert (df["est"].diff().dropna() >= 0).all()  # monotone in q
    assert (df["exact"].diff().dropna() >= 0).all()
    recomputed = (df["est"] - df["exact"]).abs() / df["exact"]
    assert ((recomputed - df["rel_error"]).abs() < 1e-3).all()


def test_bottomk_group_estimates_consistent(spark):
    """Per-group sketch: every group present in the data reports both
    quantiles, estimates are monotone in q within a group, and rel_error
    is self-consistent with est/exact."""
    df = all_queries()["sketch_bottomk_quantiles_by_group"].fn(spark, SF).toPandas()
    assert len(df) > 0 and len(df) % 2 == 0
    for _, g in df.groupby("event_type"):
        g = g.sort_values("q")
        assert list(g["q"]) == [0.5, 0.95]
        assert g["est"].iloc[0] <= g["est"].iloc[1]
        assert g["exact"].iloc[0] <= g["exact"].iloc[1]
    recomputed = (df["est"] - df["exact"]).abs() / df["exact"].abs()
    assert ((recomputed - df["rel_error"]).abs() < 1e-3).all()


def test_mutual_information_bounds(spark):
    """0 ≤ MI ≤ min(H(source), H(lang)); NMI ∈ [0, 1]. The inequality is
    exact mathematics — rounding gives it 1e-5 of slack."""
    row = all_queries()["drift_mutual_information"].fn(spark, SF).toPandas().iloc[0]
    eps = 1e-5
    assert row.mi_nats >= -eps
    assert row.mi_nats <= min(row.h_source, row.h_lang) + eps
    assert -eps <= row.nmi <= 1 + eps


def test_isotropy_bounds(spark):
    """isotropy_ratio = ‖μ‖²/E[‖x‖²] ∈ [0,1] (Jensen); participation ratio
    ∈ [1, dims] (Cauchy-Schwarz both ways on the variance diagonal)."""
    row = all_queries()["embedding_norm_isotropy"].fn(spark, SF).toPandas().iloc[0]
    eps = 1e-5
    assert -eps <= row.isotropy_ratio <= 1 + eps
    assert 1 - eps <= row.participation_ratio <= row.dims + eps
    assert row.mean_sq_norm >= row.centroid_norm_sq - eps


def test_k_anonymity_partitions_the_table(spark):
    """Release rows + members of violating groups = the whole table (the
    suppression is exactly the audit's complement), and every released
    group reaches K."""
    qs = all_queries()
    audit = qs["privacy_k_anonymity_audit"].fn(spark, SF).toPandas()
    release = qs["privacy_k_anonymous_release"].fn(spark, SF).toPandas()
    total = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert (audit["group_size"] < K_ANONYMITY).all()
    assert len(audit) > 0, "vacuous audit: no violating groups at this SF"
    assert audit["group_size"].sum() + len(release) == total
    sizes = release.groupby(
        ["c_nationkey", "c_mktsegment", "acctbal_band"]
    ).size()
    assert (sizes >= K_ANONYMITY).all()


def test_psi_values_exactly_on_cutpoints(spark, tmp_path):
    """PSI boundary pin: reference arm 0..10 (n=11) makes every decile
    cutpoint an EXACT integer ((n-1)·q integral → no interpolation), and
    the current arm reuses those integers — every value sits exactly ON a
    cutpoint, the case where a 1-ulp cross-engine cutpoint difference
    would flip `value > c`. With tie-down-rounded cutpoints both engines
    must agree bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dblp_to_csv_spark.operators.drift import PSI_CUR, PSI_REF
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.sources.tables import TABLES
    from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

    out = tmp_path / "psi_sf"
    out.mkdir()
    for t in TABLES:
        if t == "events":
            continue
        pq.write_table(pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 3),
                       out / f"{t}.parquet")
    schema = pq.read_schema(f"{REAL_SF}/events.parquet")
    ref = [float(v) for v in range(11)]
    cur = [float(v) for v in range(11)] * 2
    n = len(ref) + len(cur)
    rows = {
        "event_id": list(range(n)),
        "ts": [1_700_000_000_000_000 + i for i in range(n)],
        "user_id": [1] * n,
        "event_type": [PSI_REF] * len(ref) + [PSI_CUR] * len(cur),
        "value": ref + cur,
        "props": ["{}"] * n,
    }
    cols = []
    for f in schema:
        data = rows[f.name]
        if f.name == "ts":
            cols.append(pa.array(data, type=pa.int64()).cast(f.type))
        else:
            cols.append(pa.array(data).cast(f.type))
    pq.write_table(pa.table(cols, schema=schema), out / "events.parquet")

    q = all_queries()["drift_psi_events_value"]
    got = q.fn(spark, str(out)).toPandas()
    con = duck_for(str(out))
    want = con.execute(q.oracle).fetchdf()
    con.close()
    assert_matches_oracle("drift_psi_events_value", got, want, "cutpoint-boundary corpus")
    assert len(got) == 1 and got["n_ref"].iloc[0] == 11


def test_bottomk_exact_side_bit_equals_percentile(spark):
    """The flat-sorted-array exact side (r14 s6) must reproduce Spark's
    Percentile aggregate BIT-EXACTLY — same position = q·(n−1), same
    (ceil−pos)·lower + (pos−floor)·higher interpolation with the
    ceil==floor guard — across adversarial frames: n=1..4, heavy
    duplicates, 1e±300 magnitudes, mixed signs, and empty input (NULL)."""
    import math
    import random
    import struct

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.statistics import _BK_QS

    qs_lit = F.array(*[F.lit(q) for q in _BK_QS])

    def _interp(q: float):
        pos = F.lit(q) * (F.col("n") - F.lit(1)).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        lower = F.element_at("a", lo.cast("int") + 1)
        higher = F.element_at("a", hi.cast("int") + 1)
        return F.when(hi == lo, lower).otherwise(
            (hi - pos) * lower + (pos - lo) * higher
        )

    random.seed(11)
    cases = [[random.uniform(-1e6, 1e6) for _ in range(n)] for n in (1, 2, 3, 4)]
    cases.append([random.choice([1.0, 2.0, 3.0]) for _ in range(40)])
    cases.append([random.uniform(1e290, 1e300) for _ in range(15)])
    cases.append([random.uniform(1e-300, 1e-290) for _ in range(15)])
    cases.append([(-1) ** i * random.uniform(0, 1e18) for i in range(31)])
    bits = lambda x: struct.pack("d", x)
    for vals in cases:
        df = spark.createDataFrame([(float(v),) for v in vals], "val double")
        ref = df.agg(F.percentile("val", qs_lit).alias("x")).collect()[0]["x"]
        got = (
            df.agg(F.array_sort(F.collect_list("val")).alias("a"))
            .select("a", F.size("a").alias("n"))
            .select(
                F.when(
                    F.col("n") > 0, F.array(*[_interp(q) for q in _BK_QS])
                ).alias("x")
            )
            .collect()[0]["x"]
        )
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            assert bits(r) == bits(g), (vals[:3], r, g)
    # empty input → NULL array, matching percentile over zero rows
    empty = spark.createDataFrame([], "val double")
    got = (
        empty.agg(F.array_sort(F.collect_list("val")).alias("a"))
        .select("a", F.size("a").alias("n"))
        .select(
            F.when(F.col("n") > 0, F.array(*[_interp(q) for q in _BK_QS])).alias("x")
        )
        .collect()[0]["x"]
    )
    assert got is None
