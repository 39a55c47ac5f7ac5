"""Z-ordered layout (plans/layout.py): multi-dimensional data skipping.

The proof is on the parquet FOOTERS, not on plan text: after writing the
same data (a) sorted by x only and (b) z-ordered on (x, y), a selective
range predicate on y must overlap far fewer files' min/max ranges in the
z-ordered layout — the statistic every engine's scan pruning consults.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dblp_to_csv_spark.plans.layout import with_zorder_key, write_zordered

N = 40_000
N_FILES = 64  # pruning sharpens with file count; 16 is too coarse to assert on


@pytest.fixture(scope="module")
def xy(spark):
    """Two independent uniform dimensions — the worst case for any single
    sort order."""
    return (
        spark.range(N)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
            F.col("id").alias("payload"),
        )
    )


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] for col overlaps [lo,hi], total files) from
    parquet footers — what file-level pruning sees."""
    total, hit = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        total += 1
        cmin = min(
            md.row_group(i).column(_col_idx(md, col)).statistics.min
            for i in range(md.num_row_groups)
        )
        cmax = max(
            md.row_group(i).column(_col_idx(md, col)).statistics.max
            for i in range(md.num_row_groups)
        )
        if cmin <= hi and cmax >= lo:
            hit += 1
    return hit, total


def _col_idx(md, name: str) -> int:
    sch = md.schema
    for i in range(len(sch)):
        if sch.column(i).name == name:
            return i
    raise KeyError(name)


def test_zorder_prunes_both_dimensions(spark, xy, tmp_path):
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zordered")
    # baseline: sorted by x only (perfect on x, blind on y)
    (
        xy.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    write_zordered(xy, zordered, ["x", "y"], bits=8, n_files=N_FILES)

    lo, hi = 4000, 4999  # ~10% of the y domain
    lin_hit, lin_total = _files_overlapping(linear, "y", lo, hi)
    z_hit, z_total = _files_overlapping(zordered, "y", lo, hi)
    assert lin_total == z_total == N_FILES
    # the x-sorted layout cannot prune on y: every file spans ~the full range
    assert lin_hit == N_FILES
    # the z-order must prune a majority of files on the SECOND dimension
    # (measured ~23/64 at this shape; curve segments straddling bucket
    # boundaries keep it from the 4-quarters ideal)
    assert z_hit <= N_FILES // 2, (z_hit, N_FILES)
    # and still prune on the first dimension too (not a plain y sort)
    zx_hit, _ = _files_overlapping(zordered, "x", lo, hi)
    assert zx_hit <= N_FILES // 2, (zx_hit, N_FILES)


def test_zorder_preserves_data(spark, xy, tmp_path):
    out = str(tmp_path / "z")
    write_zordered(xy, out, ["x", "y"], bits=6, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == N
    assert sorted(back.columns) == ["payload", "x", "y"]
    # row-level content identical (layout is a permutation)
    assert (
        back.select(F.sum("x"), F.sum("y"), F.sum("payload")).collect()
        == xy.select(F.sum("x"), F.sum("y"), F.sum("payload")).collect()
    )


def test_zorder_key_is_deterministic_and_bounded(spark, xy):
    dfz = with_zorder_key(xy.limit(1000), ["x", "y"], bits=4)
    rows = dfz.select("zkey").collect()
    assert all(0 <= r["zkey"] < (1 << 8) for r in rows)  # 2 dims × 4 bits
    rows2 = with_zorder_key(xy.limit(1000), ["x", "y"], bits=4).select("zkey").collect()
    assert rows == rows2


def test_zorder_key_matches_python_reference(spark):
    """The Morton interleave must equal an independent Python bit-interleave
    of the same bucket ranks — catches bit-order/off-by-one drift in the
    expression construction."""
    rows = [(i, i % 13, (i * 7) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    bits = 4
    n = 1 << bits
    from dblp_to_csv_spark.plans.layout import with_zorder_key

    got = {r["id"]: r["zkey"] for r in with_zorder_key(df, ["x", "y"], bits).collect()}

    # reference: equi-depth rank via the same quantile cutpoints, then
    # classic bit interleave (x bit first at each level, MSB first)
    cuts = df.approxQuantile(["x", "y"], [i / n for i in range(1, n)], 0.001)
    def rank(cutlist, v):
        uniq = []
        for c in cutlist:
            if not uniq or c > uniq[-1]:
                uniq.append(c)
        return sum(1 for c in uniq if c < v)
    want = {}
    for i, x, y in rows:
        rx, ry = rank(cuts[0], x), rank(cuts[1], y)
        z = 0
        for b in range(bits - 1, -1, -1):
            z = (z << 1) | ((rx >> b) & 1)
            z = (z << 1) | ((ry >> b) & 1)
        want[i] = z
    assert got == want
