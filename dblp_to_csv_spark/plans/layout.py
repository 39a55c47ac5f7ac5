"""Z-ordered data layout: MULTI-dimensional data skipping for parquet scans.

Sorting a table by one column gives perfect file/row-group pruning on that
column and none on any other — every file spans the full range of the
second dimension. Interleaving the bits of per-column bucket ranks (a
Z-/Morton curve) clusters rows that are close in EVERY dimension into the
same files, so parquet min/max statistics prune scans filtered on ANY of
the z-ordered columns. This is the layout strategy behind Delta's
OPTIMIZE ZORDER BY, reimplemented on plain parquet with public Spark
primitives:

1. per column: approxQuantile cutpoints (driver-side, tiny) → equi-depth
   bucket rank via an in-row literal-array scan — no shuffle, robust to
   skewed value distributions (raw value bits would waste the key space);
2. interleave the rank bits into one ``zkey`` (pure bitwise expressions,
   whole-stage codegen);
3. repartitionByRange + sortWithinPartitions on ``zkey`` — one range
   exchange, each output file covers a compact curve segment;
4. drop the key and write; the data itself is unchanged.

At 100 TB: the quantile pass is a sampled aggregate, the single range
shuffle is the same cost as any sorted write, and file count is chosen so
each file ~ one task's worth. The payoff is read-side: a filter on any
z-ordered dimension prunes most files before any IO
(tests/test_zorder_layout.py proves it on parquet footers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_rank(cuts: list[float], col: str) -> Column:
    """Equi-depth bucket rank in [0, 2^bits): the count of approx-quantile
    cutpoints strictly below the value — an in-row scan of a ≤(2^bits − 1)-
    element literal array (codegen-friendly; 8 bits = 255 comparisons)."""
    # dedupe while preserving order: heavy single values collapse cutpoints
    uniq: list[float] = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(float(c))
    if not uniq:
        return F.lit(0)
    arr = F.lit(uniq)
    v = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda t: t < v))


def with_zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add ``zkey``: the Morton interleave of each column's equi-depth
    bucket rank (``bits`` bits per dimension, most-significant first).
    All columns' quantiles come from ONE approxQuantile pass over the
    input — never a scan per dimension."""
    if not cols:
        raise ValueError("z-order needs at least one column")
    n = 1 << bits
    all_cuts = df.approxQuantile(list(cols), [i / n for i in range(1, n)], 0.001)
    ranks = {
        c: _bucket_rank(cuts, c).cast("long") for c, cuts in zip(cols, all_cuts)
    }
    z: Column = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for c in cols:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(ranks[c], bit).bitwiseAND(F.lit(1))
            )
    return df.withColumn("zkey", z)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 8, n_files: int = 16
) -> None:
    """Write ``df`` as z-ordered parquet: one range exchange on the Morton
    key, one sorted file per output partition, key dropped before write.
    ``n_files`` sizes output files (at scale: total bytes / target file
    size); pruning quality rises with file count until files are smaller
    than a row group."""
    dfz = with_zorder_key(df, cols, bits)
    (
        dfz.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """Hive-style directory partitioning (partitionBy at write time): the
    layout that makes BOTH static partition pruning (literal predicates on
    the partition column prune directories at planning time) and DYNAMIC
    partition pruning work — a selective dimension filter joined on the
    partition column turns into a runtime subquery that prunes fact
    partitions before the scan (asserted on the physical plan in
    tests/test_partition_pruning.py). At 100 TB this is the difference
    between scanning a day and scanning a decade."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)
