"""Global dense sequential IDs (reference §1.5: XMLToCSV.py:161, 180, 188).

The reference is single-threaded, so a plain counter yields dense IDs in
document order for free. Distributed Spark has no document order and no free
global counter — SURVEY.md §7.4 ranks this the #1 hard part. The scalable
construction used here is the two-phase partition-offset trick:

1. one cheap job counts rows per partition (count only, nothing materialized);
2. the driver prefix-sums the tiny per-partition histogram;
3. the main job adds ``offset[partition] + row_index_in_partition``.

Everything stays JVM-side: ``monotonically_increasing_id()`` already encodes
``(partition_id << 33) + row_index``, so the within-partition index is
recovered arithmetically instead of via an RDD zipWithIndex round-trip
through Python. No total-order shuffle, no single-partition bottleneck —
this survives a 100 TB input unchanged.

IDs are dense and unique; they follow partition order, not the reference's
document order (declared out of contract — comparisons are join-based,
SURVEY.md §5.2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PARTITION_SHIFT = 33  # monotonically_increasing_id puts partition id at bit 33

# Above this many input partitions the offset lookup switches from an inlined
# literal-map expression (O(#partitions) scan per row + a giant codegen tree)
# to a broadcast (pid, offset) equi-join — the plan shape that holds at the
# ~100k+ splits of a 100 TB input.
MAP_LITERAL_MAX_PARTITIONS = 1024


def with_dense_ids_counted(
    df: DataFrame,
    id_col: str = "id",
    start: int = 0,
    cache_registry: list[DataFrame] | None = None,
    map_literal_max: int = MAP_LITERAL_MAX_PARTITIONS,
) -> tuple[DataFrame, int]:
    """Add a dense unique ``id_col`` (start, start+1, …, start+n-1); also
    return the row count n (known for free from the partition histogram —
    callers must NOT pay another count job for it).

    Phase-1 detail: the partitioned frame is persisted (memory-and-disk)
    before the histogram job, because the histogram job and the final job
    MUST observe the identical partitioning — AQE may otherwise re-plan
    upstream shuffles differently between the two jobs, silently shifting
    monotonically_increasing_id's partition ids (observed: null IDs after
    the offset-map lookup). Persisting pins the partitioning — the same
    reason RDD.zipWithIndex materializes its input.

    The persisted intermediate is appended to ``cache_registry`` when given;
    the caller unpersists it once the returned frame has been fully consumed
    (note: calling .unpersist() on the RETURNED frame would be a no-op —
    it is a derived plan, not the cached one).
    """
    with_mono = df.withColumn("_mono", F.monotonically_increasing_id())
    with_pid = with_mono.withColumn(
        "_pid", F.shiftright(F.col("_mono"), _PARTITION_SHIFT).cast("long")
    )
    with_pid = with_pid.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(with_pid)

    hist = (
        with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    )  # tiny: one row per partition
    offsets, acc = {}, start
    for row in hist:
        offsets[row["_pid"]] = acc
        acc += row["count"]

    row_in_partition = F.col("_mono") - F.shiftleft(F.col("_pid"), _PARTITION_SHIFT)
    if len(offsets) <= map_literal_max:
        # few partitions: inline the lookup as a literal map — no join at all
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        ) if offsets else F.lit(start)
        out = with_pid.withColumn(
            id_col, (offset_expr + row_in_partition).cast("long")
        ).drop("_mono", "_pid")
    else:
        # many partitions: a literal map would be a huge expression tree
        # (codegen limits) scanned linearly per row — broadcast-join the tiny
        # (pid, offset) table instead; broadcast hash lookup is O(1) per row
        offsets_df = df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "_pid long, _dense_offset long",
        )
        out = (
            with_pid.join(F.broadcast(offsets_df), "_pid")
            .withColumn(id_col, (F.col("_dense_offset") + row_in_partition).cast("long"))
            .drop("_mono", "_pid", "_dense_offset")
        )
    return out, acc - start


def with_dense_ids(
    df: DataFrame,
    id_col: str = "id",
    start: int = 0,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """``with_dense_ids_counted`` without the count (see that docstring)."""
    out, _ = with_dense_ids_counted(df, id_col, start, cache_registry)
    return out
