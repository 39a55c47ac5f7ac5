"""SparkSession factory with scale-oriented defaults.

Local tests run on local[N]; the conf below is chosen so the *same* plans run
well on a 1000-executor cluster: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for the few Pandas-UDF paths, and parquet
pushdown/pruning left at their (enabled) defaults so Catalyst can do its job.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_CKPT_ROOT: str | None = None


def session_checkpoint_dir(prefix: str) -> str:
    """A fresh unique subdirectory under ONE session-scoped checkpoint root,
    removed at interpreter exit. Operators that parquet-checkpoint
    intermediates (MinHash candidates, CC rounds, SemDeDup cells) must leave
    their files in place while the session lives — returned frames read them
    lazily — but per-invocation ``tempfile.mkdtemp`` leaks a directory per
    call (VERDICT r7 #6). One root + atexit bounds the leak to the process
    lifetime without breaking any lazily-reading caller. On a real cluster,
    pass the operators' explicit ``checkpoint_dir``/``staging_dir`` pointing
    at a shared filesystem instead — this root is driver-local."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        _CKPT_ROOT = tempfile.mkdtemp(prefix="dblp_ckpt_root_")
        atexit.register(shutil.rmtree, _CKPT_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_CKPT_ROOT)


def checkpoint_base(spark, checkpoint_dir: str | None, prefix: str) -> str:
    """Resolve a parquet-checkpoint location for operators whose returned
    frames (or iteration rounds) read the files lazily. ``checkpoint_dir``
    must be a SHARED/durable filesystem path on a real cluster — executors
    and driver must see the same files. The driver-local tempdir fallback
    is only correct when all executors share the driver's filesystem, so it
    is guarded by a local-master assertion (the CC guard from ADVICE r2,
    generalized in r8 to every checkpointing operator: PageRank, CC,
    k-core, coreness, co-part edges, SemDeDup, the substring dup table,
    curate_corpus).

    ALWAYS returns a fresh per-invocation subdirectory — also under an
    explicit ``checkpoint_dir``: operators write fixed file names
    ('edges', 'round_3', 'cells') beneath the base, so handing two
    invocations the same base would let the second overwrite (or its
    cleanup delete) files the first invocation's returned frame still
    reads lazily (review r8 — the semdedup/_stage collision policy,
    centralized)."""
    import uuid

    if checkpoint_dir is not None:
        return os.path.join(checkpoint_dir, f"{prefix}{uuid.uuid4().hex}")
    master = spark.conf.get("spark.master", "")
    if not master.startswith("local"):
        raise ValueError(
            f"{prefix.strip('_')} checkpointing on a non-local master "
            "requires checkpoint_dir= to point at a shared filesystem "
            "path; a driver-local tempdir would silently drop rows "
            f"(master={master})"
        )
    return session_checkpoint_dir(prefix)


def get_spark(app_name: str = "dblp-to-csv-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local runs; on a real cluster this would scale with cores.
        .config("spark.sql.shuffle.partitions", cpus)
        # The driver's events.parquet stores TIMESTAMP(NANOS), which Spark
        # rejects by default; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow batches for the Pandas-UDF paths (similarity, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
