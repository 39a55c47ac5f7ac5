"""Entity resolution / record linkage: blocked fuzzy matching over dirty
person-like records, 1-hop canonicalization, and field-wise survivorship
into golden records.

The classic master-data workload the dedup family does not cover: records
are STRUCTURED (multiple typed fields), the match rule is a conjunction of
per-field edit-distance thresholds (not set similarity over one text), and
the output is a merged golden record per resolved entity, not a keep/drop
verdict. Pipeline:

    derive dirty corpus -> two-pass blocking -> per-field verify ->
    1-hop min canonical -> survivorship merge

Dirty-corpus apparatus: the synthetic customer table carries no address or
phone, so the query derives them deterministically from md5(custkey) —
the same derived-relation pattern as graph_bfs_deep's md5-chained ring —
and emits up to two md5-gated variant records per entity, each exactly one
character-replacement edit away from its base (variant 1 perturbs the
address PREFIX, variant 2 the address SUFFIX + the phone tail). Both
engines rebuild the identical corpus, so the oracle checks the whole
pipeline end-to-end, not a sampled approximation.

Blocking is the scale story (reference context: the repo's LSH banding,
dedup.py): a 6-char address-prefix pass plus a 6-char address-suffix pass.
A single-edit corruption can break one blocking key but never both, so
every base-variant pair survives at least one pass — the standard
multi-pass blocking recall argument. Variant-variant pairs of one entity
share NO block (each breaks a different key), so cluster connectivity is
the star through the base record; 1-hop min canonicalization is exact on
stars and is computed identically by both engines regardless.

At 100 TB: each pass is an equi-join on a 6-hex-char key (16.7M uniform
blocks — addresses are md5-derived, so no hot blocks; widen the key for
billions of records), per-field levenshtein verification runs JVM-side
inside the join filter, and the canonical + survivorship stages are plain
keyed aggregations. Nothing is all-pairs; pair volume is sum of
block-size-choose-2, bounded by blocking-key width exactly like the LSH
band tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import fan_out_small, load_table

# Match rule thresholds: address within 3 edits (variants are 1-2 away),
# phone within 2 (variant 2 replaces the last digit).
ER_ADDR_MAX_DIST = 3
ER_PHONE_MAX_DIST = 2
# Variant emission gates (percent of entities carrying each variant).
ER_V1_PCT = 40
ER_V2_PCT = 25
# Blocking key width (hex chars). 16^6 ≈ 16.7M blocks: collision-free at
# test SFs, uniform by construction; widen for billion-record corpora.
ER_BLOCK_WIDTH = 6


def _draw(expr: str, salt: str) -> str:
    """24-bit uniform integer draw from md5(expr || salt) — the repo's
    cross-engine determinism idiom (Spark conv(hex,16,10) == DuckDB
    ('0x'||hex)::BIGINT; both sides integer-only)."""
    return f"CAST(conv(substring(md5(concat(CAST({expr} AS STRING), '{salt}')), 1, 6), 16, 10) AS BIGINT)"


def _dirty_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic dirty corpus: one base record per customer plus
    md5-gated single-edit variants. record_id = custkey*10 + variant."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    cust = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.expr("md5(concat(CAST(c_custkey AS STRING), ':addr'))").alias("addr0"),
        F.expr("substring(md5(concat(CAST(c_custkey AS STRING), ':ph')), 1, 10)").alias(
            "phone0"
        ),
    )
    base = cust.select(
        (F.col("c_custkey") * 10).alias("record_id"),
        F.col("c_name").alias("name"),
        F.col("addr0").alias("addr"),
        F.col("phone0").alias("phone"),
        F.col("c_acctbal").alias("bal"),
    )
    # Variant 1: address prefix corrupted (one replacement at position 2-6,
    # inside the prefix blocking key, outside the suffix key).
    v1 = (
        cust.where(F.expr(f"{_draw('c_custkey', ':v1g')} % 100 < {ER_V1_PCT}"))
        .withColumn("p1", F.expr(f"2 + CAST({_draw('c_custkey', ':v1p')} % 5 AS INT)"))
        .select(
            (F.col("c_custkey") * 10 + 1).alias("record_id"),
            F.col("c_name").alias("name"),
            F.expr(
                "concat(substring(addr0, 1, p1 - 1), '~', substring(addr0, p1 + 1, 32))"
            ).alias("addr"),
            F.col("phone0").alias("phone"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    # Variant 2: address suffix corrupted (position 28-32, inside the suffix
    # blocking key) + phone tail digit replaced.
    v2 = (
        cust.where(F.expr(f"{_draw('c_custkey', ':v2g')} % 100 < {ER_V2_PCT}"))
        .withColumn("p2", F.expr(f"28 + CAST({_draw('c_custkey', ':v2p')} % 5 AS INT)"))
        .select(
            (F.col("c_custkey") * 10 + 2).alias("record_id"),
            F.col("c_name").alias("name"),
            F.expr(
                "concat(substring(addr0, 1, p2 - 1), '~', substring(addr0, p2 + 1, 32))"
            ).alias("addr"),
            F.expr("concat(substring(phone0, 1, 9), '~')").alias("phone"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    return base.unionByName(v1).unionByName(v2)


# The dirty-corpus CTE, shared verbatim by both oracles (DuckDB dialect:
# VARCHAR cast + ('0x'||hex)::BIGINT draws; string semantics of substr/
# concat/md5 match Spark's exactly on this ASCII corpus).
_DIRTY_SQL = f"""
    dirty AS (
        SELECT c_custkey * 10 AS record_id, c_name AS name,
               md5(CAST(c_custkey AS VARCHAR) || ':addr') AS addr,
               substr(md5(CAST(c_custkey AS VARCHAR) || ':ph'), 1, 10) AS phone,
               c_acctbal AS bal
        FROM customer
        UNION ALL
        SELECT c_custkey * 10 + 1, c_name,
               substr(addr0, 1, p1 - 1) || '~' || substr(addr0, p1 + 1, 32),
               phone0, c_acctbal
        FROM (
            SELECT c_custkey, c_name, c_acctbal,
                   md5(CAST(c_custkey AS VARCHAR) || ':addr') AS addr0,
                   substr(md5(CAST(c_custkey AS VARCHAR) || ':ph'), 1, 10) AS phone0,
                   2 + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':v1p'), 1, 6))::BIGINT % 5 AS INT) AS p1
            FROM customer
            WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':v1g'), 1, 6))::BIGINT % 100 < {ER_V1_PCT}
        )
        UNION ALL
        SELECT c_custkey * 10 + 2, c_name,
               substr(addr0, 1, p2 - 1) || '~' || substr(addr0, p2 + 1, 32),
               substr(phone0, 1, 9) || '~', c_acctbal
        FROM (
            SELECT c_custkey, c_name, c_acctbal,
                   md5(CAST(c_custkey AS VARCHAR) || ':addr') AS addr0,
                   substr(md5(CAST(c_custkey AS VARCHAR) || ':ph'), 1, 10) AS phone0,
                   28 + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':v2p'), 1, 6))::BIGINT % 5 AS INT) AS p2
            FROM customer
            WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':v2g'), 1, 6))::BIGINT % 100 < {ER_V2_PCT}
        )
    )
"""

_PAIRS_SQL = f"""
    keyed AS (
        SELECT *, substr(addr, 1, {ER_BLOCK_WIDTH}) AS bk_pre,
               substr(addr, 27, {ER_BLOCK_WIDTH}) AS bk_suf
        FROM dirty
    ),
    pairs AS (
        SELECT DISTINCT a.record_id AS record_a, b.record_id AS record_b,
               CAST(levenshtein(a.addr, b.addr) AS INT) AS addr_dist,
               CAST(levenshtein(a.phone, b.phone) AS INT) AS phone_dist
        FROM keyed a JOIN keyed b
          ON a.bk_pre = b.bk_pre AND a.record_id < b.record_id
        WHERE levenshtein(a.addr, b.addr) <= {ER_ADDR_MAX_DIST}
          AND levenshtein(a.phone, b.phone) <= {ER_PHONE_MAX_DIST}
        UNION
        SELECT DISTINCT a.record_id, b.record_id,
               CAST(levenshtein(a.addr, b.addr) AS INT),
               CAST(levenshtein(a.phone, b.phone) AS INT)
        FROM keyed a JOIN keyed b
          ON a.bk_suf = b.bk_suf AND a.record_id < b.record_id
        WHERE levenshtein(a.addr, b.addr) <= {ER_ADDR_MAX_DIST}
          AND levenshtein(a.phone, b.phone) <= {ER_PHONE_MAX_DIST}
    )
"""


def _dirty_checkpointed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirty corpus parquet-checkpointed ONCE per invocation (r14
    optimization round). The lazy `_dirty_records` frame is referenced by
    both sides of both blocked self-joins plus the canon and survivorship
    joins, and Spark re-derives the 3-way customer union (with its md5
    corruption expressions) under every reference — the before-plan
    carries 15 customer scans. One small write collapses them to one
    derivation; every consumer reads the parquet (measured 2.96 → 2.0 s
    at sf0.1 for er_golden_record)."""
    import os

    from dblp_to_csv_spark.session import checkpoint_base

    path = os.path.join(checkpoint_base(spark, None, "_er_dirty_"), "dirty")
    _dirty_records(spark, sf_dir).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _with_block_keys(dirty: DataFrame) -> DataFrame:
    return dirty.withColumn("bk_pre", F.substring("addr", 1, ER_BLOCK_WIDTH)).withColumn(
        "bk_suf", F.substring("addr", 27, ER_BLOCK_WIDTH)
    )


def _field_match(a, b):  # the per-field verify conjunction, one definition
    return (F.levenshtein(a("addr"), b("addr")) <= ER_ADDR_MAX_DIST) & (
        F.levenshtein(a("phone"), b("phone")) <= ER_PHONE_MAX_DIST
    )


def match_pairs_from_dirty(dirty: DataFrame) -> DataFrame:
    """Blocked candidate pairs (record_a < record_b) that pass the per-field
    verify, with their distances. Two equi-join passes unioned + distinct —
    never an OR-join (Spark would plan that as a filtered cross join).
    Exposed over an arbitrary dirty frame so the incremental store's parity
    tests can run batch semantics on any ingested prefix."""
    keyed = _with_block_keys(dirty).select(
        "record_id", "addr", "phone", "bk_pre", "bk_suf"
    )

    def one_pass(key: str) -> DataFrame:
        a = keyed.alias("a")
        b = keyed.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a.record_id") < F.col("b.record_id")),
            )
            .where(
                (F.levenshtein(F.col("a.addr"), F.col("b.addr")) <= ER_ADDR_MAX_DIST)
                & (F.levenshtein(F.col("a.phone"), F.col("b.phone")) <= ER_PHONE_MAX_DIST)
            )
            .select(
                F.col("a.record_id").alias("record_a"),
                F.col("b.record_id").alias("record_b"),
                F.levenshtein(F.col("a.addr"), F.col("b.addr")).cast("int").alias("addr_dist"),
                F.levenshtein(F.col("a.phone"), F.col("b.phone"))
                .cast("int")
                .alias("phone_dist"),
            )
        )

    return one_pass("bk_pre").union(one_pass("bk_suf")).distinct()


@register(
    "er_match_pairs",
    tags=("entity-resolution", "blocking", "fuzzy-join"),
    oracle=f"""
        WITH {_DIRTY_SQL.strip()}, {_PAIRS_SQL.strip()}
        SELECT record_a, record_b, addr_dist, phone_dist FROM pairs
    """,
)
def er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The match-pair stage exposed: every blocked pair passing the
    per-field edit-distance conjunction, with distances."""
    return match_pairs_from_dirty(_dirty_checkpointed(spark, sf_dir))


@register(
    "er_golden_record",
    tags=("entity-resolution", "survivorship", "composite"),
    oracle=f"""
        WITH {_DIRTY_SQL.strip()}, {_PAIRS_SQL.strip()},
        both_dirs AS (
            SELECT record_a AS rid, record_b AS nb FROM pairs
            UNION ALL
            SELECT record_b, record_a FROM pairs
        ),
        canon AS (
            SELECT d.record_id,
                   LEAST(d.record_id, COALESCE(MIN(p.nb), d.record_id)) AS canonical_id
            FROM dirty d LEFT JOIN both_dirs p ON p.rid = d.record_id
            GROUP BY d.record_id
        )
        SELECT c.canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               MIN(d.name) AS golden_name,
               MIN(d.addr) AS golden_address,
               MIN(d.phone) AS golden_phone,
               ROUND(SUM(d.bal), 2) AS balance_total
        FROM canon c JOIN dirty d ON d.record_id = c.record_id
        GROUP BY c.canonical_id
    """,
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ER composite: dirty corpus -> blocked fuzzy match -> 1-hop min
    canonical -> field-wise survivorship merge, every rule a plain keyed
    aggregate. MIN survivorship on addr/phone provably recovers the
    UNCORRUPTED value: the corruption char '~' (0x7E) sorts above the
    entire hex alphabet, so any corrupted string compares greater than its
    base at the replacement position. balance_total = ROUND(SUM, 2) of
    2-dp inputs — identity rounding, no half-boundary exposure (registry
    header contract)."""
    return golden_from_dirty(_dirty_checkpointed(spark, sf_dir))


def golden_from_dirty(dirty: DataFrame) -> DataFrame:
    """Batch golden-record semantics over an arbitrary dirty frame — the
    ground truth the incremental er_store parity tests pin against at every
    ingested prefix."""
    pairs = match_pairs_from_dirty(dirty)
    both_dirs = pairs.select(
        F.col("record_a").alias("rid"), F.col("record_b").alias("nb")
    ).unionByName(pairs.select(F.col("record_b").alias("rid"), F.col("record_a").alias("nb")))
    canon = (
        dirty.select("record_id")
        .join(both_dirs, dirty["record_id"] == both_dirs["rid"], "left")
        .groupBy("record_id")
        .agg(F.least(F.col("record_id"), F.coalesce(F.min("nb"), F.col("record_id"))).alias("canonical_id"))
    )
    return (
        canon.join(dirty, "record_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.min("name").alias("golden_name"),
            F.min("addr").alias("golden_address"),
            F.min("phone").alias("golden_phone"),
            F.round(F.sum("bal"), 2).alias("balance_total"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental entity resolution (r14): the golden-record pipeline as a
# continuous-ingest store. New records probe the persistent block indexes
# (two narrow tables partitioned by a 2-hex-char bucket of each blocking
# key — PartitionFilters prune the scan to the batch's buckets), verify the
# per-field conjunction JVM-side, and join existing clusters in place.
#
# The repair that keeps this exact is O(batch matches), not corpus-sized:
# 1-hop min canonicals are MONOTONE under record arrival (records are never
# deleted, so a new neighbor can only lower a canonical), which gives
#     new_canon(s) = least(old_canon(s), min(new matching record_id))
# — an O(1) update per matched store record, no neighbor-set rescan. The
# canon table is append-only; the current canonical of a record is the MIN
# over its appended rows (monotonicity again), so reads need no
# latest-by-seq window. Replay is idempotent by record_id: a batch first
# anti-joins against the bucket-pruned records index.
#
# Sequential == batch is the contract: after any batching/ordering of the
# dirty corpus (bases after their variants included — the re-election
# cascade), er_store_current() must equal golden_from_dirty() over
# everything ingested (tests/test_er_incremental.py).
# ---------------------------------------------------------------------------

ER_STORE_BUCKETS = 16  # records/canon partition fan-out (pmod(record_id))

_ER_REC_SCHEMA = "record_id long, name string, addr string, phone string, bal double, rb int"
_ER_BLOCK_SCHEMA = "record_id long, addr string, phone string, bk string, pb int"
_ER_CANON_SCHEMA = "record_id long, canonical long, rb int"
_ER_PAIR_SCHEMA = "record_a long, record_b long, addr_dist int, phone_dist int"


def _er_paths(store_dir: str) -> tuple[str, str, str, str, str]:
    import os

    return (
        os.path.join(store_dir, "records"),
        os.path.join(store_dir, "blocks_pre"),
        os.path.join(store_dir, "blocks_suf"),
        os.path.join(store_dir, "canon"),
        os.path.join(store_dir, "pairs"),
    )


def _er_read(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema)
        raise


def er_store_init(spark: SparkSession, store_dir: str) -> None:
    rec, pre, suf, canon, pairs = _er_paths(store_dir)
    spark.createDataFrame([], _ER_REC_SCHEMA).write.mode("overwrite").partitionBy(
        "rb"
    ).parquet(rec)
    for p in (pre, suf):
        spark.createDataFrame([], _ER_BLOCK_SCHEMA).write.mode("overwrite").partitionBy(
            "pb"
        ).parquet(p)
    spark.createDataFrame([], _ER_CANON_SCHEMA).write.mode("overwrite").partitionBy(
        "rb"
    ).parquet(canon)
    spark.createDataFrame([], _ER_PAIR_SCHEMA).write.mode("overwrite").parquet(pairs)


def _pb(col):  # 2-hex-char bucket of a blocking key -> 256 partitions
    return F.conv(F.substring(col, 1, 2), 16, 10).cast("int")


def _probe_blocks(
    spark: SparkSession, path: str, batch_keyed: DataFrame, key: str
) -> DataFrame:
    """Bucket-pruned probe of one block index: store rows sharing a blocking
    key with the batch, verified by the per-field conjunction. Returns
    (store record_id 'sid', batch record_id 'bid', distances)."""
    buckets = [
        int(r[0])
        for r in batch_keyed.select(_pb(F.col(key)).alias("pb")).distinct().collect()
    ]
    if not buckets:
        return spark.createDataFrame([], "sid long, bid long, addr_dist int, phone_dist int")
    idx = _er_read(spark, path, _ER_BLOCK_SCHEMA).filter(F.col("pb").isin(buckets))
    b = batch_keyed.select(
        F.col("record_id").alias("bid"),
        F.col("addr").alias("b_addr"),
        F.col("phone").alias("b_phone"),
        F.col(key).alias("bk"),
    )
    return (
        idx.join(F.broadcast(b), "bk")
        .where(
            (F.levenshtein(F.col("addr"), F.col("b_addr")) <= ER_ADDR_MAX_DIST)
            & (F.levenshtein(F.col("phone"), F.col("b_phone")) <= ER_PHONE_MAX_DIST)
        )
        .select(
            F.col("record_id").alias("sid"),
            "bid",
            F.levenshtein(F.col("addr"), F.col("b_addr")).cast("int").alias("addr_dist"),
            F.levenshtein(F.col("phone"), F.col("b_phone")).cast("int").alias("phone_dist"),
        )
    )


def er_store_append(spark: SparkSession, new_records: DataFrame, store_dir: str) -> dict:
    """Resolve one batch of dirty records against the store and ingest them.
    Returns counts {'ingested', 'store_matches', 'batch_matches',
    'repaired'}. Batch-sized driver state only: the bucket lists, the match
    edges (batch x matches), and the canonical updates.

    Identity contract: records are immutable by record_id — a record_id
    already in the store is skipped wholesale (idempotent replay), so an
    id re-sent with DIFFERENT field values is treated as a replay, not a
    revision (the pretrain-store conflicting-key problem is out of scope
    here; route revisions through a new record_id)."""
    rec_p, pre_p, suf_p, canon_p, pairs_p = _er_paths(store_dir)

    batch = _with_block_keys(
        new_records.select("record_id", "name", "addr", "phone", "bal")
    )
    # Idempotent replay: drop record_ids already ingested (bucket-pruned probe).
    batch_ids = [int(r[0]) for r in batch.select("record_id").distinct().collect()]
    if not batch_ids:
        return {"ingested": 0, "store_matches": 0, "batch_matches": 0, "repaired": 0}
    rbuckets = sorted({i % ER_STORE_BUCKETS for i in batch_ids})
    seen = (
        _er_read(spark, rec_p, _ER_REC_SCHEMA)
        .filter(F.col("rb").isin(rbuckets))
        .join(
            F.broadcast(spark.createDataFrame([(i,) for i in batch_ids], "record_id long")),
            "record_id",
            "left_semi",
        )
    )
    seen_ids = {int(r[0]) for r in seen.select("record_id").collect()}
    fresh = [i for i in batch_ids if i not in seen_ids]
    if not fresh:
        return {"ingested": 0, "store_matches": 0, "batch_matches": 0, "repaired": 0}
    batch = batch.join(
        F.broadcast(spark.createDataFrame([(i,) for i in fresh], "record_id long")),
        "record_id",
        "left_semi",
    )

    # Match edges: batch vs store (two pruned index probes) + batch vs batch
    # (the two-pass blocking on the batch alone). Collected driver-side —
    # batch-x-duplicate-density sized, the cc_store_append budget class.
    store_edges = (
        _probe_blocks(spark, pre_p, batch, "bk_pre")
        .unionByName(_probe_blocks(spark, suf_p, batch, "bk_suf"))
        .distinct()
        .collect()
    )
    batch_edges = match_pairs_from_dirty(
        batch.select("record_id", "name", "addr", "phone", "bal")
    ).collect()

    # Canonicals for the new records: least(self, direct neighbors).
    neigh: dict[int, int] = {}

    def _see(a: int, b: int) -> None:
        neigh[a] = min(neigh.get(a, a), b)

    for e in store_edges:
        _see(int(e["bid"]), int(e["sid"]))
    for e in batch_edges:
        _see(int(e["record_a"]), int(e["record_b"]))
        _see(int(e["record_b"]), int(e["record_a"]))
    new_canon = [(i, min(i, neigh.get(i, i))) for i in fresh]

    # O(1) repair per matched store record: new neighbors only ever lower a
    # 1-hop min canonical (monotone under arrival), and the canon table is
    # append-only with MIN-on-read, so the repair row is just (sid, bid).
    repairs = {}
    for e in store_edges:
        sid, bid = int(e["sid"]), int(e["bid"])
        repairs[sid] = min(repairs.get(sid, bid), bid)
    repair_rows = [(s, c) for s, c in repairs.items() if c < s]

    # Stage-then-append: the probes above are already materialized
    # (collected), so index appends cannot feed back into this batch.
    batch.select(
        "record_id", "name", "addr", "phone", "bal",
        F.pmod(F.col("record_id"), F.lit(ER_STORE_BUCKETS)).cast("int").alias("rb"),
    ).write.mode("append").partitionBy("rb").parquet(rec_p)
    for path, key in ((pre_p, "bk_pre"), (suf_p, "bk_suf")):
        batch.select(
            "record_id", "addr", "phone",
            F.col(key).alias("bk"), _pb(F.col(key)).alias("pb"),
        ).write.mode("append").partitionBy("pb").parquet(path)
    canon_rows = new_canon + repair_rows
    spark.createDataFrame(canon_rows, "record_id long, canonical long").withColumn(
        "rb", F.pmod(F.col("record_id"), F.lit(ER_STORE_BUCKETS)).cast("int")
    ).write.mode("append").partitionBy("rb").parquet(canon_p)
    pair_rows = [
        (min(int(e["sid"]), int(e["bid"])), max(int(e["sid"]), int(e["bid"])),
         int(e["addr_dist"]), int(e["phone_dist"]))
        for e in store_edges
    ] + [
        (int(e["record_a"]), int(e["record_b"]), int(e["addr_dist"]), int(e["phone_dist"]))
        for e in batch_edges
    ]
    if pair_rows:
        spark.createDataFrame(sorted(set(pair_rows)), _ER_PAIR_SCHEMA).write.mode(
            "append"
        ).parquet(pairs_p)
    return {
        "ingested": len(fresh),
        "store_matches": len(store_edges),
        "batch_matches": len(batch_edges),
        "repaired": len(repair_rows),
    }


def er_store_current(spark: SparkSession, store_dir: str) -> DataFrame:
    """The golden records over everything ingested — row-identical to
    golden_from_dirty() on the union of all appended batches."""
    rec_p, _, _, canon_p, _ = _er_paths(store_dir)
    recs = _er_read(spark, rec_p, _ER_REC_SCHEMA)
    canon = (
        _er_read(spark, canon_p, _ER_CANON_SCHEMA)
        .groupBy("record_id")
        .agg(F.min("canonical").alias("canonical_id"))
    )
    return (
        recs.join(canon, "record_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.min("name").alias("golden_name"),
            F.min("addr").alias("golden_address"),
            F.min("phone").alias("golden_phone"),
            F.round(F.sum("bal"), 2).alias("balance_total"),
        )
    )


def er_store_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """All match pairs discovered so far (record_a < record_b) — equal to
    match_pairs_from_dirty() over everything ingested: each pair is found
    exactly once, when its LATER record arrives (or in-batch)."""
    _, _, _, _, pairs_p = _er_paths(store_dir)
    return _er_read(spark, pairs_p, _ER_PAIR_SCHEMA).distinct()


def er_store_compact(spark: SparkSession, store_dir: str) -> None:
    """Declared amortized rewrite (the cc_store_compact analogue): per-batch
    appends accumulate small files, and the canon table accumulates repair
    history rows. Compaction collapses canon to its MIN row per record and
    rewrites every table stage-then-swap (a reader of the swapped store sees
    either the old or the new complete table, never a mix). Run on the same
    amortized trigger discipline as the other stores — e.g. appended-batch
    count or canon-history fraction — never per batch."""
    import shutil

    rec_p, pre_p, suf_p, canon_p, pairs_p = _er_paths(store_dir)
    for path, schema, part in (
        (rec_p, _ER_REC_SCHEMA, "rb"),
        (pre_p, _ER_BLOCK_SCHEMA, "pb"),
        (suf_p, _ER_BLOCK_SCHEMA, "pb"),
        (pairs_p, _ER_PAIR_SCHEMA, None),
    ):
        df = _er_read(spark, path, schema)
        if path == pairs_p:
            df = df.distinct()
        tmp = path + "_compact"
        w = df.write.mode("overwrite")
        (w.partitionBy(part) if part else w).parquet(tmp)
        out = spark.read.schema(schema).parquet(tmp)
        w2 = out.write.mode("overwrite")
        (w2.partitionBy(part) if part else w2).parquet(path)
        shutil.rmtree(tmp, ignore_errors=True)
    canon = (
        _er_read(spark, canon_p, _ER_CANON_SCHEMA)
        .groupBy("record_id")
        .agg(F.min("canonical").alias("canonical"))
        .withColumn("rb", F.pmod(F.col("record_id"), F.lit(ER_STORE_BUCKETS)).cast("int"))
    )
    tmp = canon_p + "_compact"
    canon.write.mode("overwrite").partitionBy("rb").parquet(tmp)
    spark.read.schema(_ER_CANON_SCHEMA).parquet(tmp).write.mode(
        "overwrite"
    ).partitionBy("rb").parquet(canon_p)
    shutil.rmtree(tmp, ignore_errors=True)
