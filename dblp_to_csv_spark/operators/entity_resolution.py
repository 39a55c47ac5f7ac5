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
from dblp_to_csv_spark.sources.tables import load_table

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


def _match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs (record_a < record_b) that pass the per-field
    verify, with their distances. Two equi-join passes unioned + distinct —
    never an OR-join (Spark would plan that as a filtered cross join)."""
    dirty = _dirty_records(spark, sf_dir)
    keyed = dirty.select(
        "record_id",
        "addr",
        "phone",
        F.substring("addr", 1, ER_BLOCK_WIDTH).alias("bk_pre"),
        F.substring("addr", 27, ER_BLOCK_WIDTH).alias("bk_suf"),
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
    return _match_pairs(spark, sf_dir)


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
    dirty = _dirty_records(spark, sf_dir)
    pairs = _match_pairs(spark, sf_dir)
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
