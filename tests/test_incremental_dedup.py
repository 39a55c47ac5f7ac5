"""Incremental dedup against a persistent fingerprint index
(operators/incremental.py): batch-over-batch accept/reject semantics, index
growth, read-your-own-append stability, and partition-pruned index probes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.incremental import (
    exact_dedup_incremental,
    minhash_dedup_incremental,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXT_A = "the quick brown fox jumps over the lazy dog near the river bank today"
TEXT_B = "completely different content about spark shuffles and partition pruning"
TEXT_C = "yet another unique document discussing minhash signatures and bands"
# near-dup of TEXT_A: one word changed at the end (most shingles shared)
TEXT_A_NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"


def test_exact_incremental_batches(spark, tmp_path):
    idx = str(tmp_path / "fp_index")
    b1 = exact_dedup_incremental(
        spark,
        _docs(spark, [(1, TEXT_A), (2, TEXT_B), (3, TEXT_A)]),  # 3 dups 1 in-batch
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    assert sorted(r["doc_id"] for r in b1.collect()) == [1, 2]
    # batch 2: one historical dup, one new
    b2 = exact_dedup_incremental(
        spark,
        _docs(spark, [(10, TEXT_A), (11, TEXT_C)]),
        idx,
        staging_dir=str(tmp_path / "s2"),
    )
    assert sorted(r["doc_id"] for r in b2.collect()) == [11]
    # stability: consuming b1 AFTER the index grew must not change it
    assert sorted(r["doc_id"] for r in b1.collect()) == [1, 2]
    # index holds exactly the 3 accepted fingerprints
    assert spark.read.parquet(idx).count() == 3


def test_exact_incremental_first_batch_creates_index(spark, tmp_path):
    idx = str(tmp_path / "fresh")
    out = exact_dedup_incremental(
        spark, _docs(spark, [(5, TEXT_B)]), idx, staging_dir=str(tmp_path / "s")
    )
    assert [r["doc_id"] for r in out.collect()] == [5]
    assert spark.read.parquet(idx).count() == 1


def test_exact_probe_prunes_index_partitions(spark, tmp_path):
    """The index probe must reach the scan as PartitionFilters on the
    fingerprint prefix — the property that keeps the probe cost proportional
    to the BATCH, not the index."""
    idx = str(tmp_path / "fp_index")
    exact_dedup_incremental(
        spark,
        _docs(spark, [(i, f"document number {i} padding content") for i in range(50)]),
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    batch = _docs(spark, [(100, TEXT_A)])
    fp = F.md5("text")
    prefixes = [
        r[0]
        for r in batch.select(F.substring(fp, 1, 2).alias("p")).distinct().collect()
    ]
    plan = (
        spark.read.parquet(idx)
        .filter(F.col("prefix").isin(prefixes))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "prefix" in m.group(1), plan[:500]


def test_minhash_incremental_batches(spark, tmp_path):
    idx = str(tmp_path / "mh_index")
    b1 = minhash_dedup_incremental(
        spark,
        _docs(spark, [(1, TEXT_A), (2, TEXT_B)]),
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    assert sorted(r["doc_id"] for r in b1.collect()) == [1, 2]
    # batch 2: a near-dup of historical TEXT_A is rejected, a new doc and an
    # in-batch near-dup pair keep only the first
    b2 = minhash_dedup_incremental(
        spark,
        _docs(spark, [(10, TEXT_A_NEAR), (11, TEXT_C), (12, TEXT_C + " extra")]),
        idx,
        staging_dir=str(tmp_path / "s2"),
    )
    accepted = sorted(r["doc_id"] for r in b2.collect())
    assert 10 not in accepted  # near-dup of history
    assert 11 in accepted
    assert 12 not in accepted  # in-batch near-dup of 11 (keep-first)
    # index holds bands only for accepted docs
    idx_docs = {
        r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 2, 11}


def test_minhash_incremental_estimator_matches_batch_semantics(spark, tmp_path):
    """A document with NO shared shingles must always be accepted — the
    signature estimate can only reject on real slot collisions."""
    idx = str(tmp_path / "mh")
    minhash_dedup_incremental(
        spark, _docs(spark, [(1, TEXT_A)]), idx, staging_dir=str(tmp_path / "s1")
    )
    out = minhash_dedup_incremental(
        spark, _docs(spark, [(2, TEXT_B)]), idx, staging_dir=str(tmp_path / "s2")
    )
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_streaming_foreachbatch_incremental_dedup(spark, tmp_path):
    """The production composition: a document STREAM deduplicates each
    microbatch against the persistent fingerprint index via foreachBatch —
    exactly-once accept across microbatches, duplicates arriving later are
    dropped against history the stream itself built."""
    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    import json as _json

    def land(name, rows):
        (src / name).write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    land("b1.json", [(1, TEXT_A), (2, TEXT_B)])

    def handle(batch_df, batch_id):
        accepted = exact_dedup_incremental(
            spark,
            batch_df,
            idx,
            staging_dir=str(tmp_path / f"stage_{batch_id}"),
        )
        accepted.write.mode("append").parquet(lake)

    def run_once():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(lake).collect()
    ) == [1, 2]
    # second microbatch: one historical dup, one new doc
    land("b2.json", [(10, TEXT_A), (11, TEXT_C)])
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(lake).collect()
    ) == [1, 2, 11]


def test_minhash_incremental_accepts_shingleless_docs(spark, tmp_path):
    """A document too short to shingle has no signature — it can never
    near-dup anything, so it must be ACCEPTED, not silently lost (review
    finding: explode drops empty shingle arrays)."""
    idx = str(tmp_path / "mh")
    out = minhash_dedup_incremental(
        spark,
        _docs(spark, [(1, "hello world"), (2, TEXT_A)]),
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]
    # and it contributes no index rows (nothing to band)
    idx_docs = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
    assert idx_docs == {2}


def test_exact_incremental_shared_staging_dir_stays_stable(spark, tmp_path):
    """One persistent staging_dir across batches: batch 2 must not overwrite
    batch 1's staged files — the earlier returned frame stays stable."""
    idx = str(tmp_path / "idx")
    stage = str(tmp_path / "stage")  # SAME dir for both batches
    b1 = exact_dedup_incremental(
        spark, _docs(spark, [(1, TEXT_A)]), idx, staging_dir=stage
    )
    b2 = exact_dedup_incremental(
        spark, _docs(spark, [(2, TEXT_B)]), idx, staging_dir=stage
    )
    assert [r["doc_id"] for r in b1.collect()] == [1]
    assert [r["doc_id"] for r in b2.collect()] == [2]


def test_exact_incremental_null_text_dedups_across_batches(spark, tmp_path):
    """NULL text must behave like any other fingerprint: the first null-text
    doc is accepted, later ones (same or later batches) are duplicates —
    null join keys would otherwise never match under 3VL."""
    idx = str(tmp_path / "idx")
    b1 = exact_dedup_incremental(
        spark,
        spark.createDataFrame([(5, None), (6, TEXT_A)], "doc_id long, text string"),
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    assert sorted(r["doc_id"] for r in b1.collect()) == [5, 6]
    b2 = exact_dedup_incremental(
        spark,
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        idx,
        staging_dir=str(tmp_path / "s2"),
    )
    assert b2.count() == 0


def test_exact_incremental_digit_only_first_batch(spark, tmp_path):
    """Regression: when every partition dir written so far is digit-only hex
    (md5 prefix is digit-only with p≈0.39, so small first batches hit this
    often), schema INFERENCE would type the ``prefix`` partition column as
    INTEGER — a later alphabetic-prefix probe then dies in CAST_INVALID_INPUT
    and leading-zero prefixes round-trip as 7 != '07'. The index read uses
    the explicit schema, so both batches must work and leading-zero dirs must
    dedup correctly."""
    # md5 prefixes (verified): '15' (digit), '05' (leading zero), 'e4' (alpha)
    digit_t = "synthetic digit prefix doc 0"
    zero_t = "synthetic digit prefix doc 78"
    alpha_t = "synthetic digit prefix doc 2"
    idx = str(tmp_path / "idx")
    b1 = exact_dedup_incremental(
        spark,
        _docs(spark, [(1, digit_t), (2, zero_t)]),
        idx,
        staging_dir=str(tmp_path / "s1"),
    )
    assert sorted(r["doc_id"] for r in b1.collect()) == [1, 2]
    # batch 2 mixes an alphabetic prefix with re-probes of both digit dirs
    b2 = exact_dedup_incremental(
        spark,
        _docs(spark, [(10, alpha_t), (11, digit_t), (12, zero_t)]),
        idx,
        staging_dir=str(tmp_path / "s2"),
    )
    assert sorted(r["doc_id"] for r in b2.collect()) == [10]
    # batch 3: the alpha doc is now historical too
    b3 = exact_dedup_incremental(
        spark,
        _docs(spark, [(20, alpha_t)]),
        idx,
        staging_dir=str(tmp_path / "s3"),
    )
    assert b3.count() == 0
