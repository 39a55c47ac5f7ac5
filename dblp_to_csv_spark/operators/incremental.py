"""Incremental deduplication against a PERSISTENT fingerprint index — the
continuous-ingest shape. A 100 TB corpus is not re-deduplicated per batch:
the pipeline maintains a compact index of what it has already accepted
(32-byte exact fingerprints; MinHash signatures for near-dup) and each new
batch checks itself against that index, then appends its own fingerprints.

Design rules that make this hold at scale:

* the INDEX is the big side and is never broadcast, never reshuffled: it is
  parquet partitioned by fingerprint prefix (exact) / band (near-dup), so a
  batch's probe prunes to the partitions its own keys live in
  (PartitionFilters on the scan — plan-asserted in
  tests/test_incremental_dedup.py);
* the BATCH is the small side by definition (a day's crawl vs years of
  corpus) and broadcasts;
* accepted rows are staged to parquet BEFORE their fingerprints append to
  the index — the returned frame reads from the immutable staging files, so
  consuming it after the index has grown cannot re-evaluate the anti-join
  against an index that now contains the batch itself (the classic
  read-your-own-append hazard of lazy plans);
* near-dup verification uses the SIGNATURE similarity estimate (fraction of
  matching minhash slots — the standard index-side verifier: the index
  stores K×5-byte signatures, never documents or shingle sets).

These are stateful I/O operators (library functions + pytest), not
registered queries: a DuckDB oracle has no side-effect contract to mirror.
Fingerprint/signature constructions reuse the oracle-checked ones from
operators/dedup.py, so the batch-mode queries remain their semantics
ground truth.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.session import session_checkpoint_dir

from dblp_to_csv_spark.functions.text import shingles, words
from dblp_to_csv_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_B,
    MINHASH_K,
    MINHASH_R,
)

_PREFIX_LEN = 2  # 256 partitions: fine to thousands of index files per prefix


def _stage(df: DataFrame, staging_dir: str | None, name: str) -> DataFrame:
    """Materialize ``df`` to immutable parquet and return the re-read — the
    stability barrier between 'decide what to accept' and 'grow the index'.
    Each call writes a FRESH unique subdirectory, so one persistent
    ``staging_dir`` can safely serve successive batches: a later batch can
    never overwrite the files an earlier batch's returned frame reads."""
    import uuid

    out = os.path.join(
        staging_dir or session_checkpoint_dir("_dedup_stage_"),
        f"{name}_{uuid.uuid4().hex}",
    )
    df.write.mode("overwrite").parquet(out)
    return df.sparkSession.read.parquet(out)


def _read_index(spark: SparkSession, index_dir: str, schema_ddl: str) -> DataFrame:
    """Read the index with the EXPLICIT schema, never inference. The schema
    matters for the partition column specifically: with inference, a young
    index whose partition dirs happen to all be digit-only hex (p≈0.39 per
    md5 prefix) types ``prefix`` as INTEGER — a later batch containing an
    alphabetic prefix then crashes the isin probe with CAST_INVALID_INPUT,
    and leading-zero prefixes round-trip as 7 != '07'. Explicit schemas keep
    partition pruning (PartitionFilters still appear on the scan — asserted
    in tests/test_incremental_dedup.py)."""
    try:
        return spark.read.schema(schema_ddl).parquet(index_dir)
    except Exception as e:
        # first batch: the index does not exist yet
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], schema_ddl)
        raise


def exact_dedup_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    staging_dir: str | None = None,
) -> DataFrame:
    """Accept the subset of ``new_docs`` (doc_id, text) whose content
    fingerprint md5(text) is new — against the persistent index AND within
    the batch (keep-lowest-doc_id) — then append the accepted fingerprints
    to the index. Returns the accepted (doc_id, fp) frame (staged parquet;
    stable to consume at any time).

    Probe shape: the batch collapses to one fingerprint row each (exact
    dedup's 32-byte key), broadcasts against the index scan, which prunes to
    the ≤256 prefix partitions present in the batch — the index is read
    partition-pruned and never moved.

    NULL text fingerprints to the sentinel 'NULL' (not a 32-hex md5, so it
    cannot collide with real content): null keys would silently fail both
    the cross-batch equality probe and the prefix IN-filter under
    three-valued logic, accepting every null-text doc forever."""
    fp = F.when(F.col("text").isNull(), F.lit("NULL")).otherwise(F.md5("text"))
    batch = (
        new_docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .withColumn("prefix", F.substring("fp", 1, _PREFIX_LEN))
    )
    prefixes = [r["prefix"] for r in batch.select("prefix").distinct().collect()]
    index = _read_index(
        spark, index_dir, "fp string, prefix string"
    ).filter(F.col("prefix").isin(prefixes) if prefixes else F.lit(False))
    # matched fingerprints are ≤ batch-size (tiny) — the only thing that
    # leaves the index scan
    matched = index.join(
        F.broadcast(batch.select("fp")), "fp", "left_semi"
    ).select("fp")
    accepted = _stage(
        batch.join(F.broadcast(matched), "fp", "left_anti"),
        staging_dir,
        "exact_accepted",
    )
    accepted.select("fp", "prefix").write.mode("append").partitionBy(
        "prefix"
    ).parquet(index_dir)
    return accepted.select("doc_id", "fp")


def _minhash_signature(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash signature (doc_id, h0..h{K-1}) — the identical
    md5-slice construction the oracle-checked batch path uses
    (operators/dedup.py::minhash_lsh_pairs)."""
    sh = docs.select("doc_id", words("text").alias("w")).select(
        "doc_id", F.explode(shingles(F.col("w"))).alias("shingle")
    )
    hh = F.concat(
        F.md5(F.concat(F.lit("0|"), F.col("shingle"))),
        F.md5(F.concat(F.lit("1|"), F.col("shingle"))),
    )
    return (
        sh.select("doc_id", hh.alias("hh"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.substring(F.col("hh"), 1 + 5 * i, 5)).alias(f"h{i}")
                for i in range(MINHASH_K)
            ]
        )
    )


def _bands(sig: DataFrame) -> DataFrame:
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[F.col(f"h{b * MINHASH_R + r}") for r in range(MINHASH_R)]
                        ).alias("bandkey"),
                    )
                    for b in range(MINHASH_B)
                ]
            )
        ).alias("bk"),
        *[F.col(f"h{i}") for i in range(MINHASH_K)],
    ).select("doc_id", "bk.band", "bk.bandkey", *[f"h{i}" for i in range(MINHASH_K)])


def minhash_dedup_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    staging_dir: str | None = None,
) -> DataFrame:
    """Near-dup incremental accept: a new document is rejected when any
    historical (or earlier-in-batch) document shares an LSH band AND the
    signature-estimated Jaccard — the fraction of equal minhash slots —
    reaches ``threshold``. Accepted signatures append to the band index.
    Returns the accepted (doc_id,) frame (staged; stable).

    Index layout: one row per (band, bandkey, doc) carrying the K=12 5-byte
    signature slots, parquet-partitioned by band; the probe joins only the
    batch's band keys (broadcast) so the index scan prunes by band and
    filters bandkeys map-side. Verification is in-row arithmetic over the
    two signatures — the index never stores documents or shingle sets, and
    nothing corpus-sized shuffles."""
    # stage the batch's band/signature rows once: they are consumed by the
    # history probe, the in-batch self-join (twice), and the index append —
    # without the barrier the shingle/signature pipeline would re-run per
    # consumer
    batch_bands = _stage(_bands(_minhash_signature(new_docs)), staging_dir, "bands")
    hcols = [f"h{i}" for i in range(MINHASH_K)]
    index = _read_index(
        spark,
        index_dir,
        "doc_id long, bandkey string, "
        + ", ".join(f"{h} string" for h in hcols)
        + ", band int",
    )
    probe = F.broadcast(
        batch_bands.select("band", "bandkey", "doc_id", *hcols).withColumnsRenamed(
            {"doc_id": "new_id", **{h: f"n_{h}" for h in hcols}}
        )
    )
    est = (
        sum(
            F.when(F.col(h) == F.col(f"n_{h}"), 1).otherwise(0) for h in hcols
        )
        / float(MINHASH_K)
    )
    hist_hits = (
        index.join(probe, ["band", "bandkey"])
        .filter(est >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    # earlier-in-batch near-dups: same band join within the batch, keep-first
    a = batch_bands.alias("a")
    b = batch_bands.alias("b")
    est_ab = (
        sum(
            F.when(F.col(f"a.{h}") == F.col(f"b.{h}"), 1).otherwise(0)
            for h in hcols
        )
        / float(MINHASH_K)
    )
    batch_hits = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandkey") == F.col("b.bandkey"))
            & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .filter(est_ab >= threshold)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    rejected = hist_hits.union(batch_hits).distinct()
    # Accept-set is defined over ALL batch docs, not the signed ones: a doc
    # too short to shingle has no signature row (shingles() yields [] under
    # 3 words, and explode drops it), but it cannot near-dup anything — it
    # must be ACCEPTED, not silently lost. It contributes no index rows.
    accepted = _stage(
        new_docs.select("doc_id")
        .distinct()
        .join(F.broadcast(rejected), "doc_id", "left_anti"),
        staging_dir,
        "minhash_accepted",
    )
    batch_bands.join(F.broadcast(accepted), "doc_id", "left_semi").select(
        "doc_id", "bandkey", *hcols, "band"
    ).write.mode("append").partitionBy("band").parquet(index_dir)
    return accepted


def minhash_pairs_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    staging_dir: str | None = None,
) -> DataFrame:
    """CLUSTERING-mode sibling of minhash_dedup_incremental: emit the
    near-dup PAIRS a batch forms (against history and within itself) and
    index EVERY signed batch doc — nothing is rejected, because cluster
    maintenance wants future dups to link to any member. Feed the returned
    (doc_a, doc_b) frame to cc_store_append and the streaming near-dup
    chain runs end-to-end: signatures → banded candidates → signature-
    estimate verify → incremental components. Same probe shape as the
    dedup mode (band-pruned index scan vs broadcast batch; in-row
    verification; nothing corpus-sized shuffles)."""
    batch_bands = _stage(
        _bands(_minhash_signature(new_docs)), staging_dir, "pair_bands"
    )
    hcols = [f"h{i}" for i in range(MINHASH_K)]
    index = _read_index(
        spark,
        index_dir,
        "doc_id long, bandkey string, "
        + ", ".join(f"{h} string" for h in hcols)
        + ", band int",
    )
    probe = F.broadcast(
        batch_bands.select("band", "bandkey", "doc_id", *hcols).withColumnsRenamed(
            {"doc_id": "new_id", **{h: f"n_{h}" for h in hcols}}
        )
    )
    est = (
        sum(
            F.when(F.col(h) == F.col(f"n_{h}"), 1).otherwise(0) for h in hcols
        )
        / float(MINHASH_K)
    )
    hist_hits = index.join(probe, ["band", "bandkey"]).filter(est >= threshold)
    # A doc_id re-ingested in a later batch matches ITSELF in the index
    # (estimate 1.0, least/greatest collapse): drop the self-pair, and
    # remember the id so its bands aren't appended a second time as
    # duplicate index rows (ADVICE r13). The band-pruned hit set is exactly
    # where an identical-signature re-ingest must appear, so no extra index
    # scan is needed.
    already_indexed = (
        hist_hits.filter(F.col("doc_id") == F.col("new_id"))
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    hist_pairs = (
        hist_hits.filter(F.col("doc_id") != F.col("new_id"))
        .select(
            F.least("doc_id", "new_id").alias("doc_a"),
            F.greatest("doc_id", "new_id").alias("doc_b"),
        )
    )
    a = batch_bands.alias("a")
    b = batch_bands.alias("b")
    est_ab = (
        sum(
            F.when(F.col(f"a.{h}") == F.col(f"b.{h}"), 1).otherwise(0)
            for h in hcols
        )
        / float(MINHASH_K)
    )
    batch_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandkey") == F.col("b.bandkey"))
            & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .filter(est_ab >= threshold)
        .select(
            F.col("b.doc_id").alias("doc_a"), F.col("a.doc_id").alias("doc_b")
        )
    )
    pairs = _stage(
        hist_pairs.union(batch_pairs).distinct(), staging_dir, "pairs_out"
    )
    # Stage the already-indexed id set BEFORE appending — its plan reads the
    # index dir, and the append below writes to it (read-your-own-append).
    already_indexed = _stage(already_indexed, staging_dir, "pair_already")
    batch_bands.join(F.broadcast(already_indexed), "doc_id", "left_anti").select(
        "doc_id", "bandkey", *hcols, "band"
    ).write.mode("append").partitionBy("band").parquet(index_dir)
    return pairs


def substring_dedup_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    staging_dir: str | None = None,
) -> DataFrame:
    """Window-level (exact-substring) incremental dedup: the batch's
    SPAN_WORDS-word sliding windows check against a persistent index of
    every window hash already accepted into the corpus — a window whose
    hash is historical is cut from ALL its batch occurrences; a window new
    to the corpus but repeated within the batch keeps only its batch-first
    occurrence (min (doc_id, pos), the batch operator's canonical rule).
    Returns the rewritten batch (doc_id, text_clean, n_words_dropped),
    staged; the batch's surviving (= previously unseen) window hashes
    append to the index.

    Sequential-equals-batch contract: running batches b1, b2 through this
    function equals running ``dedup_substring_rewrite`` once over b1 ∪ b2
    whenever b1's doc_ids sort below b2's — a historical hit is exactly "an
    earlier batch held the canonical occurrence" (pinned in
    tests/test_substring_dedup.py).

    Index shape: one row per distinct window hash, parquet-partitioned by
    2-hex prefix. This is the honest cost of substring-level continuous
    dedup — the index scales with the corpus's distinct windows (~one
    32-byte hash per word), the distributed analogue of the suffix-array
    index in single-node exact-substring dedup — but the probe stays
    batch-proportional: the batch's distinct hashes broadcast against the
    prefix-pruned index scan, and only matched hashes (≤ batch distinct)
    come back."""
    from dblp_to_csv_spark.operators.curation import (
        _span_window_base,
        noncanonical_marked,
        rewrite_from_marked,
    )

    base = _stage(
        _span_window_base(
            new_docs.select(
                "doc_id",
                words(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
            )
        ),
        staging_dir,
        "substr_windows",
    )
    occ = base.select("doc_id", F.posexplode("hashes").alias("pos", "h"))
    distinct_h = (
        occ.select("h")
        .distinct()
        .withColumn("prefix", F.substring("h", 1, _PREFIX_LEN))
    )
    prefixes = [
        r["prefix"] for r in distinct_h.select("prefix").distinct().collect()
    ]
    index = _read_index(spark, index_dir, "h string, prefix string").filter(
        F.col("prefix").isin(prefixes) if prefixes else F.lit(False)
    )
    matched = index.join(
        F.broadcast(distinct_h.select("h")), "h", "left_semi"
    ).select("h")
    matched = _stage(matched, staging_dir, "substr_matched")
    # historical hits cut ALL their batch occurrences; batch-internal dups
    # reuse the curation module's canonical-pick rule verbatim (ONE
    # definition of "first occurrence" — the sequential-equals-batch
    # contract depends on the two paths never drifting)
    marked_hist = occ.join(F.broadcast(matched), "h", "left_semi").select(
        "doc_id", "pos"
    )
    marked_batch = noncanonical_marked(occ, prepare=F.broadcast)
    marked = marked_hist.union(marked_batch).distinct()
    accepted = _stage(
        rewrite_from_marked(base, marked, attach=F.broadcast),
        staging_dir,
        "substr_accepted",
    )
    distinct_h.join(F.broadcast(matched), "h", "left_anti").select(
        "h", "prefix"
    ).write.mode("append").partitionBy("prefix").parquet(index_dir)
    return accepted


# --------------------------------------------------------------------------
# Streaming incremental ANN (r13, VERDICT r12 item 7): the persistent-index
# pattern composed with the IVF coarse quantizer — the continuous-ingest
# shape of the similarity family. The index is a cell-partitioned parquet
# vector store plus a k-row centroid table: new vectors PROBE the existing
# cells (partition-pruned scan, batch side broadcasts), then APPEND under
# the centroids trained earlier; cells re-train only on the DECLARED
# trigger (vector count past IVF_RETRAIN_GROWTH x the trained size), never
# implicitly — an unannounced re-cluster would silently move every
# historical vector's cell and invalidate external cell references.
#
# Determinism: centroid training reuses similarity.kmeans_centroids
# (md5-min seeds + one 6-dp-rounded Lloyd step) and assignment reuses
# similarity._nearest (6-dp rounded squared-L2, dist-then-cell tie-break),
# so index contents are a pure function of the trained corpus, and probe
# results of (index contents, query batch) — the property the pytest gate
# pins. Stateful I/O: no DuckDB oracle by design (COVERAGE.md exception).
# --------------------------------------------------------------------------
IVF_INDEX_NPROBE = 2
# Declared retrain trigger: the coarse quantizer was trained on n_trained
# vectors; once the store holds >= IVF_RETRAIN_GROWTH x that, cell-size
# balance has drifted enough that the caller should re-train. 2x matches
# the classic amortized-rebuild rule: total retrain cost stays O(N log N).
IVF_RETRAIN_GROWTH = 2.0


def _ivf_paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "centroids"),
        os.path.join(index_dir, "vectors"),
        os.path.join(index_dir, "meta"),
    )


def ivf_index_train(
    spark: SparkSession, vectors: DataFrame, index_dir: str, k: int | None = None
) -> None:
    """(Re)train the IVF index from ``vectors`` (vec_id, emb array<double>):
    deterministic k-means centroids (corpus-scaled k unless pinned), every
    vector assigned to its nearest cell, store rewritten parquet-partitioned
    by cell so probes prune to their cells' files. Rebuild is the EXPENSIVE
    path by design — it runs on the declared trigger, not per batch."""
    from dblp_to_csv_spark.operators.similarity import _nearest, kmeans_centroids

    cent_path, vec_path, meta_path = _ivf_paths(index_dir)
    cent = kmeans_centroids(vectors, k)
    cent.write.mode("overwrite").parquet(cent_path)
    cent = spark.read.parquet(cent_path)  # train once, assign from the artifact
    assigned = _nearest(vectors, cent, "cell")
    # Stage-then-swap (ADVICE r13): the natural retrain call reads ``vectors``
    # FROM this store (retrain-from-store, exercised in
    # tests/test_incremental_ann.py), so a direct overwrite is a
    # read-your-own-overwrite — it happens to work on this Spark build but
    # is version-fragile. Same pattern as cc_store_compact.
    tmp = vec_path + "_retrain"
    vectors.join(assigned, "vec_id").select("vec_id", "emb", "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").partitionBy("cell").parquet(
        vec_path
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    n = spark.read.parquet(vec_path).count()
    spark.createDataFrame([(n,)], "n_trained long").write.mode(
        "overwrite"
    ).parquet(meta_path)


def ivf_index_append(
    spark: SparkSession, new_vectors: DataFrame, index_dir: str
) -> bool:
    """Assign ``new_vectors`` to the EXISTING centroids (k-row broadcast, no
    retrain) and append them to the cell-partitioned store. Returns True
    when the declared retrain trigger fired — the caller then decides when
    to run ivf_index_train; the append itself never re-clusters."""
    from dblp_to_csv_spark.operators.similarity import _nearest

    cent_path, vec_path, meta_path = _ivf_paths(index_dir)
    cent = spark.read.parquet(cent_path)
    assigned = _nearest(new_vectors, cent, "cell")
    new_vectors.join(assigned, "vec_id").select("vec_id", "emb", "cell").write.mode(
        "append"
    ).partitionBy("cell").parquet(vec_path)
    # parquet row counts come from footers — a metadata read, not a scan
    n_now = spark.read.parquet(vec_path).count()
    n_trained = spark.read.parquet(meta_path).first()["n_trained"]
    return n_now >= IVF_RETRAIN_GROWTH * max(n_trained, 1)


def ivf_index_probe(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    top_k: int = 5,
    nprobe: int = IVF_INDEX_NPROBE,
) -> DataFrame:
    """Top-``top_k`` cosine neighbors of each query (vec_id, emb) among the
    INDEXED vectors, probing each query's ``nprobe`` nearest cells.

    Scale shape: centroids are k rows (broadcast); the query->cell probe map
    is batch x nprobe rows and BROADCASTS against the store scan, which
    prunes to the probed cells' partitions (PartitionFilters — plan-asserted
    in the pytest gate). The store never reshuffles; per-query top-k is a
    window over the probed candidates only. Self-matches (a query vector
    already in the index under the same vec_id) are excluded."""
    from dblp_to_csv_spark.operators.similarity import _dot, _norm, _nearest

    cent_path, vec_path, _ = _ivf_paths(index_dir)
    cent = spark.read.parquet(cent_path)
    from pyspark.sql import Window

    d = queries.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "emb",
        "cell",
        F.round(
            _dot(F.col("emb"), F.col("emb"))
            - 2 * _dot(F.col("emb"), F.col("cemb"))
            + _dot(F.col("cemb"), F.col("cemb")),
            6,
        ).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cell")
    probes = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            "cell",
        )
    )
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    vecs = spark.read.parquet(vec_path).filter(
        F.col("cell").isin(cells) if cells else F.lit(False)
    )
    scored = (
        vecs.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (_norm(F.col("qemb")) * _norm(F.col("emb"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Incremental triangle maintenance (continuous-ingest shape for the GRAPH
# family — the same move ivf_index_* makes for similarity): a 100 TB edge
# stream is not re-triangle-counted per batch. The store keeps the
# symmetrized adjacency parquet-partitioned by source-node bucket plus a
# running (n_edges, n_triangles) meta; each batch counts ONLY the triangles
# it completes (standard delta counting: a triangle in G∪B that touches B
# has its common-neighbor wedge probed from the batch edge, per-batch cost
# ∝ |batch| × degree — never corpus-sized), then appends. Triangles closed
# by MORE than one batch edge are counted exactly once via canonical-
# minimum-new-edge ownership. Stateful I/O — pytest-gated
# (tests/test_incremental_triangles.py), no oracle by design; the batch
# ground truth is operators/graph.py triangle_counts (oracle-checked).

# Store partition count: like _PREFIX_LEN this is a test-scale setting —
# size it so (expected batch endpoint count) << buckets << (store rows /
# healthy-file-size); at billions of nodes this is thousands of buckets
# (or two-level node-range partitioning), and the probe's per-batch
# pruning ratio is what the setting buys.
TRI_STORE_BUCKETS = 64


def _tri_paths(index_dir: str) -> tuple[str, str]:
    return os.path.join(index_dir, "adj"), os.path.join(index_dir, "meta")


def _tri_canonical(edges: DataFrame) -> DataFrame:
    """Distinct canonical (u < v) simple edges; self-loops dropped."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def _tri_sym(edges: DataFrame) -> DataFrame:
    """Both-direction adjacency rows with the store's bucket column."""
    fwd = edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    rev = edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    return fwd.unionByName(rev).withColumn(
        "sb", F.pmod(F.col("src"), F.lit(TRI_STORE_BUCKETS)).cast("int")
    )


def _tri_write_meta(spark: SparkSession, meta_path: str, n_edges: int, n_tri: int) -> None:
    spark.createDataFrame(
        [(int(n_edges), int(n_tri))], "n_edges long, n_triangles long"
    ).write.mode("overwrite").parquet(meta_path)


def triangle_store_init(
    spark: SparkSession, edges: DataFrame, index_dir: str
) -> tuple[int, int]:
    """Initialize the edge store from ``edges`` (u, v — any orientation,
    duplicates tolerated) and compute the starting triangle total through
    the oracle-checked batch machinery. Returns (n_edges, n_triangles)."""
    from dblp_to_csv_spark.operators.graph import degrees, triangle_counts

    adj_path, meta_path = _tri_paths(index_dir)
    canon = _tri_canonical(edges)
    _tri_sym(canon).write.mode("overwrite").partitionBy("sb").parquet(adj_path)
    # recount from the store artifact so init and append read the same bytes
    store = spark.read.parquet(adj_path)
    canon_store = store.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    n_edges = canon_store.count()
    tri = triangle_counts(spark, "", e0=canon_store, deg=degrees(canon_store))
    row = tri.agg(
        F.coalesce(F.sum("n_triangles"), F.lit(0)).alias("s")
    ).first()
    n_tri = int(row["s"]) // 3
    _tri_write_meta(spark, meta_path, n_edges, n_tri)
    return n_edges, n_tri


def triangle_store_append(
    spark: SparkSession, new_edges: DataFrame, index_dir: str
) -> tuple[int, int, int]:
    """Count the triangles ``new_edges`` completes against the store (plus
    among themselves), append them, and roll the meta forward. Returns
    (added_edges, added_triangles, new_total).

    Scale shape: the batch broadcasts everywhere; the store scan prunes to
    the batch endpoints' buckets (PartitionFilters — plan-asserted in the
    pytest gate) and is never reshuffled wholesale. A triangle whose three
    edges include 2 or 3 batch edges is owned by its canonically-smallest
    batch edge, so the per-edge wedge probes never double-count."""
    adj_path, meta_path = _tri_paths(index_dir)
    batch = _tri_canonical(new_edges)

    # Drop edges the store already has: prune the store scan to the batch's
    # source buckets, inner-join against the broadcast batch to find the
    # existing subset (batch-sized), then anti-join batch against it.
    buckets = sorted(
        {
            int(b)
            for r in batch.select("u", "v").collect()
            for b in (r["u"] % TRI_STORE_BUCKETS, r["v"] % TRI_STORE_BUCKETS)
        }
    )
    store = spark.read.parquet(adj_path)
    pruned = store.filter(
        F.col("sb").isin(buckets) if buckets else F.lit(False)
    )
    existing = pruned.filter(F.col("src") < F.col("dst")).join(
        F.broadcast(batch),
        (F.col("src") == F.col("u")) & (F.col("dst") == F.col("v")),
        "left_semi",
    )
    fresh = batch.join(
        F.broadcast(existing.select(F.col("src").alias("u"), F.col("dst").alias("v"))),
        ["u", "v"],
        "left_anti",
    )
    # fresh is batch-sized: stage it driver-side once — it seeds broadcasts
    # below and the final append, and must not re-evaluate against a store
    # that meanwhile grew (the read-your-own-append hazard, same rule as
    # exact_dedup_incremental's staging).
    fresh_rows = [(r["u"], r["v"]) for r in fresh.collect()]
    added_edges = len(fresh_rows)
    meta = spark.read.parquet(meta_path).first()
    if added_edges == 0:
        return 0, 0, int(meta["n_triangles"])
    freshb = spark.createDataFrame(fresh_rows, "u long, v long")

    # Union adjacency the wedge probes see: pruned store + the fresh batch
    # itself (triangles with 2-3 new edges need the new neighbors too).
    adj = pruned.select("src", "dst").unionByName(
        _tri_sym(freshb).select("src", "dst")
    )
    j1 = adj.join(
        F.broadcast(freshb), adj["src"] == freshb["u"]
    ).select("u", "v", F.col("dst").alias("w")).filter(F.col("w") != F.col("v"))
    j2 = adj.join(
        F.broadcast(freshb.withColumnRenamed("u", "u2")),
        adj["src"] == F.col("v"),
    ).select(
        F.col("u2").alias("u"), "v", F.col("dst").alias("w")
    ).filter(
        F.col("w") != F.col("u")
    )
    wedges = j1.join(j2, ["u", "v", "w"])

    # Ownership: count (u,v,w) only if neither other edge of the triangle
    # is a FRESH edge that canonically precedes (u,v).
    f_e = F.struct(
        F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
    )
    g_e = F.struct(
        F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
    )
    self_e = F.struct(F.col("u").alias("a"), F.col("v").alias("b"))
    fset = F.broadcast(
        freshb.select(
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")).alias("fe")
        )
    )
    wf = (
        wedges.join(fset, fset["fe"] == f_e, "left")
        .withColumn("f_pre", F.col("fe").isNotNull() & (F.col("fe") < self_e))
        .drop("fe")
        .join(fset, fset["fe"] == g_e, "left")
        .withColumn("g_pre", F.col("fe").isNotNull() & (F.col("fe") < self_e))
        .drop("fe")
    )
    added_tri = wf.filter(~F.col("f_pre") & ~F.col("g_pre")).count()

    _tri_sym(freshb).write.mode("append").partitionBy("sb").parquet(adj_path)
    new_total = int(meta["n_triangles"]) + added_tri
    _tri_write_meta(
        spark, meta_path, int(meta["n_edges"]) + added_edges, new_total
    )
    return added_edges, added_tri, new_total


# ---------------------------------------------------------------------------
# Incremental connected components (the missing stage of the STREAMING
# near-dup chain: minhash_dedup_incremental yields candidate pairs per
# batch, but clustering was batch-only). The store keeps a (node, root)
# membership table parquet-partitioned by node bucket, a small ROOT-MERGE
# map (old_root -> new_root), and meta. An append never touches the
# corpus-sized membership: it probes the batch endpoints' buckets, runs
# union-find over the BATCH edges on their resolved roots (batch-sized,
# driver-side — the same _union_find_components kernel the batch CC
# finisher uses), appends new nodes, and records root merges lazily in the
# merge map. Members of a merged component are NOT relabelled per batch —
# lookups compose the merge map (merge-event-sized, bounded by the
# declared compaction trigger); cc_store_compact is the declared expensive
# path that rewrites membership with resolved roots and empties the map —
# the amortized-rebuild rule, same as IVF_RETRAIN_GROWTH. Root contract
# matches the batch operator exactly: component = MIN node id.

CC_STORE_BUCKETS = 64
# Declared compaction trigger: once merge events since the last compaction
# reach this fraction of tracked nodes, lookups pay a noticeable chain and
# the caller should compact. Amortized: total compaction cost stays
# O(N log N) like the IVF retrain rule.
CC_COMPACT_FRACTION = 0.25
# Absolute ceiling on the driver-collected merge map (ADVICE r13): the
# fractional trigger alone makes the bound proportional to tracked nodes
# (0.25 x N before firing), which is NOT the "merge-event-sized" budget
# class at 100 TB. The trigger fires at min(fraction x nodes, this cap),
# so driver-side merge-map state stays O(1) regardless of store size:
# 1M (old_root, new_root) longs ≈ 16 MB collected — well inside any
# driver heap, and far above what a micro-batch cadence accumulates
# between compactions.
CC_MAX_MERGE_EVENTS = 1_000_000


def _cc_paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "members"),
        os.path.join(index_dir, "merges"),
        os.path.join(index_dir, "meta"),
    )


def _cc_bucket(col):
    return F.pmod(col, F.lit(CC_STORE_BUCKETS)).cast("int")


def _cc_write_meta(spark, meta_path, n_nodes: int, n_merges: int) -> None:
    spark.createDataFrame(
        [(int(n_nodes), int(n_merges))], "n_nodes long, n_merges long"
    ).write.mode("overwrite").parquet(meta_path)


def _cc_merge_dict(spark, merges_path) -> dict:
    """The composed (old_root -> final_root) map, path-compressed. Its size
    is the number of merge EVENTS since the last compaction — the declared
    driver-side state, bounded by the compaction trigger (the same budget
    class as the IVF meta and the Bloom word fold)."""
    m = {
        r["old_root"]: r["new_root"]
        for r in _read_index(
            spark, merges_path, "old_root long, new_root long"
        ).collect()
    }

    def find(x):
        seen = []
        while x in m:
            seen.append(x)
            x = m[x]
        for s in seen:
            m[s] = x
        return x

    for k in list(m):
        find(k)
    return m


def cc_store_init(spark: SparkSession, edges: DataFrame, index_dir: str) -> int:
    """Initialize membership from ``edges`` (u, v) through the batch
    union-find kernel (component = min node id — the oracle-checked batch
    contract). Singletons are not tracked, matching the batch operator.
    Returns the tracked node count."""
    mem_path, mrg_path, meta_path = _cc_paths(index_dir)
    from dblp_to_csv_spark.operators.dedup import _cc_local_finish

    pairs = (
        edges.select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    labels = _cc_local_finish(pairs).select(
        F.col("doc_id").alias("node"), F.col("component").alias("root")
    )
    labels.withColumn("nb", _cc_bucket(F.col("node"))).write.mode(
        "overwrite"
    ).partitionBy("nb").parquet(mem_path)
    n = _read_index(spark, mem_path, "node long, root long, nb int").count()
    spark.createDataFrame([], "old_root long, new_root long").write.mode(
        "overwrite"
    ).parquet(mrg_path)
    _cc_write_meta(spark, meta_path, n, 0)
    return n


def cc_store_append(
    spark: SparkSession, edges: DataFrame, index_dir: str
) -> tuple[int, int, bool]:
    """Fold a batch of edges into the store. Returns (new_nodes_added,
    merge_events_recorded, compaction_trigger_fired). Never scans the
    membership table beyond the batch endpoints' buckets."""
    mem_path, mrg_path, meta_path = _cc_paths(index_dir)
    batch = [
        (int(r["u"]), int(r["v"]))
        for r in edges.select("u", "v").distinct().collect()
        if r["u"] != r["v"]
    ]
    meta = spark.read.parquet(meta_path).first()
    if not batch:
        return 0, 0, False
    endpoints = sorted({n for e in batch for n in e})
    buckets = sorted({n % CC_STORE_BUCKETS for n in endpoints})
    known = {
        r["node"]: r["root"]
        for r in _read_index(spark, mem_path, "node long, root long, nb int")
        .filter(F.col("nb").isin(buckets))
        .join(
            F.broadcast(
                spark.createDataFrame([(n,) for n in endpoints], "node long")
            ),
            "node",
            "left_semi",
        )
        .collect()
    }
    mdict = _cc_merge_dict(spark, mrg_path)
    resolved = {n: mdict.get(r, r) for n, r in known.items()}

    # Union-find over batch edges on resolved roots; union by MIN root.
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def add(x):
        if x not in parent:
            parent[x] = x

    for u, v in batch:
        ru = resolved.get(u, u)
        rv = resolved.get(v, v)
        add(ru)
        add(rv)
        ra, rb = find(ru), find(rv)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    new_rows = [
        (n, find(resolved.get(n, n))) for n in endpoints if n not in known
    ]
    merge_rows = [
        (r, find(r))
        for r in {resolved[n] for n in known}
        if find(r) != r
    ]
    if new_rows:
        spark.createDataFrame(new_rows, "node long, root long").withColumn(
            "nb", _cc_bucket(F.col("node"))
        ).write.mode("append").partitionBy("nb").parquet(mem_path)
    if merge_rows:
        spark.createDataFrame(
            merge_rows, "old_root long, new_root long"
        ).write.mode("append").parquet(mrg_path)
    n_nodes = int(meta["n_nodes"]) + len(new_rows)
    n_merges = int(meta["n_merges"]) + len(merge_rows)
    _cc_write_meta(spark, meta_path, n_nodes, n_merges)
    return (
        len(new_rows),
        len(merge_rows),
        n_merges
        >= min(CC_COMPACT_FRACTION * max(n_nodes, 1), CC_MAX_MERGE_EVENTS),
    )


def _cc_resolve_roots(spark, mem: DataFrame, mrg_path: str) -> DataFrame:
    """Resolve stale roots through the path-compressed merge map as a
    BROADCAST join (the map is merge-event-sized; a create_map literal of
    thousands of entries would bloat analysis instead)."""
    mdict = _cc_merge_dict(spark, mrg_path)
    if not mdict:
        return mem
    mdf = spark.createDataFrame(
        list(mdict.items()), "old_root long, new_root long"
    )
    return (
        mem.join(F.broadcast(mdf), mem["root"] == mdf["old_root"], "left")
        .select("node", F.coalesce("new_root", "root").alias("root"))
    )


def cc_store_lookup(
    spark: SparkSession, nodes: DataFrame, index_dir: str
) -> DataFrame:
    """(node, component) for the queried ``nodes`` (column ``node``):
    membership probe pruned to the queried buckets, stale roots resolved
    through the broadcast merge map; untracked nodes are their own
    component (the batch operator's singleton convention)."""
    mem_path, mrg_path, _ = _cc_paths(index_dir)
    node_vals = sorted({int(r["node"]) for r in nodes.select("node").collect()})
    buckets = sorted({n % CC_STORE_BUCKETS for n in node_vals})
    probe = spark.createDataFrame([(n,) for n in node_vals], "node long")
    mem = (
        _read_index(spark, mem_path, "node long, root long, nb int")
        .filter(F.col("nb").isin(buckets) if buckets else F.lit(False))
        .join(F.broadcast(probe), "node", "left_semi")
        .select("node", "root")
    )
    mem = _cc_resolve_roots(spark, mem, mrg_path)
    return probe.join(mem, "node", "left").select(
        "node", F.coalesce("root", F.col("node")).alias("component")
    )


def cc_store_compact(spark: SparkSession, index_dir: str) -> int:
    """The declared expensive path: rewrite membership with every stale
    root resolved and empty the merge map. Full store scan by design —
    runs on the compaction trigger, not per batch. Returns rows written."""
    mem_path, mrg_path, meta_path = _cc_paths(index_dir)
    mem = _cc_resolve_roots(
        spark,
        _read_index(spark, mem_path, "node long, root long, nb int").select(
            "node", "root"
        ),
        mrg_path,
    )
    tmp = mem_path + "_compact"
    mem.withColumn("nb", _cc_bucket(F.col("node"))).write.mode(
        "overwrite"
    ).partitionBy("nb").parquet(tmp)
    compacted = _read_index(spark, tmp, "node long, root long, nb int")
    compacted.write.mode("overwrite").partitionBy("nb").parquet(mem_path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    n = _read_index(spark, mem_path, "node long, root long, nb int").count()
    spark.createDataFrame([], "old_root long, new_root long").write.mode(
        "overwrite"
    ).parquet(mrg_path)
    _cc_write_meta(spark, meta_path, n, 0)
    return n


# ---------------------------------------------------------------------------
# Incremental leakage-free splitting (VERDICT r13 item 6): the streaming
# companion of the oracle-checked split_leakage_free. Batch semantics bucket
# every document by the md5 prefix of its near-dup CLUSTER canonical; under
# continuous ingest a cc_store merge can join two clusters whose members
# were already assigned to DIFFERENT splits — re-hashing would silently
# move consumed eval documents, so the DECLARED policy is quarantine-to-
# train: a component whose assigned members ever disagree re-assigns
# wholesale to 'train' (the conflicting-key move — eval shrinks, train
# grows, and no training-side near-duplicate ever remains in val/test).
#
# State: docs/ records each doc's IMMUTABLE assignment root (the component
# root at assign time); roots/ records the per-root split, seq-versioned so
# quarantine is an append, never a rewrite. Merge events fold in EAGERLY
# via split_reconcile (called inside split_assign_incremental and after
# cc_store_append by the caller) by walking the cc store's bounded merge
# map — so the leakage invariant (all assigned docs of one CURRENT
# component share one split) holds after every batch, which the pytest
# gate asserts under arbitrary interleavings. Call split_reconcile BEFORE
# cc_store_compact: compaction clears the merge map the reconcile reads.

_SPLIT_DOC_SCHEMA = "doc_id long, root long, db int"
_SPLIT_ROOT_SCHEMA = "root long, split string, seq long"


def _split_paths(split_dir: str) -> tuple[str, str]:
    return os.path.join(split_dir, "docs"), os.path.join(split_dir, "roots")


def _split_of_root(root: int) -> str:
    """Same 75/12.5/12.5 md5-hex-prefix thresholds as split_leakage_free /
    split_train_val_test (curation.py)."""
    import hashlib

    h = hashlib.md5(str(int(root)).encode()).hexdigest()[0]
    return "train" if h < "c" else ("val" if h < "e" else "test")


def _split_root_table(spark: SparkSession, roots_path: str) -> dict[int, str]:
    """Latest split per assigned root. Assigned-root count is bounded by
    assignment calls (cluster-count-sized, not corpus-sized): every doc
    maps to one root, roots dedup across docs."""
    rows = _read_index(spark, roots_path, _SPLIT_ROOT_SCHEMA).collect()
    best: dict[int, tuple[int, str]] = {}
    for r in rows:
        if r["root"] not in best or r["seq"] > best[r["root"]][0]:
            best[r["root"]] = (r["seq"], r["split"])
    return {k: v for k, (_, v) in best.items()}


def split_store_init(spark: SparkSession, split_dir: str) -> None:
    dpath, rpath = _split_paths(split_dir)
    spark.createDataFrame([], _SPLIT_DOC_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("db").parquet(dpath)
    spark.createDataFrame([], _SPLIT_ROOT_SCHEMA).write.mode("overwrite").parquet(
        rpath
    )


def split_reconcile(
    spark: SparkSession,
    cc_index_dir: str,
    split_dir: str,
    new_edges: DataFrame | None = None,
) -> int:
    """Fold pending cc merges into the root-split table: for every current
    root whose assigned sub-roots disagree, append 'train' rows for all of
    them (and the surviving root). Returns the number of quarantined
    components. Idempotent; bounded by the merge map (CC_MAX_MERGE_EVENTS)
    plus the batch.

    ``new_edges`` (u, v — the batch just given to cc_store_append) closes
    the untracked-singleton hole: a doc assigned while it was a SINGLETON
    (never in the cc members table) that gains its first edge produces NO
    merge event — the store simply records it under its neighbor's root —
    so the merge-map walk alone cannot see a cross-split union. Any such
    union necessarily involves a batch edge endpoint, so probing the batch
    endpoints' assignments (batch-sized, bucket-pruned) restores exactness."""
    _, mrg_path, _ = _cc_paths(cc_index_dir)
    mdict = _cc_merge_dict(spark, mrg_path)
    dpath, rpath = _split_paths(split_dir)
    table = _split_root_table(spark, rpath)
    if not table:
        return 0
    # (current_root -> assigned sub-roots) from tracked merges...
    groups: dict[int, set] = {}
    for old, new in mdict.items():
        if old in table:
            groups.setdefault(new, set()).add(old)
    # ...plus the batch endpoints' assignments (untracked-singleton unions)
    if new_edges is not None:
        ends = {
            int(r[0])
            for r in new_edges.select(F.explode(F.array("u", "v"))).collect()
        }
        assigned = {
            r["doc_id"]: r["root"]
            for r in _probe_split_docs(
                spark, dpath, {e: None for e in ends}
            ).collect()
        }
        if assigned:
            cur = {
                r["node"]: r["component"]
                for r in cc_store_lookup(
                    spark,
                    spark.createDataFrame(
                        [(int(d),) for d in sorted(assigned)], "node long"
                    ),
                    cc_index_dir,
                ).collect()
            }
            for d, o in assigned.items():
                groups.setdefault(cur[d], set()).add(o)
    if not groups:
        return 0

    def mixed(new_root, olds):
        members = olds | ({new_root} if new_root in table else set())
        return len({table[o] for o in members}) > 1

    if any(mixed(nr, olds) for nr, olds in groups.items()):
        # a quarantine must reach EVERY assigned sub-root of the mixed
        # component — including ones that joined with no merge event and
        # outside this batch's endpoints (an untracked singleton absorbed
        # two batches ago is visible only in the members table). Quarantine
        # events are rare (a merge ACROSS assigned splits), so the declared
        # cost of one is a full regroup of the root table: one bucket-pruned
        # lookup over the assigned roots (cluster-count-sized, never
        # corpus-sized).
        all_cur = {
            r["node"]: r["component"]
            for r in cc_store_lookup(
                spark,
                spark.createDataFrame(
                    [(int(o),) for o in sorted(table)], "node long"
                ),
                cc_index_dir,
            ).collect()
        }
        groups = {}
        for o, r in all_cur.items():
            groups.setdefault(r, set()).add(o)
    seq = 1 + max(
        (r["seq"] for r in _read_index(spark, rpath, _SPLIT_ROOT_SCHEMA).collect()),
        default=0,
    )
    out = []
    n_quarantined = 0
    for new_root, olds in groups.items():
        members = olds | ({new_root} if new_root in table else set())
        splits = {table[o] for o in members}
        # the surviving root must carry the component split so later
        # assignments (and post-compaction lookups) resolve through it
        if len(splits) > 1:
            n_quarantined += 1
            out += [(int(o), "train", seq) for o in members | {new_root}]
        elif new_root not in table:
            out.append((int(new_root), splits.pop(), seq))
    if out:
        spark.createDataFrame(out, _SPLIT_ROOT_SCHEMA).write.mode(
            "append"
        ).parquet(rpath)
    return n_quarantined


def split_assign_incremental(
    spark: SparkSession,
    nodes: DataFrame,
    cc_index_dir: str,
    split_dir: str,
) -> DataFrame:
    """Assign (or re-read) the leakage-free split for ``nodes`` (column
    ``node``): each node's CURRENT cc_store component root keys the split;
    fresh roots hash like the batch operator; components already carrying
    an assignment reuse it; mixed components quarantine to train (via the
    eager split_reconcile). Returns (doc_id, split)."""
    split_reconcile(spark, cc_index_dir, split_dir)
    dpath, rpath = _split_paths(split_dir)
    lk = {
        r["node"]: r["component"]
        for r in cc_store_lookup(spark, nodes, cc_index_dir).collect()
    }
    table = _split_root_table(spark, rpath)
    seq = 1 + max(
        (r["seq"] for r in _read_index(spark, rpath, _SPLIT_ROOT_SCHEMA).collect()),
        default=0,
    )
    known_docs = {
        r["doc_id"]: r["root"]
        for r in _probe_split_docs(spark, dpath, lk).collect()
    }
    new_roots, doc_rows, result = [], [], []
    for node, root in sorted(lk.items()):
        if node in known_docs:
            result.append((node, table[known_docs[node]]))
            continue
        if root not in table:
            table[root] = _split_of_root(root)
            new_roots.append((int(root), table[root], seq))
        doc_rows.append((int(node), int(root)))
        result.append((node, table[root]))
    if new_roots:
        spark.createDataFrame(new_roots, _SPLIT_ROOT_SCHEMA).write.mode(
            "append"
        ).parquet(rpath)
    if doc_rows:
        spark.createDataFrame(doc_rows, "doc_id long, root long").withColumn(
            "db", F.pmod(F.col("doc_id"), F.lit(CC_STORE_BUCKETS)).cast("int")
        ).write.mode("append").partitionBy("db").parquet(dpath)
    return spark.createDataFrame(result, "doc_id long, split string")


def _probe_split_docs(spark: SparkSession, dpath: str, lk: dict) -> DataFrame:
    if not lk:
        return spark.createDataFrame([], _SPLIT_DOC_SCHEMA)
    buckets = sorted({n % CC_STORE_BUCKETS for n in lk})
    probe = spark.createDataFrame([(int(n),) for n in sorted(lk)], "doc_id long")
    return (
        _read_index(spark, dpath, _SPLIT_DOC_SCHEMA)
        .filter(F.col("db").isin(buckets))
        .join(F.broadcast(probe), "doc_id", "left_semi")
    )


def split_current(spark: SparkSession, split_dir: str) -> DataFrame:
    """(doc_id, split) for every assigned doc, resolved through the latest
    root-split table — the report twin of split_leakage_free's output."""
    dpath, rpath = _split_paths(split_dir)
    docs = _read_index(spark, dpath, _SPLIT_DOC_SCHEMA)
    roots = _read_index(spark, rpath, _SPLIT_ROOT_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("root").orderBy(F.col("seq").desc())
    latest = (
        roots.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("root", "split")
    )
    return docs.join(F.broadcast(latest), "root").select("doc_id", "split")


# ---------------------------------------------------------------------------
# Incremental weighted reservoir (r14): the sampling family's continuous-
# ingest member. The batch query (pipeline.py::sample_weighted_priority) is
# Efraimidis–Spirakis A-ES with DETERMINISTIC md5 priorities, and min-K
# over priorities is associative + commutative — so the streaming reservoir
# is exact, not approximate: fold each batch's priorities against the
# K-row store and keep the K smallest. Sequential == batch for any
# batching, re-ingests are idempotent (same doc_id → same priority →
# distinct() collapses), and the store is K rows forever — the only
# corpus-scale work is the per-batch priority projection, which is one
# narrow map over the batch.

RESERVOIR_K = 100  # == pipeline.WEIGHTED_SAMPLE_K (pinned by the parity test)


def reservoir_sample_init(spark: SparkSession, store_dir: str) -> None:
    spark.createDataFrame(
        [], "doc_id long, lang string, n_chars long, priority double"
    ).write.mode("overwrite").parquet(store_dir)


def reservoir_sample_append(
    spark: SparkSession, new_docs: DataFrame, store_dir: str, k: int = RESERVOIR_K
) -> None:
    """Fold a batch (doc_id, lang, n_chars, ...) into the K-row reservoir:
    union the batch's A-ES priorities with the store, keep the K smallest
    (ties by doc_id — the batch query's exact order), stage-then-swap the
    K-row rewrite (the ivf_index_train discipline: the new store derives
    from a read of the old one)."""
    from dblp_to_csv_spark.operators.pipeline import aes_priority_frame

    schema = "doc_id long, lang string, n_chars long, priority double"
    cur = _read_index(spark, store_dir, schema)
    merged = (
        cur.unionByName(
            aes_priority_frame(
                new_docs.select("doc_id", "lang", "n_chars")
            )
        )
        .distinct()
        .orderBy("priority", "doc_id")
        .limit(k)
    )
    tmp = store_dir + "_swap"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(store_dir)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def reservoir_sample_current(spark: SparkSession, store_dir: str) -> DataFrame:
    """The current weighted sample — row-identical to running the batch
    sample_weighted_priority over everything ever appended."""
    return _read_index(
        spark, store_dir, "doc_id long, lang string, n_chars long, priority double"
    ).orderBy("priority", "doc_id")


# ---------------------------------------------------------------------------
# Incremental Misra-Gries heavy hitters (r14): the frequency-sketch family's
# continuous-ingest member. The batch query
# (statistics.py::heavy_hitters_words) runs MG(k) per partition + exact
# recount per corpus scan; here the MERGED MG summary itself is the
# persistent state (Agarwal et al., PODS'12 mergeable summaries): K counter
# rows forever, merged per batch by counter addition + one (k+1)-th-largest
# cut. Unlike the reservoir, raw counter state is batching-DEPENDENT — what
# is invariant (and pinned in tests/test_mg_incremental.py) is the
# guarantee:
#
#     lb(x) <= true(x) <= lb(x) + D,   D = (total - sum_lb) / (k + 1)
#
# for EVERY word (absent words: true(x) <= D), because each unit of
# deduction — a partition-level MG decrement or a merge cut — absorbs at
# least k+1 token occurrences. With k+1 > 1/phi this makes the candidate
# set a superset of the true phi-frequent words under ANY batching, and an
# exact recount of the candidates (the batch query's pass 2) reproduces
# heavy_hitters_words exactly.
#
# Replay safety: counting state cannot anti-join duplicates away without
# corpus-sized memory, so appends carry a monotone batch seq and the store
# skips seq <= last-applied — batch-granularity idempotent replay with
# 1-row meta, the foreachBatch epoch-id contract.
# ---------------------------------------------------------------------------

MG_STORE_K = 251  # == statistics.HH_K: k+1 > 1/HH_PHI


def _mg_paths(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, "counters"), os.path.join(store_dir, "meta")


def _mg_write_meta(spark: SparkSession, meta_path: str, total: int, seq: int, k: int) -> None:
    spark.createDataFrame(
        [(int(total), int(seq), int(k))], "total long, seq long, k int"
    ).write.mode("overwrite").parquet(meta_path)


def mg_store_init(spark: SparkSession, store_dir: str, k: int = MG_STORE_K) -> None:
    cpath, mpath = _mg_paths(store_dir)
    spark.createDataFrame([], "word string, lb long").write.mode("overwrite").parquet(cpath)
    _mg_write_meta(spark, mpath, 0, -1, k)


def mg_store_append(
    spark: SparkSession, new_docs: DataFrame, store_dir: str, seq: int
) -> bool:
    """Fold one batch of documents into the K-row MG summary. Returns False
    (no-op) when ``seq`` was already applied — replayed micro-batches leave
    the counts exact.

    Shuffle inventory: the batch tokenization + per-partition MG runs
    inside the batch scan (mapInPandas, no shuffle — the batch query's
    pass 1, reused); the merge is a groupBy-sum over <= (partitions+1)*k
    summary rows, then one cut. Driver state: the 1-row meta, the 1-row
    batch token count, and the (k+1)-th-largest cut value — never
    vocabulary-sized."""
    from dblp_to_csv_spark.functions.text import words
    from dblp_to_csv_spark.operators.statistics import mg_partition_summaries

    cpath, mpath = _mg_paths(store_dir)
    meta = spark.read.parquet(mpath).first()
    if seq <= meta["seq"]:
        return False
    k = int(meta["k"])
    tok = new_docs.select(F.explode(words("text")).alias("word"))
    batch_total = tok.count()
    if batch_total == 0:
        _mg_write_meta(spark, mpath, int(meta["total"]), seq, k)
        return True
    batch_summary = mg_partition_summaries(tok, k)
    cur = _read_index(spark, cpath, "word string, lb long")
    summed = (
        cur.unionByName(batch_summary).groupBy("word").agg(F.sum("lb").alias("lb"))
    )
    # The merge cut: subtract the (k+1)-th largest summed counter from all,
    # drop the non-positive — at most k rows survive. top-(k+1) is a
    # bounded driver collect over an already-<= (partitions+1)*k frame.
    top = summed.orderBy(F.col("lb").desc(), "word").limit(k + 1).collect()
    cut = int(top[-1]["lb"]) if len(top) > k else 0
    merged = summed.withColumn("lb", F.col("lb") - F.lit(cut)).filter(F.col("lb") > 0)
    tmp = cpath + "_swap"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(cpath)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    _mg_write_meta(spark, mpath, int(meta["total"]) + batch_total, seq, k)
    return True


def mg_store_candidates(spark: SparkSession, store_dir: str) -> DataFrame:
    """The current summary with its deterministic error budget:
    (word, lb, ub) where ub = lb + floor((total - sum_lb)/(k+1)) — every
    word's true count lies in [lb, ub], and any word NOT present has true
    count <= ub - lb. Instant (K-row state), no corpus access."""
    cpath, mpath = _mg_paths(store_dir)
    meta = spark.read.parquet(mpath).first()
    cur = _read_index(spark, cpath, "word string, lb long")
    sum_lb = cur.agg(F.coalesce(F.sum("lb"), F.lit(0))).first()[0]
    d_bound = (int(meta["total"]) - int(sum_lb)) // (int(meta["k"]) + 1)
    return cur.select("word", "lb", (F.col("lb") + F.lit(d_bound)).alias("ub"))


def mg_store_hh(
    spark: SparkSession, corpus_docs: DataFrame, store_dir: str, phi: float | None = None
) -> DataFrame:
    """Exact phi-frequent words: recount the store's candidates over the
    full corpus (the batch query's pass 2 — a semi-join against the
    broadcast K-row candidate set, the one deliberate corpus scan). By the
    no-false-negative guarantee this equals heavy_hitters_words run over
    everything ever appended, for any batching."""
    from dblp_to_csv_spark.functions.rounding import round_ties_down
    from dblp_to_csv_spark.functions.text import words
    from dblp_to_csv_spark.operators.statistics import HH_PHI

    phi = HH_PHI if phi is None else phi
    cand = mg_store_candidates(spark, store_dir).select("word")
    tok = corpus_docs.select(F.explode(words("text")).alias("word"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    recount = (
        tok.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("total")))
        .select(
            "word",
            F.col("cnt").cast("long").alias("cnt"),
            round_ties_down(F.col("cnt") * 1.0 / F.col("total"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental BM25 search index (r14): the retrieval family's continuous-
# ingest member. The batch query (text_analysis.py::search_bm25) re-scans
# and re-scores the corpus per run; here the corpus-scale state is a
# term-bucket-partitioned postings table probed by the query's terms only
# (PartitionFilters), and the global statistics BM25 needs are EXACTLY
# maintained 1-row meta: n_docs and sum_dl are integer-additive across
# batches, per-term df is the probed postings' row count (a doc appears
# once per term), so a search computes bit-for-bit the same (tf, df, n,
# avgdl) inputs the batch scorer sees.
#
# Two read paths, pinned equal in tests/test_bm25_incremental.py:
# * bm25_index_scan_scored — rebuilds the full tf frame from the index and
#   feeds the SAME bm25_score_frame the batch query uses: parity with
#   search_bm25 is by construction (index-completeness witness);
# * bm25_index_search — the pruned-probe path (only the query terms'
#   buckets are read); equal to the batch top-k because both sides rank on
#   the 6-dp ROUNDED score with doc_id tie-break.
#
# Replay is idempotent by doc_id (bucket-pruned anti-probe, the er_store
# rule): re-ingesting a doc would otherwise double df/tf/meta.
# ---------------------------------------------------------------------------

BM25_TERM_BUCKETS = 256
BM25_DOC_BUCKETS = 16

_BM25_POST_SCHEMA = "term string, doc_id long, tf long, dl long, tb int"
_BM25_DOC_SCHEMA = "doc_id long, dl long, db int"


def _bm25_paths(store_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(store_dir, "postings"),
        os.path.join(store_dir, "docs"),
        os.path.join(store_dir, "meta"),
    )


def _term_bucket(col):
    return F.conv(F.substring(F.md5(col), 1, 2), 16, 10).cast("int")


def bm25_index_init(spark: SparkSession, store_dir: str) -> None:
    post_p, docs_p, meta_p = _bm25_paths(store_dir)
    spark.createDataFrame([], _BM25_POST_SCHEMA).write.mode("overwrite").partitionBy(
        "tb"
    ).parquet(post_p)
    spark.createDataFrame([], _BM25_DOC_SCHEMA).write.mode("overwrite").partitionBy(
        "db"
    ).parquet(docs_p)
    spark.createDataFrame([(0, 0)], "n_docs long, sum_dl long").write.mode(
        "overwrite"
    ).parquet(meta_p)


def bm25_index_append(spark: SparkSession, new_docs: DataFrame, store_dir: str) -> int:
    """Ingest a batch of (doc_id, text): tokenize once, append per-(doc,
    term) postings (term-bucketed) + doc lengths (doc-bucketed), and fold
    the batch's exact (count, sum-of-lengths) into the 1-row meta. Returns
    the number of docs ingested (replays return 0)."""
    from dblp_to_csv_spark.functions.text import words

    post_p, docs_p, meta_p = _bm25_paths(store_dir)
    batch_ids = [int(r[0]) for r in new_docs.select("doc_id").distinct().collect()]
    if not batch_ids:
        return 0
    dbuckets = sorted({i % BM25_DOC_BUCKETS for i in batch_ids})
    seen = {
        int(r[0])
        for r in _read_index(spark, docs_p, _BM25_DOC_SCHEMA)
        .filter(F.col("db").isin(dbuckets))
        .join(
            F.broadcast(
                spark.createDataFrame([(i,) for i in batch_ids], "doc_id long")
            ),
            "doc_id",
            "left_semi",
        )
        .select("doc_id")
        .collect()
    }
    fresh = [i for i in batch_ids if i not in seen]
    if not fresh:
        return 0
    batch = new_docs.join(
        F.broadcast(spark.createDataFrame([(i,) for i in fresh], "doc_id long")),
        "doc_id",
        "left_semi",
    )
    tok = batch.select("doc_id", words("text").alias("w")).select(
        "doc_id", F.size("w").alias("dl"), "w"
    )
    # Stage the tokenized batch: meta totals and the two appends must see
    # one immutable snapshot (and postings/docs stay mutually consistent).
    tok = _stage(tok, None, "bm25_tok")
    agg = tok.agg(F.count(F.lit(1)), F.coalesce(F.sum("dl"), F.lit(0))).first()
    batch_n, batch_dl = int(agg[0]), int(agg[1])
    meta = spark.read.parquet(meta_p).first()
    postings = (
        tok.select("doc_id", "dl", F.explode("w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", "tf", "dl", _term_bucket(F.col("term")).alias("tb"))
    )
    postings.write.mode("append").partitionBy("tb").parquet(post_p)
    tok.select(
        "doc_id", "dl", F.pmod(F.col("doc_id"), F.lit(BM25_DOC_BUCKETS)).cast("int").alias("db")
    ).write.mode("append").partitionBy("db").parquet(docs_p)
    spark.createDataFrame(
        [(int(meta["n_docs"]) + batch_n, int(meta["sum_dl"]) + batch_dl)],
        "n_docs long, sum_dl long",
    ).write.mode("overwrite").parquet(meta_p)
    return batch_n


def _bm25_tf_frame_from_index(spark: SparkSession, store_dir: str) -> DataFrame:
    """The full corpus tf frame (doc_id, dl, tf_<term>...) reconstructed
    from the index — the index-completeness witness: feeding it to the
    batch scorer must reproduce search_bm25 exactly."""
    from dblp_to_csv_spark.operators.text_analysis import BM25_TERMS

    post_p, docs_p, _ = _bm25_paths(store_dir)
    docs = _read_index(spark, docs_p, _BM25_DOC_SCHEMA).select("doc_id", "dl")
    posts = (
        _read_index(spark, post_p, _BM25_POST_SCHEMA)
        .filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id")
        .pivot("term", list(BM25_TERMS))
        .agg(F.first("tf"))
    )
    out = docs.join(posts, "doc_id", "left")
    return out.select(
        "doc_id",
        "dl",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("int").alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )


def bm25_index_scan_scored(spark: SparkSession, store_dir: str) -> DataFrame:
    """search_bm25 over the index via the batch scorer itself (corpus-sized
    by design — the parity witness, not the serving path)."""
    from dblp_to_csv_spark.operators.text_analysis import (
        BM25_TOP,
        bm25_score_frame,
    )

    tf = _bm25_tf_frame_from_index(spark, store_dir)
    return (
        bm25_score_frame(tf, ["doc_id"])
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


def bm25_index_search(
    spark: SparkSession,
    store_dir: str,
    terms: tuple[str, ...] | None = None,
    top: int | None = None,
) -> DataFrame:
    """The serving path: score ONLY documents containing at least one query
    term, read from the query terms' postings buckets (PartitionFilters —
    probe cost is per-term posting lists, never the corpus). Global stats
    come exact from the meta row (n, avgdl) and the probed lists (df). When
    fewer than ``top`` documents match, the remainder fills with zero-score
    docs in doc_id order — the batch query's exact tail semantics."""
    from dblp_to_csv_spark.operators.text_analysis import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOP,
    )

    terms = tuple(terms or BM25_TERMS)
    top = top or BM25_TOP
    post_p, docs_p, meta_p = _bm25_paths(store_dir)
    meta = spark.read.parquet(meta_p).first()
    n, sum_dl = int(meta["n_docs"]), int(meta["sum_dl"])
    if n == 0:
        return spark.createDataFrame(
            [], "doc_id long, bm25 double, n_terms_matched long"
        )
    avgdl = sum_dl / n
    tbuckets = sorted(
        {int(hashlib.md5(t.encode()).hexdigest()[:2], 16) for t in terms}
    )
    posts = (
        _read_index(spark, post_p, _BM25_POST_SCHEMA)
        .filter(F.col("tb").isin(tbuckets))
        .filter(F.col("term").isin(list(terms)))
    )
    df_frame = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        posts.join(F.broadcast(df_frame), "term")
        .withColumn(
            "contrib",
            F.log(1 + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf")
            * F.lit(BM25_K1 + 1)
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(
            (F.round(F.sum("contrib"), 6) + F.lit(0.0)).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )
    hits = scored.orderBy(F.desc("bm25"), "doc_id").limit(top)
    n_hits = hits.count()
    if n_hits >= top:
        return hits
    fill = (
        _read_index(spark, docs_p, _BM25_DOC_SCHEMA)
        .join(scored.select("doc_id"), "doc_id", "left_anti")
        .orderBy("doc_id")
        .limit(top - n_hits)
        .select(
            "doc_id",
            (F.lit(0.0) + F.lit(0.0)).alias("bm25"),
            F.lit(0).cast("long").alias("n_terms_matched"),
        )
    )
    return hits.unionByName(fill)


def bm25_index_compact(spark: SparkSession, store_dir: str) -> None:
    """Declared amortized rewrite for the append-per-batch postings/docs
    tables (small-file collapse; row set unchanged — the index carries no
    history rows). Stage-then-swap per table; meta untouched."""
    import shutil

    post_p, docs_p, _ = _bm25_paths(store_dir)
    for path, schema, part in (
        (post_p, _BM25_POST_SCHEMA, "tb"),
        (docs_p, _BM25_DOC_SCHEMA, "db"),
    ):
        df = _read_index(spark, path, schema)
        tmp = path + "_compact"
        df.write.mode("overwrite").partitionBy(part).parquet(tmp)
        spark.read.schema(schema).parquet(tmp).write.mode("overwrite").partitionBy(
            part
        ).parquet(path)
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Incremental KMV distinct sketch (r14): the second EXACT streaming fold
# (after the weighted reservoir): bottom-K over deterministic md5 hash
# values is associative and commutative, and duplicate keys collapse by
# VALUE (same key -> same hash -> distinct), so the store needs no replay
# guard at all — re-ingesting any batch is a no-op by construction. State
# is <= K rows per group forever; the estimate read from state equals the
# oracle-checked batch query's sketch columns for any batching.
# ---------------------------------------------------------------------------


def kmv_store_init(spark: SparkSession, store_dir: str) -> None:
    spark.createDataFrame([], "event_type string, v double").write.mode(
        "overwrite"
    ).parquet(store_dir)


def kmv_store_append(spark: SparkSession, new_events: DataFrame, store_dir: str) -> None:
    """Fold a batch of (event_type, user_id) into the per-group bottom-K
    hash store: union the batch's distinct hash values with the store,
    dedup by value, keep the K smallest per group (stage-then-swap)."""
    import shutil

    from pyspark.sql import Window

    from dblp_to_csv_spark.operators.statistics import KMV_K, _kmv_hash

    cur = _read_index(spark, store_dir, "event_type string, v double")
    batch = new_events.select("event_type", _kmv_hash().alias("v")).distinct()
    w = Window.partitionBy("event_type").orderBy("v")
    merged = (
        cur.unionByName(batch)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "v")
    )
    tmp = store_dir + "_swap"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(store_dir)
    shutil.rmtree(tmp, ignore_errors=True)


def kmv_store_current(spark: SparkSession, store_dir: str) -> DataFrame:
    """(event_type, k_used, kmv_estimate) from state alone — equal to the
    batch sketch_kmv_distinct's sketch columns over everything appended
    (the exact_distinct/rel_error columns are batch-side accuracy
    apparatus: reporting them requires the exact key set, which is the
    corpus-scale state the sketch exists to avoid)."""
    from dblp_to_csv_spark.functions.rounding import round_ties_down
    from dblp_to_csv_spark.operators.statistics import KMV_K

    cur = _read_index(spark, store_dir, "event_type string, v double")
    sk = cur.groupBy("event_type").agg(
        F.max("v").alias("vk"), F.count("*").alias("k_used")
    )
    est = F.when(F.col("k_used") < KMV_K, F.col("k_used")).otherwise(
        (KMV_K - 1) / F.col("vk")
    )
    return sk.select(
        "event_type",
        F.col("k_used").cast("long").alias("k_used"),
        round_ties_down(est, 4).alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# Incremental PSI drift monitor (r14): the drift family's continuous-ingest
# member. The reference arm is frozen at init time — its decile cutpoints
# (tie-down-rounded 6 dp, the batch query's contract) and 10-row bin counts
# ARE the store; each batch of current-arm events bins in-row against the
# broadcast cutpoints and folds integer-additively into the 10-row current
# counts. State is 9 cuts + 2x10 bins + 1-row meta forever; current()
# reproduces the oracle-checked drift_psi_events_value over (reference,
# everything appended) exactly, because every input to the PSI arithmetic
# (integer counts, 6-dp cuts) is maintained exactly. Counting state -> seq
# watermark for replay (the mg_store contract).
# ---------------------------------------------------------------------------


def _psi_paths(store_dir: str) -> tuple[str, str, str, str]:
    return (
        os.path.join(store_dir, "cuts"),
        os.path.join(store_dir, "ref_counts"),
        os.path.join(store_dir, "cur_counts"),
        os.path.join(store_dir, "meta"),
    )


def _psi_bin_counts(events: DataFrame, cuts: DataFrame) -> DataFrame:
    """(bin, c) counts of ``events``.value binned against the broadcast
    cutpoint row — the batch query's in-row fold, grid-completed."""
    from dblp_to_csv_spark.operators.drift import PSI_BINS

    spark = events.sparkSession
    bin_col = F.aggregate(
        F.col("cs"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
    )
    counts = (
        events.crossJoin(F.broadcast(cuts))
        .select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bins = spark.range(PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    return bins.join(counts, "bin", "left").select(
        "bin", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )


def _psi_clean(events: DataFrame) -> DataFrame:
    # the batch query's NaN-sweep policy: missing measurements join no arm
    return events.filter(F.col("value").isNotNull() & ~F.isnan("value"))


def psi_store_init(spark: SparkSession, ref_events: DataFrame, store_dir: str) -> None:
    """Freeze the reference arm: decile cutpoints (6-dp tie-down, the batch
    contract) + its 10-row bin counts."""
    from dblp_to_csv_spark.functions.rounding import round_ties_down
    from dblp_to_csv_spark.operators.drift import PSI_BINS

    cuts_p, ref_p, cur_p, meta_p = _psi_paths(store_dir)
    ref = _psi_clean(ref_events.select("value"))
    qs = F.array(*[F.lit(i / PSI_BINS) for i in range(1, PSI_BINS)])
    cuts = ref.agg(
        F.transform(F.percentile("value", qs), lambda c: round_ties_down(c, 6)).alias(
            "cs"
        )
    )
    cuts.write.mode("overwrite").parquet(cuts_p)
    cuts = spark.read.parquet(cuts_p)
    _psi_bin_counts(ref, cuts).write.mode("overwrite").parquet(ref_p)
    spark.range(PSI_BINS).select(
        F.col("id").cast("long").alias("bin"), F.lit(0).cast("long").alias("c")
    ).write.mode("overwrite").parquet(cur_p)
    spark.createDataFrame([(-1,)], "seq long").write.mode("overwrite").parquet(meta_p)


def psi_store_append(
    spark: SparkSession, cur_events: DataFrame, store_dir: str, seq: int
) -> bool:
    """Fold one current-arm batch into the 10-row counts. Returns False when
    ``seq`` was already applied (replayed micro-batch)."""
    cuts_p, _, cur_p, meta_p = _psi_paths(store_dir)
    if seq <= int(spark.read.parquet(meta_p).first()["seq"]):
        return False
    cuts = spark.read.parquet(cuts_p)
    batch = _psi_bin_counts(_psi_clean(cur_events.select("value")), cuts).withColumnRenamed(
        "c", "bc"
    )
    merged = (
        spark.read.schema("bin long, c long")
        .parquet(cur_p)
        .join(batch, "bin")
        .select("bin", (F.col("c") + F.col("bc")).alias("c"))
    )
    import shutil

    tmp = cur_p + "_swap"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(cur_p)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.createDataFrame([(int(seq),)], "seq long").write.mode("overwrite").parquet(
        meta_p
    )
    return True


def psi_store_current(spark: SparkSession, store_dir: str) -> DataFrame:
    """(n_ref, n_cur, psi) from state alone — equal to the batch
    drift_psi_events_value over (frozen reference, everything appended)."""
    from pyspark.sql import Window

    from dblp_to_csv_spark.functions.rounding import round_ties_down
    from dblp_to_csv_spark.operators.drift import PSI_BINS

    _, ref_p, cur_p, _ = _psi_paths(store_dir)
    grid = (
        spark.read.schema("bin long, c long")
        .parquet(ref_p)
        .withColumnRenamed("c", "ca")
        .join(
            spark.read.schema("bin long, c long")
            .parquet(cur_p)
            .withColumnRenamed("c", "cb"),
            "bin",
        )
    )
    w_all = Window.partitionBy()
    rates = grid.select(
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    ).select(
        ((F.col("ca") + 0.5) / (F.col("na") + PSI_BINS * 0.5)).alias("ra"),
        ((F.col("cb") + 0.5) / (F.col("nb") + PSI_BINS * 0.5)).alias("rb"),
        "na",
        "nb",
    )
    return (
        rates.groupBy("na", "nb")
        .agg(
            round_ties_down(
                F.sum((F.col("ra") - F.col("rb")) * F.log(F.col("ra") / F.col("rb"))),
                6,
            ).alias("psi")
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            F.col("na").cast("long").alias("n_ref"),
            F.col("nb").cast("long").alias("n_cur"),
            "psi",
        )
    )
