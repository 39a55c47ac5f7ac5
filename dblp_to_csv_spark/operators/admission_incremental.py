"""Continuous-ingest twin of the pretrain admission flagship (VERDICT r13
item 3): ``pretrain_report_init`` / ``pretrain_report_append`` /
``pretrain_report_current`` maintain, batch by batch, exactly the per-doc
first-failing-stage verdict that ``pretrain_corpus_report``
(operators/curation.py) computes in one shot — conflicting_key →
eval_holdout → source_cap → quality → exact_dup → near_dup → contaminated →
kept.

Sequential == batch is the CONTRACT (the tests/test_incremental_cc.py pin
pattern): after appending batches b1..bn, ``pretrain_report_current`` must
equal one ``pretrain_corpus_report`` over the union — including every
revision cascade a late arrival can trigger:

* a conflicting payload for an old doc_id quarantines the OLD doc too,
  frees its per-source cap slot (the next-best overflow doc re-enters),
  and — if the doc was an eval doc — shrinks the contamination eval set;
* a new doc whose md5 sorts into a full cap EVICTS the current worst
  in-cap doc of that source;
* a smaller-id exact duplicate steals its group's canonical slot — the old
  canonical leaves the near-dup corpus (its edges go with it, which can
  SPLIT a component);
* a new eval doc contaminates historical kept docs that share shingles.

Architecture — signals once, verdicts by dirty-set repair:

* The O(corpus-text) work (Gopher battery, MinHash signatures + exact
  Jaccard shingle sets, 3-gram inverted index rows) runs ONCE per document,
  on the batch that ingests it. Nothing corpus-sized is ever reprocessed or
  reshuffled.
* Every cross-doc decision lives in a narrow partitioned index probed by
  key — row-fingerprints by doc bucket (conflicts), cap competitors by
  source bucket, exact groups by fingerprint bucket, MinHash bands by band,
  verified near-dup pairs by endpoint bucket, shingle inverted indexes by
  gram bucket — plus the cc_store (operators/incremental.py) for near-dup
  components.
* Per batch, the DIRTY closure (batch docs + every historical doc whose
  verdict inputs changed) is recomputed exactly and appended to a
  seq-versioned verdict store; untouched docs are never re-read.

Declared expensive paths (the IVF_RETRAIN_GROWTH family of amortized
rules): (1) a doc LEAVING the near-dup corpus (canonical eviction,
conflict) can split a component, so deletions rebuild the nd store from the
live pairs — pairs-store-sized (duplicate-density-sized, orders below the
corpus), never corpus-sized; (2) the in-cap table rewrite is
(sources × SOURCE_CAP)-bounded. Driver-side state is batch/dirty-set-sized
throughout (the cc_store_append contract); the conflict set is
violation-rate-sized by the same declaration the batch flagship makes with
its broadcast anti-join.

No DuckDB oracle by design (stateful multi-call I/O — COVERAGE.md standing
exception register); the pytest gate is sequential-equals-batch parity at
every prefix plus targeted cascade pins (tests/test_admission_incremental.py).
"""

from __future__ import annotations

import os
import shutil
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import round_ties_down
from dblp_to_csv_spark.functions.text import shingles, words
from dblp_to_csv_spark.operators.curation import SOURCE_CAP, gopher_metrics
from dblp_to_csv_spark.operators.dedup import JACCARD_THRESHOLD
from dblp_to_csv_spark.operators.incremental import (
    _bands,
    _minhash_signature,
    _read_index,
    _stage,
    cc_store_init,
    cc_store_append,
    cc_store_lookup,
    _cc_paths,
    _cc_resolve_roots,
)
from dblp_to_csv_spark.operators.pipeline import EVAL_MOD

DOC_BUCKETS = 64  # doc_id-keyed stores: pmod(doc_id, N) — python % agrees
GRAM_BUCKETS = 256  # shingle-keyed inverted indexes: pmod(hash(shingle), N)
FP_BUCKETS = 64  # md5(text)-keyed exact groups
SRC_BUCKETS = 64  # source-keyed cap competitors
_NULL_SRC = "\x00NULL_SOURCE\x00"  # null source forms ONE cap group (window
# over a null partition key does the same in the batch flagship)

_SIG_SCHEMA = (
    "doc_id long, is_eval boolean, source string, md5key string, "
    "q_ok boolean, text_fp string, db int"
)
_ROWFP_SCHEMA = "doc_id long, row_fp string, db int"
_CONF_SCHEMA = "doc_id long"
_CAP_SCHEMA = "doc_id long, source string, md5key string, sb int"
_INCAP_SCHEMA = "source string, doc_id long"
_FP_SCHEMA = "doc_id long, text_fp string, fb int"
_MH_SCHEMA = "doc_id long, bandkey string, band int"
_SH_SCHEMA = "doc_id long, sh array<string>, db int"
_PAIR_SCHEMA = "u long, v long, ub int"
_GRAM_SCHEMA = "shingle string, doc_id long, gb int"
_VD_SCHEMA = (
    "doc_id long, stage string, cap_ok boolean, exact_keep boolean, "
    "eligible boolean, nd_fail boolean, contaminated boolean, seq long, db int"
)

_STORES = (
    "sig",
    "rowfp",
    "conf",
    "capidx",
    "incap",
    "fpidx",
    "mh",
    "shsets",
    "pairs",
    "nd",
    "evgram",
    "docgram",
    "verdict",
    "meta",
)


def _paths(index_dir: str) -> dict[str, str]:
    return {name: os.path.join(index_dir, name) for name in _STORES}


def _ids_df(spark: SparkSession, ids, col: str = "doc_id") -> DataFrame:
    return spark.createDataFrame([(int(i),) for i in sorted(ids)], f"{col} long")


def _probe_docs(
    spark: SparkSession, path: str, schema: str, ids, id_col: str = "doc_id"
) -> DataFrame:
    """Partition-pruned probe of a doc-bucketed store for specific ids —
    the cc_store membership-probe shape (PartitionFilters on db)."""
    if not ids:
        return spark.createDataFrame([], schema)
    buckets = sorted({int(i) % DOC_BUCKETS for i in ids})
    return (
        _read_index(spark, path, schema)
        .filter(F.col("db").isin(buckets))
        .join(F.broadcast(_ids_df(spark, ids, id_col)), id_col, "left_semi")
    )


def _str_buckets(probe: DataFrame, key_col: str, n: int) -> list[int]:
    """The distinct pmod(hash(key), n) buckets present in a (small, staged)
    probe frame — one tiny aggregate; hash() must be Spark's, not python's."""
    return [
        r[0]
        for r in probe.select(
            F.pmod(F.hash(key_col), F.lit(n)).alias("b")
        )
        .distinct()
        .collect()
    ]


def _probe_keys(
    spark: SparkSession,
    path: str,
    schema: str,
    probe: DataFrame,
    key_col: str,
    bucket_col: str,
    n: int,
) -> DataFrame:
    """Partition-pruned semi-probe of a hash-bucketed store by a staged
    key frame (shingles, fingerprints): prune to the probe's buckets, then
    broadcast-semi-join on the key."""
    buckets = _str_buckets(probe, key_col, n)
    if not buckets:
        return spark.createDataFrame([], schema)
    return (
        _read_index(spark, path, schema)
        .filter(F.col(bucket_col).isin(buckets))
        .join(F.broadcast(probe.select(key_col).distinct()), key_col, "left_semi")
    )


def _vc_latest(spark: SparkSession, vpath: str) -> DataFrame:
    """Latest verdict row per doc — the report itself, so inherently
    doc-count-sized; per-batch code paths use _vc_probe instead."""
    df = _read_index(spark, vpath, _VD_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def _vc_probe(spark: SparkSession, vpath: str, ids) -> dict[int, dict]:
    """Latest verdict rows for specific docs — bucket-pruned probe, then a
    dirty-set-sized collect (the cc_store_append driver-state contract)."""
    if not ids:
        return {}
    rows = _probe_docs(spark, vpath, _VD_SCHEMA, ids)
    w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
    latest = rows.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    return {r["doc_id"]: r.asDict() for r in latest.collect()}


def _sig_probe(spark: SparkSession, spath: str, ids) -> dict[int, dict]:
    return {
        r["doc_id"]: r.asDict()
        for r in _probe_docs(spark, spath, _SIG_SCHEMA, ids).collect()
    }


def _db(col):
    return F.pmod(col, F.lit(DOC_BUCKETS)).cast("int")


def pretrain_report_init(spark: SparkSession, index_dir: str) -> None:
    """Create the empty store family. Every store is explicit-schema parquet
    (the _read_index discipline) so a young index never mis-infers."""
    p = _paths(index_dir)
    for name, schema, part in (
        ("sig", _SIG_SCHEMA, "db"),
        ("rowfp", _ROWFP_SCHEMA, "db"),
        ("conf", _CONF_SCHEMA, None),
        ("capidx", _CAP_SCHEMA, "sb"),
        ("incap", _INCAP_SCHEMA, None),
        ("fpidx", _FP_SCHEMA, "fb"),
        ("mh", _MH_SCHEMA, "band"),
        ("shsets", _SH_SCHEMA, "db"),
        ("pairs", _PAIR_SCHEMA, "ub"),
        ("evgram", _GRAM_SCHEMA, "gb"),
        ("docgram", _GRAM_SCHEMA, "gb"),
        ("verdict", _VD_SCHEMA, "db"),
    ):
        df = spark.createDataFrame([], schema)
        w = df.write.mode("overwrite")
        if part:
            w = w.partitionBy(part)
        w.parquet(p[name])
    cc_store_init(spark, spark.createDataFrame([], "u long, v long"), p["nd"])
    spark.createDataFrame([(0,)], "seq long").write.mode("overwrite").parquet(
        p["meta"]
    )


def _enrich(batch: DataFrame) -> DataFrame:
    """Per-row ingest signals — the exact expressions the batch flagship
    uses (curation.py::pretrain_corpus_report): md5(doc_id) cap sort key,
    doc_id % EVAL_MOD eval split, md5(text) exact group (null text → one
    'NULL' group, matching the window-over-null-partition batch behavior),
    Gopher keep, and a full-row fingerprint over the sorted non-id columns
    (null sentinel + unit separators) standing in for row identity."""
    cols = sorted(c for c in batch.columns if c != "doc_id")
    row_fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
        )
    )
    # min() collapses the multi-row verdicts an in-batch CONFLICTING doc_id
    # produces (its q_ok is never consumed — conflicts quarantine before
    # quality) so the join below cannot fan the batch
    g = (
        gopher_metrics(batch)
        .groupBy("doc_id")
        .agg(F.min("keep").alias("q_ok"))
    )
    return (
        batch.withColumn("row_fp", row_fp)
        .withColumn("text_fp", F.coalesce(F.md5("text"), F.lit("NULL")))
        .withColumn("is_eval", (F.col("doc_id") % EVAL_MOD) == 0)
        .withColumn("md5key", F.md5(F.col("doc_id").cast("string")))
        .withColumn("src", F.coalesce(F.col("source"), F.lit(_NULL_SRC)))
        .join(g, "doc_id", "left")
    )


def _surv1(st: dict) -> bool:
    """Stage-3 survivorship from a flags dict — eval, cap, quality, and
    the conflict quarantine all gate it, exactly the batch filter."""
    return (
        not st.get("conf", False)
        and not st.get("is_eval", False)
        and bool(st.get("cap_ok"))
        and bool(st.get("q_ok"))
    )


def _stage_of(st: dict) -> str:
    """The batch flagship's first-failing-stage when-chain over a flags
    dict (curation.py::pretrain_corpus_report final select)."""
    if st.get("conf"):
        return "conflicting_key"
    if st.get("is_eval"):
        return "eval_holdout"
    if not st.get("cap_ok"):
        return "source_cap"
    if not st.get("q_ok"):
        return "quality"
    if not st.get("exact_keep"):
        return "exact_dup"
    if st.get("nd_fail"):
        return "near_dup"
    if st.get("contaminated"):
        return "contaminated"
    return "kept"


def pretrain_report_append(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    staging_dir: str | None = None,
) -> dict:
    """Fold one ingest batch into the admission store; returns maintenance
    stats. See the module docstring for the phase plan; each phase is a
    pruned index probe plus a dirty-set-sized driver fold."""
    p = _paths(index_dir)
    seq = int(spark.read.parquet(p["meta"]).first()["seq"]) + 1

    batch = new_docs.distinct()
    enr = _stage(_enrich(batch), staging_dir, "adm_enr")
    brows = [
        r.asDict()
        for r in enr.select(
            "doc_id", "row_fp", "text_fp", "is_eval", "src", "md5key", "q_ok"
        ).collect()
    ]
    ids = sorted({r["doc_id"] for r in brows})

    # -- phase 1: conflicts (row-fingerprint accumulation per doc_id) ------
    conf_prev = {
        r["doc_id"] for r in _read_index(spark, p["conf"], _CONF_SCHEMA).collect()
    }
    hist_fp: dict[int, set] = defaultdict(set)
    for r in _probe_docs(spark, p["rowfp"], _ROWFP_SCHEMA, ids).collect():
        hist_fp[r["doc_id"]].add(r["row_fp"])
    all_fp: dict[int, set] = defaultdict(set)
    for i, s in hist_fp.items():
        all_fp[i] |= s
    for r in brows:
        all_fp[r["doc_id"]].add(r["row_fp"])
    new_conf = {i for i, s in all_fp.items() if len(s) > 1} - conf_prev
    conf_all = conf_prev | new_conf
    new_fp_rows = [
        (r["doc_id"], r["row_fp"])
        for r in brows
        if r["row_fp"] not in hist_fp.get(r["doc_id"], set())
    ]
    if new_fp_rows:
        spark.createDataFrame(
            sorted(set(new_fp_rows)), "doc_id long, row_fp string"
        ).withColumn("db", _db(F.col("doc_id"))).write.mode("append").partitionBy(
            "db"
        ).parquet(p["rowfp"])
    if new_conf:
        _ids_df(spark, new_conf).write.mode("append").parquet(p["conf"])

    # -- phase 2: ingest (signals once per never-seen, non-conflicting doc)
    sig_known = _sig_probe(spark, p["sig"], ids)
    ingest_ids = [i for i in ids if i not in sig_known and i not in conf_all]
    bmeta = {r["doc_id"]: r for r in brows}
    ing = _stage(
        enr.join(F.broadcast(_ids_df(spark, ingest_ids)), "doc_id", "left_semi"),
        staging_dir,
        "adm_ing",
    )
    staged_w = ing.select("doc_id", "is_eval", words("text").alias("w"))
    # sh_df and bands_b both derive from the STAGED ``ing`` parquet and
    # write distinct staging paths — materialize them CONCURRENTLY from two
    # driver threads (guide §2.6, the graph_report pattern): the batch pays
    # max(shingle-set, signature) instead of the sum. Spark actions are
    # thread-safe; _stage writes a fresh unique subdirectory per call.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _sp:
        _f_sh = _sp.submit(
            _stage,
            staged_w.select(
                "doc_id",
                "is_eval",
                F.array_distinct(shingles(F.col("w"))).alias("sh"),
            ),
            staging_dir,
            "adm_sh",
        )
        # near-dup candidates probe the PRE-batch band index (history side)
        _f_bands = _sp.submit(
            _stage,
            _bands(_minhash_signature(ing.select("doc_id", "text"))).select(
                "doc_id", "band", "bandkey"
            ),
            staging_dir,
            "adm_bands",
        )
        sh_df, bands_b = _f_sh.result(), _f_bands.result()
    probe = F.broadcast(bands_b.withColumnRenamed("doc_id", "new_id"))
    hist_cand = (
        _read_index(spark, p["mh"], _MH_SCHEMA)
        .join(probe, ["band", "bandkey"])
        .filter(F.col("doc_id") != F.col("new_id"))
        .select(
            F.least("doc_id", "new_id").alias("doc_a"),
            F.greatest("doc_id", "new_id").alias("doc_b"),
        )
    )
    a, b = bands_b.alias("a"), bands_b.alias("b")
    batch_cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bandkey") == F.col("b.bandkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    cand = _stage(
        hist_cand.union(batch_cand).distinct(), staging_dir, "adm_cand"
    )
    cand_ids = {
        r[0]
        for r in cand.select(F.explode(F.array("doc_a", "doc_b"))).collect()
    }
    hist_sh = _probe_docs(
        spark, p["shsets"], _SH_SCHEMA, cand_ids - set(ingest_ids)
    ).select("doc_id", "sh")
    all_sh = sh_df.select("doc_id", "sh").join(
        F.broadcast(_ids_df(spark, cand_ids & set(ingest_ids))),
        "doc_id",
        "left_semi",
    ).union(hist_sh)
    sa = all_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb_ = all_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    i_ = F.size(F.array_intersect("sha", "shb"))
    # identical verification expression to minhash_lsh_pairs — exact
    # Jaccard over distinct shingle sets, round_ties_down(·, 6) ≥ threshold
    new_pairs = _stage(
        cand.join(sa, "doc_a")
        .join(sb_, "doc_b")
        .filter(
            round_ties_down(i_ * 1.0 / (F.size("sha") + F.size("shb") - i_), 6)
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b"),
        staging_dir,
        "adm_pairs",
    )
    sym = new_pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(new_pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))

    # ...then the batch's own rows join every per-doc index. All eight
    # appends below read ONLY staged parquet (ing / sh_df / bands_b /
    # new_pairs — the stability barrier already materialized each) and
    # every append targets its OWN index path, so they are mutually
    # independent write jobs: submit them from a small driver thread pool
    # (guide §2.6) instead of serially — the append half of the measured
    # fixed cost collapses from the sum of eight job latencies toward the
    # depth of four. Phase 3 reads p["sig"]/p["capidx"] and therefore
    # joins AFTER the pool drains.
    grams = sh_df.select(
        "doc_id", "is_eval", F.explode("sh").alias("shingle")
    ).withColumn("gb", F.pmod(F.hash("shingle"), F.lit(GRAM_BUCKETS)).cast("int"))
    _appends = [
        lambda: sym.withColumn("ub", _db(F.col("u")))
        .write.mode("append").partitionBy("ub").parquet(p["pairs"]),
        lambda: ing.select(
            "doc_id",
            "is_eval",
            F.col("src").alias("source"),
            "md5key",
            "q_ok",
            "text_fp",
        )
        .withColumn("db", _db(F.col("doc_id")))
        .write.mode("append").partitionBy("db").parquet(p["sig"]),
        lambda: ing.filter(~F.col("is_eval"))
        .select("doc_id", F.col("src").alias("source"), "md5key")
        .withColumn("sb", F.pmod(F.hash("source"), F.lit(SRC_BUCKETS)).cast("int"))
        .write.mode("append").partitionBy("sb").parquet(p["capidx"]),
        lambda: ing.select("doc_id", "text_fp")
        .withColumn("fb", F.pmod(F.hash("text_fp"), F.lit(FP_BUCKETS)).cast("int"))
        .write.mode("append").partitionBy("fb").parquet(p["fpidx"]),
        lambda: sh_df.select("doc_id", "sh")
        .withColumn("db", _db(F.col("doc_id")))
        .write.mode("append").partitionBy("db").parquet(p["shsets"]),
        lambda: bands_b.select("doc_id", "bandkey", "band")
        .write.mode("append").partitionBy("band").parquet(p["mh"]),
        lambda: grams.filter("is_eval").select("shingle", "doc_id", "gb")
        .write.mode("append").partitionBy("gb").parquet(p["evgram"]),
        lambda: grams.filter("NOT is_eval").select("shingle", "doc_id", "gb")
        .write.mode("append").partitionBy("gb").parquet(p["docgram"]),
    ]
    with ThreadPoolExecutor(max_workers=4) as _ap:
        for _f in [_ap.submit(t) for t in _appends]:
            _f.result()

    # -- phase 3: per-source cap repair ------------------------------------
    conf_hist_meta = _sig_probe(spark, p["sig"], new_conf & set(sig_known))
    dirty_sources = {
        bmeta[i]["src"] for i in ingest_ids if not bmeta[i]["is_eval"]
    } | {
        (r["source"] if r["source"] is not None else _NULL_SRC)
        for r in conf_hist_meta.values()
        if not r["is_eval"]
    }
    cap_gain: set[int] = set()
    cap_lose: set[int] = set()
    if dirty_sources:
        src_probe = spark.createDataFrame(
            [(s,) for s in sorted(dirty_sources)], "source string"
        )
        comp = (
            _read_index(spark, p["capidx"], _CAP_SCHEMA)
            .filter(
                F.col("sb").isin(_str_buckets(src_probe, "source", SRC_BUCKETS))
            )
            .join(F.broadcast(src_probe), "source", "left_semi")
        )
        if conf_all:
            comp = comp.join(
                F.broadcast(_ids_df(spark, conf_all)), "doc_id", "left_anti"
            )
        w = Window.partitionBy("source").orderBy("md5key", "doc_id")
        newcap_rows = {
            (r["source"], r["doc_id"])
            for r in comp.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= SOURCE_CAP)
            .select("source", "doc_id")
            .collect()
        }
        oldcap_rows = {
            (r["source"], r["doc_id"])
            for r in _read_index(spark, p["incap"], _INCAP_SCHEMA)
            .join(F.broadcast(src_probe), "source", "left_semi")
            .collect()
        }
        cap_gain = {d for _, d in newcap_rows - oldcap_rows}
        cap_lose = {d for _, d in oldcap_rows - newcap_rows}
        # bounded (sources × SOURCE_CAP) full rewrite, staged-then-swap
        keep = _read_index(spark, p["incap"], _INCAP_SCHEMA).join(
            F.broadcast(src_probe), "source", "left_anti"
        )
        repl = keep.union(
            spark.createDataFrame(
                sorted(newcap_rows) or [], _INCAP_SCHEMA
            )
        )
        tmp = p["incap"] + "_swap"
        repl.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(p["incap"])
        shutil.rmtree(tmp, ignore_errors=True)

    # -- phase 4: dirty-state fold (old flags + overlays) ------------------
    dirty: set[int] = set(ingest_ids) | new_conf | cap_gain | cap_lose
    old_vc = _vc_probe(spark, p["verdict"], dirty - set(ingest_ids))
    sig_meta = dict(sig_known)
    sig_meta.update(_sig_probe(spark, p["sig"], dirty - set(sig_meta)))

    def old_flags(i: int) -> dict:
        v = old_vc.get(i, {})
        s = sig_meta.get(i, {})
        return {
            "conf": v.get("stage") == "conflicting_key",
            "is_eval": bool(s.get("is_eval")),
            "q_ok": bool(s.get("q_ok")),
            "cap_ok": bool(v.get("cap_ok")),
            "exact_keep": bool(v.get("exact_keep")),
            "eligible": bool(v.get("eligible")),
            "nd_fail": bool(v.get("nd_fail")),
            "contaminated": bool(v.get("contaminated")),
            "text_fp": s.get("text_fp"),
        }

    state: dict[int, dict] = {i: old_flags(i) for i in dirty}
    for i in ingest_ids:
        m = bmeta[i]
        state[i].update(
            is_eval=bool(m["is_eval"]),
            q_ok=bool(m["q_ok"]),
            text_fp=m["text_fp"],
            cap_ok=False,
        )
    for i in new_conf:
        state[i].update(conf=True, cap_ok=False, q_ok=False)
    for i in cap_gain:
        state[i]["cap_ok"] = True
    for i in cap_lose:
        state[i]["cap_ok"] = False

    # -- phase 5: exact-group canonical re-election ------------------------
    surv_changed = {
        i
        for i in dirty
        if _surv1(state[i]) != _surv1(old_flags(i)) or i in ingest_ids
    }
    dirty_fps = {
        state[i]["text_fp"] for i in surv_changed if state[i]["text_fp"]
    }
    if dirty_fps:
        fp_probe = spark.createDataFrame(
            [(s,) for s in sorted(dirty_fps)], "text_fp string"
        )
        members = [
            (r["doc_id"], r["text_fp"])
            for r in _probe_keys(
                spark, p["fpidx"], _FP_SCHEMA, fp_probe, "text_fp", "fb", FP_BUCKETS
            )
            .select("doc_id", "text_fp")
            .collect()
        ]
        member_ids = {d for d, _ in members}
        extra = member_ids - set(state)
        old_vc.update(_vc_probe(spark, p["verdict"], extra))
        sig_meta.update(_sig_probe(spark, p["sig"], extra - set(sig_meta)))
        for i in extra:
            state[i] = old_flags(i)
        by_fp: dict[str, list[int]] = defaultdict(list)
        for d, fp in members:
            by_fp[fp].append(d)
        for fp, mem in by_fp.items():
            surv = [d for d in mem if _surv1(state[d])]
            canon = min(surv) if surv else None
            for d in mem:
                ek = _surv1(state[d]) and d == canon
                el = _surv1(state[d]) and ek
                if (
                    ek != state[d]["exact_keep"]
                    or el != state[d]["eligible"]
                    or d in surv_changed
                ):
                    dirty.add(d)
                state[d]["exact_keep"] = ek
                state[d]["eligible"] = el
    # docs whose surv1 flipped but have NO text_fp group effect still need
    # their own eligibility cleared/set
    for i in surv_changed:
        if not _surv1(state[i]):
            state[i]["exact_keep"] = False
            state[i]["eligible"] = False

    old_elig = {i: old_flags(i)["eligible"] for i in state}
    entering = {i for i in state if state[i]["eligible"] and not old_elig[i]}
    leaving = {i for i in state if old_elig[i] and not state[i]["eligible"]}

    # -- phase 6: near-dup components --------------------------------------
    nd_repair = bool(leaving)
    mem_path, mrg_path, _meta = _cc_paths(p["nd"])
    nd_flips: set[int] = set()
    if nd_repair:
        # declared expensive path: deletions can split components, so
        # rebuild from live pairs (pairs-store-sized, never corpus-sized)
        old_labels = _stage(
            _cc_resolve_roots(
                spark,
                _read_index(
                    spark, mem_path, "node long, root long, nb int"
                ).select("node", "root"),
                mrg_path,
            ),
            staging_dir,
            "adm_ndold",
        )
        changed = _ids_df(spark, entering | leaving)
        live = (
            _vc_latest(spark, p["verdict"])
            .filter("eligible")
            .select(F.col("doc_id").alias("node"))
            .join(F.broadcast(changed), F.col("node") == F.col("doc_id"), "left_anti")
            .union(_ids_df(spark, entering).select(F.col("doc_id").alias("node")))
        )
        live_edges = (
            _read_index(spark, p["pairs"], _PAIR_SCHEMA)
            .filter(F.col("u") < F.col("v"))
            .join(live.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(live.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
        )
        live_edges = _stage(live_edges, staging_dir, "adm_ndedges")
        cc_store_init(spark, live_edges, p["nd"])
        new_labels = _read_index(
            spark, mem_path, "node long, root long, nb int"
        ).select("node", F.col("root").alias("new_root"))
        diff = old_labels.join(new_labels, "node", "full").filter(
            ~F.col("root").eqNullSafe(F.col("new_root"))
        )
        nd_flips = {r["node"] for r in diff.select("node").collect()}
    elif entering:
        ent_df = _ids_df(spark, entering)
        inc = (
            _read_index(spark, p["pairs"], _PAIR_SCHEMA)
            .filter(F.col("ub").isin(sorted({i % DOC_BUCKETS for i in entering})))
            .join(F.broadcast(ent_df.withColumnRenamed("doc_id", "u")), "u", "left_semi")
            .select("u", "v")
        )
        inc_rows = [(r["u"], r["v"]) for r in inc.collect()]
        other = {v for _, v in inc_rows} - entering
        other_elig = {
            i
            for i, row in _vc_probe(spark, p["verdict"], other - set(state)).items()
            if row.get("eligible")
        } | {i for i in other & set(state) if state[i]["eligible"]}
        edges = [
            (u, v)
            for u, v in inc_rows
            if v in entering or v in other_elig
        ]
        pre_merges = {
            (r["old_root"], r["new_root"])
            for r in _read_index(
                spark, mrg_path, "old_root long, new_root long"
            ).collect()
        }
        if edges:
            cc_store_append(
                spark,
                spark.createDataFrame(sorted(set(edges)), "u long, v long"),
                p["nd"],
            )
            post_merges = {
                (r["old_root"], r["new_root"])
                for r in _read_index(
                    spark, mrg_path, "old_root long, new_root long"
                ).collect()
            }
            # merge events cover previously-TRACKED roots; a historical
            # eligible SINGLETON (kept, never paired, so never in the store)
            # that gains its first edge this batch flips without one — every
            # historical endpoint of a new edge re-derives via lookup
            nd_flips = {o for o, _ in post_merges - pre_merges} | {
                v for _, v in edges if v not in entering
            }
    dirty |= nd_flips
    nd_extra = nd_flips - set(state)
    if nd_extra:
        old_vc.update(_vc_probe(spark, p["verdict"], nd_extra))
        sig_meta.update(_sig_probe(spark, p["sig"], nd_extra - set(sig_meta)))
        for i in nd_extra:
            state[i] = old_flags(i)

    # nd_fail for every eligible dirty doc from the maintained store
    elig_dirty = {i for i in dirty if state[i]["eligible"]}
    if elig_dirty:
        lk = cc_store_lookup(spark, _ids_df(spark, elig_dirty, "node"), p["nd"])
        roots = {r["node"]: r["component"] for r in lk.collect()}
        for i in elig_dirty:
            state[i]["nd_fail"] = roots.get(i, i) != i
    for i in dirty:
        if not state[i]["eligible"]:
            state[i]["nd_fail"] = False

    # -- phase 7: contamination maintenance --------------------------------
    conf_df = _ids_df(spark, conf_all, "ev_doc") if conf_all else None

    def _ev_hits(probe_sh: DataFrame) -> set[int]:
        """doc_ids among ``probe_sh`` (doc_id, shingle) sharing ≥1 shingle
        with the CURRENT eval set (evgram minus conflicting eval docs)."""
        ev = _probe_keys(
            spark,
            p["evgram"],
            _GRAM_SCHEMA,
            probe_sh,
            "shingle",
            "gb",
            GRAM_BUCKETS,
        ).withColumnRenamed("doc_id", "ev_doc")
        if conf_df is not None:
            ev = ev.join(F.broadcast(conf_df), "ev_doc", "left_anti")
        return {
            r["doc_id"]
            for r in probe_sh.join(
                ev.select("shingle").distinct(), "shingle", "left_semi"
            )
            .select("doc_id")
            .distinct()
            .collect()
        }

    batch_tr_sh = _stage(
        sh_df.filter("NOT is_eval").select("doc_id", F.explode("sh").alias("shingle")),
        staging_dir,
        "adm_btr",
    )
    cont_batch = _ev_hits(batch_tr_sh)
    for i in ingest_ids:
        if not bmeta[i]["is_eval"]:
            state[i]["contaminated"] = i in cont_batch

    # historical docs affected by eval-set growth (new eval docs) or
    # shrinkage (eval docs quarantined as conflicting this batch)
    new_ev_sh = sh_df.filter("is_eval").select("doc_id", F.explode("sh").alias("shingle"))
    rem_ev = {i for i in new_conf if sig_meta.get(i, {}).get("is_eval")}
    rem_ev_sh = _probe_docs(spark, p["shsets"], _SH_SCHEMA, rem_ev).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    delta_sh = _stage(
        new_ev_sh.union(rem_ev_sh).select("shingle").distinct(),
        staging_dir,
        "adm_devsh",
    )
    affected = {
        r["doc_id"]
        for r in _probe_keys(
            spark, p["docgram"], _GRAM_SCHEMA, delta_sh, "shingle", "gb", GRAM_BUCKETS
        )
        .select("doc_id")
        .distinct()
        .collect()
    } - set(ingest_ids)
    if affected:
        aff_sh = _stage(
            _probe_docs(spark, p["shsets"], _SH_SCHEMA, affected).select(
                "doc_id", F.explode("sh").alias("shingle")
            ),
            staging_dir,
            "adm_affsh",
        )
        cont_now = _ev_hits(aff_sh)
        extra = affected - set(state)
        old_vc.update(_vc_probe(spark, p["verdict"], extra))
        sig_meta.update(_sig_probe(spark, p["sig"], extra - set(sig_meta)))
        for i in affected:
            if i not in state:
                state[i] = old_flags(i)
            newc = i in cont_now
            if newc != state[i]["contaminated"]:
                state[i]["contaminated"] = newc
                dirty.add(i)

    # -- phase 8: verdict assembly for the dirty closure -------------------
    out_rows = [
        (
            int(i),
            _stage_of(state[i]),
            bool(state[i]["cap_ok"]),
            bool(state[i]["exact_keep"]),
            bool(state[i]["eligible"]),
            bool(state[i]["nd_fail"]),
            bool(state[i]["contaminated"]),
            seq,
        )
        for i in sorted(dirty)
    ]
    if out_rows:
        spark.createDataFrame(
            out_rows,
            "doc_id long, stage string, cap_ok boolean, exact_keep boolean, "
            "eligible boolean, nd_fail boolean, contaminated boolean, seq long",
        ).withColumn("db", _db(F.col("doc_id"))).write.mode("append").partitionBy(
            "db"
        ).parquet(p["verdict"])
    spark.createDataFrame([(seq,)], "seq long").write.mode("overwrite").parquet(
        p["meta"]
    )
    return {
        "seq": seq,
        "ingested": len(ingest_ids),
        "new_conflicts": len(new_conf),
        "cap_flips": len(cap_gain | cap_lose),
        "entering": len(entering),
        "leaving": len(leaving),
        "nd_repair": nd_repair,
        "nd_flips": len(nd_flips),
        "verdicts_written": len(out_rows),
    }


def pretrain_report_current(spark: SparkSession, index_dir: str) -> DataFrame:
    """The admission report as of the last append: (doc_id, stage), one row
    per ever-ingested doc_id — the frame ``pretrain_corpus_report`` returns
    for the same corpus (the parity pin)."""
    p = _paths(index_dir)
    return _vc_latest(spark, p["verdict"]).select("doc_id", "stage")
