"""Continuous-ingest admission pipeline (operators/admission_incremental.py):
sequential-equals-batch parity against the flagship ``pretrain_corpus_report``
at EVERY batch prefix, plus targeted pins for each revision cascade a late
arrival can trigger — late conflicts freeing cap slots, exact-canonical
re-election, near-dup component splits on deletion, and eval-set
growth/shrinkage flipping contamination."""

from __future__ import annotations

import hashlib

import pytest

from dblp_to_csv_spark.operators.admission_incremental import (
    pretrain_report_append,
    pretrain_report_current,
    pretrain_report_init,
)
from dblp_to_csv_spark.operators.curation import pretrain_corpus_report
from tests.conftest import SF_SMOKE

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _row(doc_id, text, source="s1"):
    return (doc_id, text, "en", source, len(text))


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _batch_report(spark, tmp_path, rows, tag):
    """Ground truth: the batch flagship over the union corpus."""
    d = tmp_path / f"corpus_{tag}"
    d.mkdir(exist_ok=True)
    _docs_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return {
        r["doc_id"]: r["stage"]
        for r in pretrain_corpus_report(spark, str(d)).collect()
    }


def _inc_report(spark, idx):
    return {
        r["doc_id"]: r["stage"]
        for r in pretrain_report_current(spark, idx).collect()
    }


def _run_batches(spark, tmp_path, batches, tag, check_prefixes=True):
    """Append batches sequentially; assert parity with the batch flagship at
    every prefix (the sequential==batch contract). Returns the final report."""
    idx = str(tmp_path / f"adm_{tag}")
    pretrain_report_init(spark, idx)
    seen: list = []
    for k, rows in enumerate(batches):
        pretrain_report_append(
            spark,
            _docs_df(spark, rows),
            idx,
            staging_dir=str(tmp_path / f"stg_{tag}_{k}"),
        )
        seen.extend(rows)
        if check_prefixes or k == len(batches) - 1:
            got = _inc_report(spark, idx)
            want = _batch_report(spark, tmp_path, seen, f"{tag}_{k}")
            assert got == want, {
                i: (got.get(i), want.get(i))
                for i in set(got) | set(want)
                if got.get(i) != want.get(i)
            }
    return _inc_report(spark, idx)


# 11 distinct words, two stopwords (the/of), mean len ~5.5, top ratio 1/11 —
# passes every Gopher rule; callers perturb words to build near-dup chains
QWORDS = (
    "the summit of granite ridges holds twelve ancient cedar groves quietly"
)


def _q(*swap):
    """Quality-passing text with positional word swaps [(idx, word), ...]."""
    w = QWORDS.split()
    for i, word in swap:
        w[i] = word
    return " ".join(w)


# 23-word quality-passing base for the near-dup CHAIN pins; word swaps at
# indices (3, 6, 9) were solved offline against the exact md5 band/Jaccard
# construction so that P~Q (J=0.75) and Q~R (J=0.556) are banded AND pass
# exact-Jaccard verification while P-R (J=0.4) does not — the chain exists
# only through Q.
BASE23 = (
    "the summit of granite ridges holds twelve ancient cedar groves quietly "
    "while marble valleys gather silver streams beneath copper skies during "
    "early winter"
)


def _b23(*swap):
    w = BASE23.split()
    for i, word in swap:
        w[i] = word
    return " ".join(w)


def test_prefix_parity_real_corpus(spark, tmp_path):
    """Real sf0.001 documents table in three arrival batches — parity at
    every prefix (covers the natural mix of quality fails, exact dups,
    near-dups, eval holdout, and contamination in driver data)."""
    rows = [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ]
    third = max(1, len(rows) // 3)
    batches = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    _run_batches(spark, tmp_path, [b for b in batches if b], "real")


def test_batching_invariance(spark, tmp_path):
    """Same union through different splits ends in the same report."""
    rows = [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ][:30]
    one = _run_batches(spark, tmp_path, [rows], "big", check_prefixes=False)
    alt = _run_batches(
        spark,
        tmp_path,
        [rows[i::4] for i in range(4)],
        "interleaved",
        check_prefixes=False,
    )
    assert one == alt


def test_late_conflict_frees_cap_slot(spark, tmp_path):
    """Batch 2 re-ingests an IN-CAP doc with a different payload: both
    copies quarantine as conflicting_key, the slot frees, and the overflow
    doc with the next-best md5 re-enters the cap — a pure revision of two
    historical verdicts."""
    # 17 non-eval docs, one source; cap is 15, so 2 overflow. md5(doc_id)
    # ordering decides who is in-cap — computed here to pick a victim that
    # IS in-cap and a beneficiary that IS overflow.
    ids = [i for i in range(101, 125) if i % 10][:17]
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    incap, overflow = order[:15], order[15:]
    rows = [_row(i, _q((3, f"word{i}"), (5, f"talk{i}"))) for i in ids]
    idx = str(tmp_path / "adm_cap")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows), idx)
    r1 = _inc_report(spark, idx)
    victim, heir = incap[0], overflow[0]
    assert r1[victim] == "kept"
    assert r1[heir] == "source_cap"
    # conflicting re-ingest of the victim
    pretrain_report_append(
        spark, _docs_df(spark, [_row(victim, "conflicting payload text")]), idx
    )
    r2 = _inc_report(spark, idx)
    assert r2[victim] == "conflicting_key"
    assert r2[heir] == "kept"
    want = _batch_report(
        spark,
        tmp_path,
        rows + [_row(victim, "conflicting payload text")],
        "cap",
    )
    assert r2 == want


def test_exact_canonical_eviction_reelects(spark, tmp_path):
    """Two verbatim copies: the smaller id is the exact canonical, the
    larger is exact_dup. When the canonical becomes conflicting, the copy
    is re-elected canonical and flows through the downstream stages."""
    a, b = 201, 302  # non-eval
    rows1 = [_row(a, _q()), _row(b, _q())]
    idx = str(tmp_path / "adm_ex")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows1), idx)
    r1 = _inc_report(spark, idx)
    assert r1 == {a: "kept", b: "exact_dup"}
    conflict = _row(a, "different payload now")
    pretrain_report_append(spark, _docs_df(spark, [conflict]), idx)
    r2 = _inc_report(spark, idx)
    assert r2 == {a: "conflicting_key", b: "kept"}
    assert r2 == _batch_report(spark, tmp_path, rows1 + [conflict], "ex")


def test_near_dup_split_on_removal(spark, tmp_path):
    """P~Q and Q~R but P!~R (a chain through Q). One component → canonical
    P kept, Q and R near_dup. Quarantining Q SPLITS the component: P and R
    become singletons and BOTH are kept — the decremental-CC repair path."""
    p, q, r = 211, 312, 413
    rows = [
        _row(p, _b23()),
        _row(q, _b23((3, "zebra"))),
        _row(r, _b23((3, "zebra"), (6, "quartz"), (9, "falcon"))),
    ]
    idx = str(tmp_path / "adm_nd")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows), idx)
    r1 = _inc_report(spark, idx)
    assert r1 == {p: "kept", q: "near_dup", r: "near_dup"}, r1
    conflict = _row(q, "different payload now")
    pretrain_report_append(spark, _docs_df(spark, [conflict]), idx)
    r2 = _inc_report(spark, idx)
    assert r2 == {p: "kept", q: "conflicting_key", r: "kept"}
    assert r2 == _batch_report(spark, tmp_path, rows + [conflict], "nd")


def test_near_dup_merge_flips_old_canonical(spark, tmp_path):
    """A later SMALLER-id near-dup arrival merges into an existing
    component and steals its canonical slot: the old kept doc flips to
    near_dup — the merge-event fast path, no rebuild."""
    old, new = 525, 214
    rows1 = [_row(old, _q())]
    rows2 = [_row(new, _q((1, "harbor")))]
    idx = str(tmp_path / "adm_mg")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows1), idx)
    assert _inc_report(spark, idx)[old] == "kept"
    pretrain_report_append(spark, _docs_df(spark, rows2), idx)
    r2 = _inc_report(spark, idx)
    assert r2 == {old: "near_dup", new: "kept"}
    assert r2 == _batch_report(spark, tmp_path, rows1 + rows2, "mg")


def test_late_eval_doc_contaminates_history(spark, tmp_path):
    """An eval doc arriving AFTER a kept doc that shares a 3-gram flips the
    historical verdict kept → contaminated (eval-set growth)."""
    keep_id, ev_id = 331, 340  # 340 % 10 == 0 → eval
    rows1 = [_row(keep_id, _q())]
    # eval doc sharing the shingle "granite ridges holds"
    rows2 = [_row(ev_id, "benchmark asks about granite ridges holds answer")]
    idx = str(tmp_path / "adm_ct")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows1), idx)
    assert _inc_report(spark, idx)[keep_id] == "kept"
    pretrain_report_append(spark, _docs_df(spark, rows2), idx)
    r2 = _inc_report(spark, idx)
    assert r2 == {keep_id: "contaminated", ev_id: "eval_holdout"}
    assert r2 == _batch_report(spark, tmp_path, rows1 + rows2, "ct")


def test_conflicting_eval_doc_uncontaminates(spark, tmp_path):
    """The reverse cascade: when the ONLY eval doc sharing shingles with a
    contaminated doc is quarantined as conflicting, the eval set shrinks
    and the doc flips contaminated → kept."""
    keep_id, ev_id = 441, 450
    rows = [
        _row(keep_id, _q()),
        _row(ev_id, "benchmark asks about granite ridges holds answer"),
    ]
    idx = str(tmp_path / "adm_uc")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows), idx)
    assert _inc_report(spark, idx)[keep_id] == "contaminated"
    conflict = _row(ev_id, "a different eval payload")
    pretrain_report_append(spark, _docs_df(spark, [conflict]), idx)
    r2 = _inc_report(spark, idx)
    assert r2 == {keep_id: "kept", ev_id: "conflicting_key"}
    assert r2 == _batch_report(spark, tmp_path, rows + [conflict], "uc")


def test_verbatim_reingest_is_idempotent(spark, tmp_path):
    """Re-ingesting an identical payload changes nothing: no conflict, no
    duplicate index rows, no verdict flips."""
    rows = [_row(161, _q()), _row(262, _q((1, "harbor")))]
    idx = str(tmp_path / "adm_idem")
    pretrain_report_init(spark, idx)
    pretrain_report_append(spark, _docs_df(spark, rows), idx)
    r1 = _inc_report(spark, idx)
    stats = pretrain_report_append(spark, _docs_df(spark, rows), idx)
    assert stats["ingested"] == 0 and stats["new_conflicts"] == 0
    assert _inc_report(spark, idx) == r1 == _batch_report(
        spark, tmp_path, rows + rows, "idem"
    )


def test_streaming_foreachbatch_admission(spark, tmp_path):
    """The operational shape: micro-batches fold through foreachBatch into
    the persistent admission store; the final report equals one batch run."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "adm_fb")
    ckpt = str(tmp_path / "ckpt_fb")
    pretrain_report_init(spark, idx)
    all_rows = [
        _row(611, _q()),
        _row(612, _q()),  # exact dup of 611
        _row(713, _q((1, "harbor"))),  # near dup of 611
        _row(620, "benchmark asks about granite ridges holds answer"),  # eval
    ]

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        pretrain_report_append(spark, batch_df, idx)

    def run_once():
        q = (
            spark.readStream.schema(DOCS_SCHEMA)
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    (src / "b1.json").write_text(
        "\n".join(_json.dumps(dict(zip(cols, r))) for r in all_rows[:2])
    )
    run_once()
    (src / "b2.json").write_text(
        "\n".join(_json.dumps(dict(zip(cols, r))) for r in all_rows[2:])
    )
    run_once()
    got = _inc_report(spark, idx)
    assert got == _batch_report(spark, tmp_path, all_rows, "fb")
    assert got[611] == "contaminated"  # shares "granite ridges holds" with eval 620
    assert got[612] == "exact_dup" and got[713] == "near_dup"


def test_empty_and_degenerate_batches(spark, tmp_path):
    """Empty batches are no-ops; an in-batch conflicting BRAND-NEW doc_id
    quarantines immediately (both payloads, no signals ingested); null text
    forms the single 'NULL' exact group and fails quality — all against the
    batch flagship."""
    idx = str(tmp_path / "adm_deg")
    pretrain_report_init(spark, idx)
    stats = pretrain_report_append(spark, _docs_df(spark, []), idx)
    assert stats["ingested"] == 0 and stats["verdicts_written"] == 0
    rows = [
        _row(771, "payload one for the conflicting pair"),
        _row(771, "payload two for the conflicting pair"),
        (871, None, "en", "s1", 0),
        (972, None, "en", "s1", 0),
    ]
    pretrain_report_append(spark, _docs_df(spark, rows), idx)
    got = _inc_report(spark, idx)
    assert got[771] == "conflicting_key"
    # null text: no words -> quality fail for both copies
    assert got[871] == "quality" and got[972] == "quality"
    assert got == _batch_report(spark, tmp_path, rows, "deg")
    # the conflicting id stays quarantined on every later re-ingest
    pretrain_report_append(
        spark, _docs_df(spark, [_row(771, "payload three")]), idx
    )
    assert _inc_report(spark, idx)[771] == "conflicting_key"


def test_admission_probes_are_partition_pruned(spark, tmp_path):
    """Every per-doc admission index must be probed with PartitionFilters —
    verdict-store, signals, shingle-sets (db buckets) and the gram inverted
    indexes (gb buckets): probe cost proportional to the batch's buckets,
    never the store."""
    import re

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.admission_incremental import (
        _GRAM_SCHEMA,
        _SIG_SCHEMA,
        _paths,
        _probe_docs,
        _probe_keys,
    )

    idx = str(tmp_path / "adm_plan")
    pretrain_report_init(spark, idx)
    pretrain_report_append(
        spark, _docs_df(spark, [_row(901, _q()), _row(902, _q((1, "harbor")))]), idx
    )
    p = _paths(idx)

    def pf(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    assert "db" in pf(_probe_docs(spark, p["sig"], _SIG_SCHEMA, [901]))
    assert "db" in pf(_probe_docs(spark, p["shsets"], "doc_id long, sh array<string>, db int", [901]))
    gram_probe = spark.createDataFrame(
        [("granite ridges holds",)], "shingle string"
    )
    assert "gb" in pf(
        _probe_keys(
            spark, p["docgram"], _GRAM_SCHEMA, gram_probe, "shingle", "gb", 256
        )
    )


# --- property: random corpora, random batchings, exact parity ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_POOL_TEXTS = [
    _q(),                      # quality-pass base
    _q((1, "harbor")),         # near-dup of base (banded, J=0.636)
    "completely different prose about spark shuffle partition pruning today",
    "short junk",              # quality fail (under 10 words)
    None,                      # null text
    "benchmark asks about granite ridges holds answer",  # shares a shingle
]


@st.composite
def corpus_and_batching(draw):
    n = draw(st.integers(min_value=4, max_value=10))
    rows = []
    for _ in range(n):
        doc_id = draw(st.integers(min_value=1, max_value=12))
        t = _POOL_TEXTS[draw(st.integers(0, len(_POOL_TEXTS) - 1))]
        src = f"s{draw(st.integers(1, 2))}"
        rows.append((doc_id, t, "en", src, len(t or "")))
    batch_of = [draw(st.integers(0, 2)) for _ in rows]
    batches = [
        [r for r, b in zip(rows, batch_of) if b == k] for k in range(3)
    ]
    return rows, [b for b in batches if b]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=corpus_and_batching())
def test_admission_parity_property(spark, tmp_path_factory, data):
    """Random corpora (conflicts, verbatim dups, near-dups, null text,
    quality fails, eval ids via doc_id 10) through random batchings must
    end exactly equal to the batch flagship over the union — the
    generalization of the hand-written cascade pins."""
    rows, batches = data
    tmp = tmp_path_factory.mktemp("adm_prop")
    idx = str(tmp / "store")
    pretrain_report_init(spark, idx)
    for k, b in enumerate(batches):
        pretrain_report_append(
            spark, _docs_df(spark, b), idx, staging_dir=str(tmp / f"s{k}")
        )
    got = _inc_report(spark, idx)
    want = _batch_report(spark, tmp, rows, "prop")
    assert got == want, {
        i: (got.get(i), want.get(i))
        for i in set(got) | set(want)
        if got.get(i) != want.get(i)
    }
