"""Incremental leakage-free splitting (operators/incremental.py:
split_store_init / split_assign_incremental / split_reconcile /
split_current) — the streaming companion of the oracle-checked
split_leakage_free. Contracts:

* LEAKAGE INVARIANT: after every batch, all assigned docs of one CURRENT
  cc component share one split (the property the operator exists for);
* parity-when-clean: assigning every doc once against the final cc state
  equals the batch split_leakage_free (same md5-prefix buckets, same
  min-id canonical);
* declared quarantine: a merge across differently-assigned components
  re-assigns the WHOLE component to train — revisions only ever move INTO
  train (consumed eval docs never silently land in val/test);
* reconcile is idempotent and must precede cc_store_compact (it reads the
  merge map compaction clears)."""

from __future__ import annotations

from dblp_to_csv_spark.operators.incremental import (
    cc_store_append,
    cc_store_compact,
    cc_store_init,
    split_assign_incremental,
    split_current,
    split_reconcile,
    split_store_init,
    _split_of_root,
)
from tests.conftest import SF_SMOKE

# md5-prefix buckets of small ids (computed with the exact operator rule):
# val: 1, 2, 8, 10...   test: 3, 5, 34...   train: 4, 6, 7, 9...


def _edges(spark, rows):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in rows], "u long, v long"
    )


def _nodes(spark, ids):
    return spark.createDataFrame([(int(i),) for i in sorted(ids)], "node long")


def _assign(spark, tmp, cc, sp, ids):
    return {
        r["doc_id"]: r["split"]
        for r in split_assign_incremental(
            spark, _nodes(spark, ids), cc, sp
        ).collect()
    }


def _cur(spark, sp):
    return {r["doc_id"]: r["split"] for r in split_current(spark, sp).collect()}


def test_fresh_assignment_matches_batch_rule(spark, tmp_path):
    """Isolated docs hash by their own id; clustered docs by the min-id
    canonical — the split_leakage_free rule exactly."""
    cc, sp = str(tmp_path / "cc"), str(tmp_path / "sp")
    cc_store_init(spark, _edges(spark, [(5, 44), (44, 49)]), cc)
    split_store_init(spark, sp)
    got = _assign(spark, tmp_path, cc, sp, [1, 4, 5, 44, 49])
    assert got == {
        1: _split_of_root(1),  # val (singleton)
        4: _split_of_root(4),  # train (singleton)
        5: _split_of_root(5),  # test — cluster {5,44,49} canonical 5
        44: _split_of_root(5),
        49: _split_of_root(5),
    }
    assert got[5] == got[44] == got[49] == "test"
    assert _cur(spark, sp) == got


def test_parity_with_batch_split_leakage_free(spark, tmp_path):
    """Build the cc store from the SAME pair graph the batch query uses
    (real sf0.001 minhash pairs, fed in three batches), assign every doc
    once at the end: equals split_leakage_free row-for-row (single
    assignment event → no quarantine possible)."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import minhash_lsh_pairs
    from dblp_to_csv_spark.registry import all_queries

    cc, sp = str(tmp_path / "cc2"), str(tmp_path / "sp2")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    ]
    cc_store_init(spark, _edges(spark, pairs[: len(pairs) // 3]), cc)
    cc_store_append(spark, _edges(spark, pairs[len(pairs) // 3 : 2 * len(pairs) // 3]), cc)
    cc_store_append(spark, _edges(spark, pairs[2 * len(pairs) // 3 :]), cc)
    split_store_init(spark, sp)
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .distinct()
        .collect()
    ]
    got = _assign(spark, tmp_path, cc, sp, doc_ids)
    want = {
        r["doc_id"]: r["split"]
        for r in all_queries()["split_leakage_free"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_cross_split_merge_quarantines_to_train(spark, tmp_path):
    """Component {5,44} assigned test and {1,2} assigned val; a later edge
    merges them → the WHOLE merged component re-assigns to train, and no
    revision ever moves a doc out of train."""
    cc, sp = str(tmp_path / "cc3"), str(tmp_path / "sp3")
    cc_store_init(spark, _edges(spark, [(5, 44), (1, 2)]), cc)
    split_store_init(spark, sp)
    before = _assign(spark, tmp_path, cc, sp, [1, 2, 5, 44])
    assert before == {1: "val", 2: "val", 5: "test", 44: "test"}
    cc_store_append(spark, _edges(spark, [(2, 44)]), cc)
    n_q = split_reconcile(spark, cc, sp, new_edges=_edges(spark, [(2, 44)]))
    assert n_q == 1
    after = _cur(spark, sp)
    assert after == {1: "train", 2: "train", 5: "train", 44: "train"}
    # idempotent
    assert split_reconcile(spark, cc, sp) == 0
    assert _cur(spark, sp) == after


def test_same_split_merge_keeps_assignment(spark, tmp_path):
    """Merging two components that happen to carry the SAME split is not a
    violation — nothing quarantines, the split stays."""
    cc, sp = str(tmp_path / "cc4"), str(tmp_path / "sp4")
    # 4 and 6 are both train singleton-hash roots
    cc_store_init(spark, _edges(spark, [(4, 104), (6, 106)]), cc)
    split_store_init(spark, sp)
    before = _assign(spark, tmp_path, cc, sp, [4, 104, 6, 106])
    assert set(before.values()) == {"train"}
    cc_store_append(spark, _edges(spark, [(104, 106)]), cc)
    assert split_reconcile(spark, cc, sp, new_edges=_edges(spark, [(104, 106)])) == 0
    assert _cur(spark, sp) == before


def test_leakage_invariant_under_interleaving(spark, tmp_path):
    """Arbitrary interleaving of assigns and merges: after every step, all
    assigned docs of one current component share one split."""
    from dblp_to_csv_spark.operators.incremental import cc_store_lookup

    cc, sp = str(tmp_path / "cc5"), str(tmp_path / "sp5")
    cc_store_init(spark, _edges(spark, [(3, 103)]), cc)
    split_store_init(spark, sp)
    tracked: set[int] = set()

    def check():
        cur = _cur(spark, sp)
        if not cur:
            return
        comp = {
            r["node"]: r["component"]
            for r in cc_store_lookup(spark, _nodes(spark, cur), cc).collect()
        }
        by_comp: dict[int, set] = {}
        for d, s in cur.items():
            by_comp.setdefault(comp[d], set()).add(s)
        assert all(len(v) == 1 for v in by_comp.values()), by_comp

    for step in [
        ("assign", [3, 103, 1, 8]),
        ("merge", [(1, 8)]),
        ("assign", [64, 65]),
        ("merge", [(8, 103)]),  # val {1,8} × test {3,103} → quarantine
        ("assign", [5]),
        ("merge", [(64, 65), (5, 65)]),  # test × test stays test
        ("merge", [(5, 3)]),  # test cluster × train-quarantined → train
    ]:
        if step[0] == "assign":
            tracked |= set(step[1])
            _assign(spark, tmp_path, cc, sp, step[1])
        else:
            cc_store_append(spark, _edges(spark, step[1]), cc)
            split_reconcile(spark, cc, sp, new_edges=_edges(spark, step[1]))
        check()
    # every revision landed in train only
    assert _cur(spark, sp)[1] == "train" and _cur(spark, sp)[5] == "train"


def test_reconcile_before_compaction_survives(spark, tmp_path):
    """reconcile → compact → assignments still resolve and new members of
    the compacted component inherit its split."""
    cc, sp = str(tmp_path / "cc6"), str(tmp_path / "sp6")
    cc_store_init(spark, _edges(spark, [(5, 44), (1, 2)]), cc)
    split_store_init(spark, sp)
    _assign(spark, tmp_path, cc, sp, [1, 2, 5, 44])
    cc_store_append(spark, _edges(spark, [(2, 44)]), cc)
    split_reconcile(spark, cc, sp)
    cc_store_compact(spark, cc)
    assert _cur(spark, sp) == {1: "train", 2: "train", 5: "train", 44: "train"}
    # a new doc joining the compacted (quarantined) component gets train
    cc_store_append(spark, _edges(spark, [(44, 200)]), cc)
    got = _assign(spark, tmp_path, cc, sp, [200])
    assert got == {200: "train"}
