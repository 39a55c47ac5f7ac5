"""Incremental entity resolution (operators/entity_resolution.py:
er_store_*): sequential == batch at every ingested prefix — including
orderings where variants arrive BEFORE their base record (the canonical
re-election cascade) — plus pairs-found-exactly-once, idempotent replay,
and PartitionFilters on the block-index probes.
"""

from __future__ import annotations

import re

import pytest

from dblp_to_csv_spark.operators.entity_resolution import (
    _dirty_records,
    _er_paths,
    _probe_blocks,
    _with_block_keys,
    er_store_append,
    er_store_current,
    er_store_init,
    er_store_pairs,
    golden_from_dirty,
    match_pairs_from_dirty,
)
from tests.conftest import SF_SMOKE

_SCHEMA = "record_id long, name string, addr string, phone string, bal double"


def _all_rows(spark):
    return [
        tuple(r)
        for r in _dirty_records(spark, SF_SMOKE).orderBy("record_id").collect()
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "order,batch_size",
    [("asc", 67), ("desc", 67), ("asc", 500)],
    ids=["base-first", "variants-first", "big-batches"],
)
def test_sequential_equals_batch_at_every_prefix(spark, tmp_path, order, batch_size):
    rows = _all_rows(spark)
    if order == "desc":
        rows = rows[::-1]
    store = str(tmp_path / f"er_{order}_{batch_size}")
    er_store_init(spark, store)
    repaired_total = 0
    for i in range(0, len(rows), batch_size):
        stats = er_store_append(spark, _df(spark, rows[i : i + batch_size]), store)
        repaired_total += stats["repaired"]
        prefix = _df(spark, rows[: i + batch_size])
        assert _sorted(er_store_current(spark, store)) == _sorted(
            golden_from_dirty(prefix)
        ), f"prefix {i + batch_size}"
    assert _sorted(er_store_pairs(spark, store)) == _sorted(
        match_pairs_from_dirty(_df(spark, rows))
    )
    if order == "desc":
        # variants-first must exercise the re-election repair path: the base
        # record arrives last and steals the canonical from every variant
        assert repaired_total > 0


def test_replay_is_idempotent(spark, tmp_path):
    rows = _all_rows(spark)[:120]
    store = str(tmp_path / "er_replay")
    er_store_init(spark, store)
    er_store_append(spark, _df(spark, rows[:60]), store)
    er_store_append(spark, _df(spark, rows[60:]), store)
    want = _sorted(er_store_current(spark, store))
    want_pairs = _sorted(er_store_pairs(spark, store))
    stats = er_store_append(spark, _df(spark, rows[:60]), store)  # full replay
    assert stats["ingested"] == 0
    # overlapping batch: only the genuinely new records ingest
    stats = er_store_append(spark, _df(spark, rows[50:70]), store)
    assert stats["ingested"] == 0
    assert _sorted(er_store_current(spark, store)) == want
    assert _sorted(er_store_pairs(spark, store)) == want_pairs


def test_block_probes_are_partition_pruned(spark, tmp_path):
    rows = _all_rows(spark)[:80]
    store = str(tmp_path / "er_plan")
    er_store_init(spark, store)
    er_store_append(spark, _df(spark, rows), store)
    _, pre_p, suf_p, _, _ = _er_paths(store)
    batch = _with_block_keys(_df(spark, _all_rows(spark)[80:90]))

    def pf(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    assert "pb" in pf(_probe_blocks(spark, pre_p, batch, "bk_pre"))
    assert "pb" in pf(_probe_blocks(spark, suf_p, batch, "bk_suf"))


def test_streaming_foreachbatch_er(spark, tmp_path):
    """The continuous-ingest shape end-to-end: dirty-record micro-batches
    fold into the ER store via foreachBatch, goldens equal to the batch
    semantics over everything streamed."""
    import json as _json

    rows = _all_rows(spark)[:90]
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "er_stream")
    ckpt = str(tmp_path / "ckpt")
    er_store_init(spark, store)

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        er_store_append(spark, batch_df, store)

    def run_once():
        q = (
            spark.readStream.schema(_SCHEMA)
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def dump(path, chunk):
        path.write_text(
            "\n".join(
                _json.dumps(
                    dict(zip(("record_id", "name", "addr", "phone", "bal"), r))
                )
                for r in chunk
            )
        )

    dump(src / "b1.json", rows[:45])
    run_once()
    dump(src / "b2.json", rows[45:])
    run_once()
    assert _sorted(er_store_current(spark, store)) == _sorted(
        golden_from_dirty(_df(spark, rows))
    )


# --- property: random corpora through random batchings ----------------------
# The derived dirty corpus only produces star-shaped clusters; random
# corruptions produce chains (A~B, B~C, A!~C) and cross-entity collisions,
# generalizing the monotone-repair parity argument to arbitrary shapes.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE_ADDRS = [
    "aaaaaaaaaaaaaaaabbbbbbbbbbbbbbbb",
    "abababababababababababababababab",
    "bbbbbbbbbbbbbbbbaaaaaaaaaaaaaaaa",
]
_BASE_PHONES = ["aaaaabbbbb", "ababababab"]


@st.composite
def er_corpus_and_batching(draw):
    n = draw(st.integers(min_value=3, max_value=9))
    rows = []
    for rid in range(1, n + 1):
        addr = list(_BASE_ADDRS[draw(st.integers(0, len(_BASE_ADDRS) - 1))])
        for _ in range(draw(st.integers(0, 3))):
            addr[draw(st.integers(0, 31))] = draw(st.sampled_from("abc~"))
        phone = list(_BASE_PHONES[draw(st.integers(0, len(_BASE_PHONES) - 1))])
        for _ in range(draw(st.integers(0, 2))):
            phone[draw(st.integers(0, 9))] = draw(st.sampled_from("ab~"))
        rows.append((rid, f"n{rid}", "".join(addr), "".join(phone), float(rid)))
    batch_of = [draw(st.integers(0, 2)) for _ in rows]
    batches = [[r for r, b in zip(rows, batch_of) if b == k] for k in range(3)]
    return rows, [b for b in batches if b]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=er_corpus_and_batching())
def test_er_store_parity_property(spark, tmp_path_factory, data):
    rows, batches = data
    tmp = tmp_path_factory.mktemp("er_prop")
    store = str(tmp / "store")
    er_store_init(spark, store)
    for b in batches:
        er_store_append(spark, _df(spark, b), store)
    got = _sorted(er_store_current(spark, store))
    want = _sorted(golden_from_dirty(_df(spark, rows)))
    assert got == want, (rows, [len(b) for b in batches])
    assert _sorted(er_store_pairs(spark, store)) == _sorted(
        match_pairs_from_dirty(_df(spark, rows))
    )


def test_compaction_preserves_state_and_shrinks_canon(spark, tmp_path):
    import glob

    from dblp_to_csv_spark.operators.entity_resolution import er_store_compact

    rows = _all_rows(spark)[::-1][:150]  # variants-first: repairs exist
    store = str(tmp_path / "er_compact")
    er_store_init(spark, store)
    for i in range(0, len(rows), 30):
        er_store_append(spark, _df(spark, rows[i : i + 30]), store)
    want = _sorted(er_store_current(spark, store))
    want_pairs = _sorted(er_store_pairs(spark, store))
    files_before = len(glob.glob(f"{store}/canon/**/*.parquet", recursive=True))
    er_store_compact(spark, store)
    assert _sorted(er_store_current(spark, store)) == want
    assert _sorted(er_store_pairs(spark, store)) == want_pairs
    files_after = len(glob.glob(f"{store}/canon/**/*.parquet", recursive=True))
    assert files_after < files_before
    # appends keep working on the compacted store
    more = _all_rows(spark)[::-1][150:180]
    er_store_append(spark, _df(spark, more), store)
    assert _sorted(er_store_current(spark, store)) == _sorted(
        golden_from_dirty(_df(spark, _all_rows(spark)[::-1][:180]))
    )
