"""Property test for incremental exact dedup: for ANY batch split of a
corpus, the sequence of incremental accepts must equal the batch-mode
canonical set computed by a pure-Python reference model — the fp's winner is
the lowest doc_id within the EARLIEST batch containing it (first-batch-wins,
keep-lowest within a batch).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.operators.incremental import exact_dedup_incremental

TEXT_POOL = [f"text variant number {i}" for i in range(6)]


@st.composite
def corpus_and_split(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    docs = [
        (i, TEXT_POOL[draw(st.integers(0, len(TEXT_POOL) - 1))]) for i in range(n)
    ]
    # assign each doc to one of up to 3 sequential batches
    batch_of = [draw(st.integers(0, 2)) for _ in range(n)]
    batches = [
        [d for d, b in zip(docs, batch_of) if b == k] for k in range(3)
    ]
    return [b for b in batches if b]


def _reference_accepts(batches):
    seen: dict[str, int] = {}
    accepted = set()
    for batch in batches:
        # within a batch: lowest doc_id per text wins; vs history: drop
        best: dict[str, int] = {}
        for doc_id, text in batch:
            if text not in best or doc_id < best[text]:
                best[text] = doc_id
        for text, doc_id in best.items():
            if text not in seen:
                seen[text] = doc_id
                accepted.add(doc_id)
    return accepted


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=corpus_and_split())
def test_incremental_accepts_match_reference_model(spark, tmp_path_factory, batches):
    base = tmp_path_factory.mktemp("incr_prop")
    idx = str(base / "idx")
    got = set()
    for k, batch in enumerate(batches):
        out = exact_dedup_incremental(
            spark,
            spark.createDataFrame(batch, "doc_id long, text string"),
            idx,
            staging_dir=str(base / f"s{k}"),
        )
        got |= {r["doc_id"] for r in out.collect()}
    assert got == _reference_accepts(batches)
