"""Session-4 operator scale curve: the sf0.1 documents table holds 5,000
docs — far below where the BPE/skyline/epoch/span/PQ shapes differentiate.
This harness generates an N-doc synthetic corpus with a ZIPF word
distribution over a large lexicon (so the observed vocabulary grows
sublinearly with the corpus — Heaps-law-like, the regime the BPE scale
claim depends on) plus an aligned random embedding table, times each
operator end-to-end (noop sink, best-of-2), and prints one JSON line.

Usage: python scripts/bench_pipeline_scale.py [n_docs ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LEXICON_SIZE = 20_000
WORD_LEN = (3, 9)
WORDS_PER_DOC = 60
EMB_DIM = 64
EMB_FRACTION = 0.1  # embeddings table size relative to the doc count


def _lexicon(rng) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(LEXICON_SIZE):
        n = rng.integers(WORD_LEN[0], WORD_LEN[1] + 1)
        out.append("".join(letters[rng.integers(0, 26, size=n)]))
    return np.array(out)


def generate(n_docs: int, out_dir: Path, seed: int = 11) -> None:
    rng = np.random.default_rng(seed)
    lex = _lexicon(rng)
    # zipf ranks over the lexicon: frequent head, long tail — vocabulary
    # observed in an N-doc sample grows sublinearly with N
    zipf = rng.zipf(1.3, size=(n_docs, WORDS_PER_DOC))
    idx = np.minimum(zipf - 1, LEXICON_SIZE - 1)
    texts = [" ".join(lex[row]) for row in idx]
    pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"src{i % 50}" for i in range(n_docs)],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(out_dir / "documents.parquet")
    n_emb = max(64, int(n_docs * EMB_FRACTION))
    emb = rng.standard_normal((n_emb, EMB_DIM)).astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": list(emb),
            "label": (np.arange(n_emb) % 10).astype(np.int32),
        }
    ).to_parquet(out_dir / "embeddings.parquet")


OPS = [
    "bpe_train_merges",
    "bpe_apply_encode",
    "skyline_documents",
    "training_epoch_order",
    "augment_span_corrupt",
    "search_hybrid_rrf",
    "similarity_topk_pq",
]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict = {"ops": OPS, "sizes": {}}
    for n in sizes:
        d = Path(tempfile.mkdtemp(prefix=f"pipescale_{n}_"))
        generate(n, d)
        timings = {}
        for name in OPS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name].fn(spark, str(d)).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 2)
        import duckdb

        from dblp_to_csv_spark.functions.text import WORDS_SQL

        # Reuse the operators' words() tokenization (WORDS_SQL) so the
        # observed vocabulary matches what bpe_train_merges actually sees —
        # a bare space split would diverge on any non-[a-z0-9] byte.
        vocab = duckdb.sql(
            "SELECT COUNT(DISTINCT w) FROM (SELECT unnest("
            + WORDS_SQL.format(col="text")
            + f") w FROM read_parquet('{d}/documents.parquet'))"
        ).fetchone()[0]
        out["sizes"][str(n)] = {"timings_s": timings, "observed_vocab": vocab}
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
