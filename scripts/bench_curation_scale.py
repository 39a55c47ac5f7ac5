"""Dedup-chain scale curve: the documents table at sf0.1 holds only 5,000
docs, so the MinHash→CC flagship has never been measured at corpus sizes
where its shapes matter. This harness generates an N-doc synthetic corpus
(seeded, testdata-like word soup with injected exact/near duplicates at
known rates), runs the chain stage by stage, and prints one JSON line.

Usage: python scripts/bench_curation_scale.py [n_docs ...]
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

VOCAB = [f"tok{i}" for i in range(220)]
WORDS_PER_DOC = 60
EXACT_DUP_RATE = 0.05
NEAR_DUP_RATE = 0.10
NEAR_DUP_EDITS = 3  # words substituted in a near-dup copy


def generate(
    n_docs: int,
    out_dir: Path,
    seed: int = 7,
    n_sources: int = 50,
    with_stopwords: bool = False,
    vocab_size: int = len(VOCAB),
) -> Path:
    """``n_sources`` lets the pretrain-report decade keep docs-per-source
    roughly constant across corpus sizes: with the default 50 sources the
    per-source admission cap (curation.SOURCE_CAP=15) rejects ~90% of a
    20k corpus before the dedup stages see anything, so the curve would
    measure the cap window, not the chain. ``with_stopwords`` plants two
    distinct stopwords per base doc so the corpus passes the Gopher
    ≥2-distinct-stopwords rule (again: measure the chain, not one gate).
    ``vocab_size`` widens the lexicon: at 220 tokens the eval-holdout
    n-grams cover the whole n-gram space by ~500k docs, so the
    contamination stage degenerates to rejecting everything. All default
    to the original values to keep the recorded dedup-chain series
    (BASELINE.md §13) byte-comparable across rounds."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i}" for i in range(vocab_size)])
    n_base = int(n_docs / (1 + EXACT_DUP_RATE + NEAR_DUP_RATE))
    idx = rng.integers(0, len(vocab), size=(n_base, WORDS_PER_DOC))
    texts = [" ".join(vocab[row]) for row in idx]
    if with_stopwords:
        texts = [f"the {t} and" for t in texts]
    # exact dups: verbatim copies of random base docs
    for b in rng.integers(0, n_base, size=int(n_base * EXACT_DUP_RATE)):
        texts.append(texts[b])
    # near dups: NEAR_DUP_EDITS word substitutions
    for b in rng.integers(0, n_base, size=int(n_base * NEAR_DUP_RATE)):
        w = texts[b].split()
        for p in rng.integers(0, WORDS_PER_DOC, size=NEAR_DUP_EDITS):
            w[p] = vocab[rng.integers(0, len(vocab))]
        texts.append(" ".join(w))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"src{i % n_sources}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(out_dir / "documents.parquet")
    return out_dir


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    from dblp_to_csv_spark.operators.dedup import (
        connected_components_min_label,
        minhash_lsh_pairs,
    )
    from dblp_to_csv_spark.session import get_spark
    from pyspark.sql import functions as F
    from dblp_to_csv_spark.sources.tables import load_table

    spark = get_spark("curation-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results = []
    for n in sizes:
        d = Path(tempfile.mkdtemp(prefix="curscale_"))
        t0 = time.perf_counter()
        generate(n, d)
        t_gen = time.perf_counter() - t0
        sf_dir = str(d)
        t0 = time.perf_counter()
        n_exact_groups = (
            load_table(spark, sf_dir, "documents")
            .groupBy(F.md5("text"))
            .count()
            .count()
        )
        t_exact = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(spark, sf_dir)
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0
        t0 = time.perf_counter()
        labels = connected_components_min_label(spark, sf_dir, pairs=pairs)
        n_labeled = labels.count()
        t_cc = time.perf_counter() - t0
        results.append(
            {
                "n_docs": n,
                "gen_s": round(t_gen, 1),
                "exact_dedup_s": round(t_exact, 2),
                "minhash_pairs_s": round(t_pairs, 2),
                "cc_s": round(t_cc, 2),
                "n_exact_groups": n_exact_groups,
                "n_near_dup_pairs": n_pairs,
                "n_labeled_docs": n_labeled,
                "chain_docs_per_s": round(
                    n / (t_exact + t_pairs + t_cc), 1
                ),
            }
        )
        shutil.rmtree(d, ignore_errors=True)
        print(json.dumps(results[-1]), file=sys.stderr)
    print(json.dumps({"metric": "curation_scale_curve", "results": results}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
