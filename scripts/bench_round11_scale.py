"""Round-11 scale probe: the in-core finishers vs the distributed rounds
across the testdata decade (sf0.001 → sf0.1).

    python scripts/bench_round11_scale.py [sf_dir ...]

What it demonstrates (BASELINE §19): below the size gates the single-task
finisher beats the round loop's per-action fixed cost at EVERY scale factor,
and the forced-distributed numbers grow slowly enough across the decade that
the >gate regime (where they are the only path) stays viable — the gate
picks the cheaper physical strategy, it does not hide a cliff.

Each cell is best-of-2 (first run pays JIT); artifact caches are cleared
between runs so every number is cold.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dblp_to_csv_spark.operators import graph as G
from dblp_to_csv_spark.operators.dedup import (
    connected_components_min_label,
    minhash_lsh_pairs,
)
from dblp_to_csv_spark.session import checkpoint_base, get_spark


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("r11-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # JIT warm
    print(f"{'sf_dir':<28} {'und_edges':>10} {'core_fin':>9} {'core_dist':>10}"
          f" {'pairs':>7} {'cc_fin':>7} {'cc_dist':>8}")
    for sf in sf_dirs:
        G._ARTIFACT_CACHE.clear()
        und = G.copart_und(spark, sf)
        n_edges = und.count()

        def core(gate):
            def run():
                base = checkpoint_base(spark, None, "_r11s_")
                G.coreness_fixpoint(
                    spark, und, base, local_finish_edges=gate
                ).write.mode("overwrite").parquet(os.path.join(base, "out"))

            return run

        # force the finisher explicitly (gate = this dataset's size) so the
        # columns stay honest even for sf_dirs above the default gates
        core_fin = best_of(core(n_edges))
        core_dist = best_of(core(0))

        pairs_df = minhash_lsh_pairs(spark, sf)
        base = checkpoint_base(spark, None, "_r11p_")
        pairs_path = os.path.join(base, "pairs_in")
        pairs_df.write.mode("overwrite").parquet(pairs_path)
        pairs = spark.read.parquet(pairs_path)
        n_pairs = pairs.count()

        def cc(gate):
            def run():
                connected_components_min_label(
                    spark, sf, pairs=pairs, local_finish_pairs=gate
                ).write.format("noop").mode("overwrite").save()

            return run

        cc_fin = best_of(cc(max(n_pairs, 1)))
        cc_dist = best_of(cc(0))
        print(f"{sf:<28} {n_edges:>10} {core_fin:>8.2f}s {core_dist:>9.2f}s"
              f" {n_pairs:>7} {cc_fin:>6.2f}s {cc_dist:>7.2f}s")


if __name__ == "__main__":
    main()
