"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints one JSON line per series, with the
frozen headline line LAST (the line the driver parses):

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

The 13-query headline set is frozen for cross-round comparability; the
curation / graph / pipeline operator families are timed as SECONDARY series,
each printed as its own complete JSON line before the headline, so their
regressions show up as numbers without disturbing the headline series and
without growing the headline line past the driver's tail capture.

Each query is forced end-to-end with a noop sink (full computation of every
column, nothing collected to the driver). AQE is on; configs come from
dblp_to_csv_spark.session.get_spark.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Secondary bench set (VERDICT r6 item 8): the corpus-curation / drift ops
# added in round 6 — kept OUT of the headline set so its series stays
# comparable across rounds.
CURATION_BENCH = [
    "quality_gopher_rules",
    "token_budget_per_lang",
    "lang_temperature_resample",
    "dedup_chunk_exact",
    "dedup_cluster_stats",
    "dedup_keep_canonical",
    "text_logprob_buckets",
    "drift_ks_events_value",
    "drift_chi2_source_lang",
    "embedding_label_centroids",
    # late-round-7 additions (totals across rounds compare on the shared
    # prefix; per-query numbers are the stable series)
    "dedup_semantic_semdedup",
    "decontaminate_bloom",
    "dedup_intradoc_rewrite",
    "quality_linear_score",
    # round-8 continuation additions
    "dedup_substring_rewrite",
    # round-8 session-3: the flagship end-to-end admission composite
    "pretrain_corpus_report",
    # round-9 session-3: the embedding-level decon mode
    "decontaminate_semantic",
    # round-11: directional drift + classifier calibration
    "drift_kl_unigram_langs",
    "quality_score_pr_curve",
    # round-11 session 2: information-theoretic drift + governance gate
    "drift_mutual_information",
    "privacy_k_anonymity_audit",
    "embedding_norm_isotropy",
    "drift_psi_events_value",
    # round-14: the repetition half of the Gopher battery
    "quality_repetition_rules",
]

# Graph family split out of CURATION_BENCH (ROADMAP #19) so the dedup and
# graph series trend independently; totals across rounds compare on the
# shared per-query series, as with the r7 CURATION_BENCH extension.
GRAPH_BENCH = [
    "graph_triangle_count",
    "graph_kcore",
    "graph_coreness",
    "graph_bfs_distances",
    "graph_label_propagation",
    "graph_report",
]
# graph_adamic_adar_capped left the series in round 9: its r1-r8 absolute
# hub cap (100) had fallen below the graph's MEDIAN degree, so the 6 s it
# benched was an 88%-vacuous wedge set (and a 0-row result at sf0.01). The
# fixed data-derived p90 cap keeps ~82% of the wedge work on this
# near-uniform-degree graph (~52 s at sf0.1 ≈ 0.8x the exact query) —
# benching it would re-bench the exact path, not the skew dial. See
# BASELINE.md §15.5.

# Round-8 session-4: tokenizer-training / retrieval / CDC family — its own
# series so the curation and graph series stay round-comparable.
PIPELINE_BENCH = [
    "bpe_train_merges",
    "bpe_apply_encode",
    "search_hybrid_rrf",
    "similarity_topk_pq",
    "merge_upsert_orders",
    "training_epoch_order",
    "embedding_random_projection",
    # round-9 additions (series totals compare on the shared prefix)
    "retrieval_eval_bm25",
    "similarity_eval_recall",
    # round-9 session 2: corpus-trained LM scoring + DSIR selection —
    # the two new corpus-scale admission signals
    "lm_bigram_cross_entropy",
    "dsir_importance_weights",
    # round-9 session 3: the two heaviest of the new batch — apriori-pruned
    # basket pair mining and skip-gram pair construction
    "cooccurrence_parts_pmi",
    "skipgram_pairs_subsampled",
    # round-10 additions: MG heavy hitters (narrow summary + candidate
    # recount), rendezvous sharding (in-row argmax), BMP codec pipeline
    # (two mapInPandas stages)
    "heavy_hitters_words",
    "shard_rendezvous_assign",
    "multimodal_decode_bmp",
    # round-11: the audio modality twin + batch-shaping prep
    "multimodal_decode_wav",
    "pack_length_buckets",
    # round-11 session 2: fixed-size quantile sketches (global + per-group)
    "sketch_bottomk_quantiles",
    "sketch_bottomk_quantiles_by_group",
    "dataset_version_diff",
    # round-13: perceptual near-dup for both decoded modalities
    # (dHash / energy-gradient fingerprint + shared banded hamming join)
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    # round-14: the ER composite (blocked fuzzy match + survivorship merge)
    "er_golden_record",
]


def _clear_artifact_cache() -> None:
    """Reset the graph module's session-scoped materialized-artifact cache.

    The per-query series MUST measure each query cold: with best-of-2
    timing, a warm cache would make the second run a parquet read of the
    first run's artifacts (graph_coreness drops from ~17 s to ~0.2 s at
    sf0.1) and min() would silently report cache-hit latency as query
    cost. Cross-query artifact sharing is measured separately and
    transparently by the *_shared series below."""
    from dblp_to_csv_spark.operators.graph import _ARTIFACT_CACHE

    _ARTIFACT_CACHE.clear()


def _calibrate(spark, runs: int = 5) -> float:
    """Fixed-work noise denominator (VERDICT r12 item 1): time the same
    1M-row range-sum the warm-up runs, best-of-``runs``. On a quiet host this
    lands ~0.05-0.10 s; under noisy-neighbor contention it inflates by the
    same factor the query timings do, so every series line carries it and a
    reader can normalize headline totals across rounds as
    value / calibration."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _calibrate_cpu(spark, runs: int = 3) -> float:
    """CPU-bound parallel probe (r14 session): 64M-row modulo-sum across 32
    tasks, best-of-``runs`` (~0.18 s quiet). The serial 1M probe above is
    scheduling-bound and under-reads MULTI-CORE contention: an r14 session
    run saw the graph series swing 53.6 → 70 s while the serial probe held
    0.07, on a host whose load average was visibly decaying from a prior
    burst. This probe saturates the executor the way the queries do, so a
    reader can attribute a series swing to host CPU pressure (cpu probe
    inflated) vs plan/code change (cpu probe quiet)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).selectExpr("sum(id % 1000003)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _time_queries(spark, sf_dir: str, fns: dict, runs: int = 2) -> dict[str, float]:
    # ``runs`` INTERLEAVED passes over the whole set, report the best per
    # query: the first pass pays one-off JIT compilation and (on this shared
    # VM) noisy-neighbor spikes; a long-lived cluster amortizes both, so
    # steady-state is the honest number. Interleaving (pass 1 runs EVERY
    # query before pass 2 starts) decorrelates a multi-second contention
    # burst from any single query — back-to-back repeats of one query sit
    # inside the same burst and min() can't escape it (the r12 driver run
    # inflated every frozen query 11-42% this way; VERDICT r12 item 1).
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name, fn in sorted(fns.items()):
            _clear_artifact_cache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[name] = min(timings.get(name, float("inf")), dt)
    return {name: round(t, 3) for name, t in timings.items()}


def _time_series_shared(spark, sf_dir: str, fns: dict) -> dict[str, float]:
    """One SINGLE pass over the series with the artifact cache warm across
    queries — the analytics-session number: the edge list, its symmetrized
    twin, and the coreness fixpoint each materialize once for the whole
    series (the materialized-view policy), so later queries pay only their
    incremental cost. Reported alongside the cold per-query series, never
    mixed into it."""
    _clear_artifact_cache()
    timings: dict[str, float] = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _warm_graph_finishers(spark) -> None:
    """Throwaway warm-up of the single-task finisher path (VERDICT r13
    item 1): coreness / kcore / LPA finish in a coalesce(1).mapInPandas
    numpy kernel whose FIRST execution in a session pays Python-worker
    spawn + Arrow/numpy import + JIT — several seconds that a long-lived
    cluster amortizes but a fresh bench session charges to whichever graph
    query runs first (the r13 driver run read coreness at 17.2 s vs the
    0.37 s warm truth, BASELINE §22). Run the finisher-path queries once at
    the smallest SF so the graph series reads steady-state, then clear the
    artifact cache so the cold series stays cold."""
    from dblp_to_csv_spark.registry import all_queries

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        return
    fns = all_queries()
    for name in (
        "graph_coreness",
        "graph_kcore",
        "graph_label_propagation",
        "graph_bfs_distances",
    ):
        try:
            fns[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    _clear_artifact_cache()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from dblp_to_csv_spark.registry import all_queries, bench_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session so the first measured query isn't paying JIT and
    # session-bootstrap cost that a long-lived cluster would have amortized.
    # Three warm-up rounds: one is not enough for the range-sum path to
    # reach steady state (measured 0.34 s calibration after 1 warm-up vs
    # 0.07 s after the bench — the calibration must be the NOISE floor, not
    # a JIT artifact).
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Per-series calibration (VERDICT r13 item 1): every series line carries
    # the probe measured immediately BEFORE and AFTER that series, so a
    # contention burst confined to one window shows up ON the series it
    # inflated. The r13 driver record doubled the graph series (40 → 67 s)
    # while the single whole-run min(start, end) calibration still read
    # quiet — the burst lived entirely inside the early series and the end
    # probe couldn't see it.
    registry = all_queries()
    series: list[tuple[str, dict, float, float, float, float]] = []

    def run_series(metric: str, fn) -> None:
        c0, u0 = _calibrate(spark), _calibrate_cpu(spark)
        timings = fn()
        c1, u1 = _calibrate(spark), _calibrate_cpu(spark)
        series.append((metric, timings, c0, c1, u0, u1))

    # Headline set runs interleaved best-of-3 (secondary series stay at
    # best-of-2 to bound total bench wall-clock; their per-query numbers are
    # trend lines, the headline is the cross-round gate).
    run_series(
        "headline_queries_total",
        lambda: _time_queries(spark, sf_dir, bench_queries(), runs=3),
    )
    run_series(
        "curation_queries_total",
        lambda: _time_queries(
            spark,
            sf_dir,
            {n: registry[n].fn for n in CURATION_BENCH if n in registry},
        ),
    )
    _warm_graph_finishers(spark)
    run_series(
        "graph_queries_total",
        lambda: _time_queries(
            spark, sf_dir, {n: registry[n].fn for n in GRAPH_BENCH if n in registry}
        ),
    )
    run_series(
        "graph_shared_total",
        lambda: _time_series_shared(
            spark, sf_dir, {n: registry[n].fn for n in GRAPH_BENCH if n in registry}
        ),
    )
    run_series(
        "pipeline_queries_total",
        lambda: _time_queries(
            spark,
            sf_dir,
            {n: registry[n].fn for n in PIPELINE_BENCH if n in registry},
        ),
    )

    # Output framing (VERDICT r9 item 2): the driver captures a bounded TAIL
    # of stdout and parses the LAST line, so the six-series single-line format
    # truncated mid-line once it outgrew the capture (BENCH_r09 "parsed":
    # null). Emit each secondary series as its own complete JSON line FIRST,
    # and the short frozen 13-query headline line LAST — the driver's parser
    # always sees a complete headline line, and every per-series line remains
    # recoverable from the tail.
    # Per line, ``calibration`` is min(its own start, end): the start probe
    # can carry residual JIT while the end probe reflects the machine state
    # the series actually ran under; both raw values stay on every line so
    # an in-series burst is self-explaining.
    headline = series[0]
    for metric, timings, c0, c1, u0, u1 in series[1:] + [headline]:
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "calibration": min(c0, c1),
                    "calibration_start": c0,
                    "calibration_end": c1,
                    # CPU-bound twin (~0.18 quiet): reads multi-core
                    # pressure the serial probe cannot see
                    "calibration_cpu_start": u0,
                    "calibration_cpu_end": u1,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
