"""r15 A/B batch 2: fan-out on pipeline/curation/stat/multimodal queries.
Old = fan_out_small monkeypatched to identity in every operator module."""
import sys, time
sys.path.insert(0, "/root/repo")
from dblp_to_csv_spark.session import get_spark
from dblp_to_csv_spark.operators import (
    association, curation, dedup, graph, multimodal, pipeline,
    similarity, statistics, text_analysis,
)

MODS = [association, curation, dedup, graph, multimodal, pipeline,
        similarity, statistics, text_analysis]
SF = "/root/testdata/sf0.1"
QUERIES = {
    "cooccurrence_parts_pmi": association.cooccurrence_parts_pmi,
    "heavy_hitters_words": statistics.heavy_hitters_words,
    "sketch_bottomk_quantiles": statistics.sketch_bottomk_quantiles,
    "quality_gopher_rules": curation.quality_gopher_rules,
    "quality_score_pr_curve": curation.quality_score_pr_curve,
    "bpe_train_merges": text_analysis.bpe_train_merges,
    "bpe_apply_encode": text_analysis.bpe_apply_encode,
    "skipgram_pairs_subsampled": pipeline.skipgram_pairs_subsampled,
    "multimodal_decode_bmp": multimodal.multimodal_decode_bmp,
    "multimodal_decode_wav": multimodal.multimodal_decode_wav,
    "dedup_image_phash": multimodal.dedup_image_phash,
    "dedup_audio_fingerprint": multimodal.dedup_audio_fingerprint,
    "dedup_chunk_exact": curation.dedup_chunk_exact,
    "dedup_substring_rewrite": curation.dedup_substring_rewrite,
    "pipeline_c4_keep": pipeline.pipeline_c4_keep,
    "similarity_topk_bruteforce": similarity.similarity_topk_bruteforce,
    "graph_triangle_count": graph.graph_triangle_count,
}

identity = lambda df, *k: df
real = {m.__name__: m.fan_out_small for m in MODS}


def set_mode(mode):
    for m in MODS:
        m.fan_out_small = identity if mode == "old" else real[m.__name__]


def run(spark, fn, mode, name):
    set_mode(mode)
    try:
        from dblp_to_csv_spark.operators.graph import _ARTIFACT_CACHE
        _ARTIFACT_CACHE.clear()
    except Exception:
        pass
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main():
    spark = get_spark("ab_fanout2")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()
    res = {n: {"old": [], "new": []} for n in QUERIES}
    for i in range(3):
        for name, fn in QUERIES.items():
            for mode in ("old", "new"):
                spark.sparkContext.setJobDescription(f"{name} {mode} p{i}")
                res[name][mode].append(run(spark, fn, mode, name))
    tot_o = tot_n = 0.0
    for name in QUERIES:
        o, n = res[name]["old"], res[name]["new"]
        wins = sum(b < a for a, b in zip(o, n))
        tot_o += min(o); tot_n += min(n)
        print(f"{name}: old best {min(o)} {o} | new best {min(n)} {n} | wins {wins}/3")
    print(f"TOTAL best-of-3: old {tot_o:.2f} new {tot_n:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
