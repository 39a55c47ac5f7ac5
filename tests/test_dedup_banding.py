"""Banded-plan correctness gates for the dedup family.

1. SimHash chunk banding is LOSSLESS at hamming ≤ 3: 4 chunks, radius 3 →
   pigeonhole guarantees a shared chunk, so the banded candidate join must
   produce exactly the all-pairs result set.
2. The banded plan must contain no nested-loop join (that was the round-1
   scale-killer — VERDICT r01 'What's wrong' #2).
3. The bucketed embedding near-dup is an equi-join plan too, and its result
   is a subset of the exact all-pairs twin (LSH recall trade, never false
   positives: verification is exact cosine).
"""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.operators.dedup import (
    _simhash_pairs_allpairs,
    _simhash_sketch,
    dedup_embedding_cosine,
    dedup_embedding_cosine_bucketed,
    dedup_simhash,
    minhash_lsh_pairs,
)
from tests.conftest import SF_CORRECTNESS


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def simhash_results(spark):
    banded = _rows(dedup_simhash(spark, SF_CORRECTNESS))
    allpairs = _rows(_simhash_pairs_allpairs(_simhash_sketch(spark, SF_CORRECTNESS)))
    return banded, allpairs


def test_simhash_banding_is_lossless(simhash_results):
    banded, allpairs = simhash_results
    assert banded == allpairs
    assert len(banded) > 0, "fixture too weak: no hamming<=3 pairs at sf0.01"


def test_simhash_xxhash_fast_path_banding_lossless(spark):
    """The opt-in xxhash64 sketch (one native hash vs md5+hex parse per
    word) must satisfy the same pigeonhole guarantee: banded == all-pairs."""
    from dblp_to_csv_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        _simhash_band_pairs,
    )

    sketch = _simhash_sketch(spark, SF_CORRECTNESS, use_xxhash=True)
    banded = _rows(_simhash_band_pairs(sketch))
    allpairs = _rows(_simhash_pairs_allpairs(sketch))
    assert banded == allpairs
    assert all(h <= SIMHASH_MAX_HAMMING for _, _, h in banded)


def test_simhash_plan_has_no_nested_loop(spark):
    plan = dedup_simhash(spark, SF_CORRECTNESS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_bucketed_plan_has_no_nested_loop(spark):
    df = dedup_embedding_cosine_bucketed(spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_recall_vs_exact(spark):
    """LSH candidate generation must recover every ground-truth pair at this
    scale (jaccard >= 0.5, K=12, B=4×R=3 — near-dup pairs share most
    shingles, so band collision probability is ~1). Guards the sliced-md5
    signature construction against silent recall regressions."""
    from dblp_to_csv_spark.operators.dedup import dedup_minhash_lsh, dedup_ngram_jaccard

    exact = _rows(dedup_ngram_jaccard(spark, SF_CORRECTNESS))
    lsh = _rows(dedup_minhash_lsh(spark, SF_CORRECTNESS))
    assert lsh == exact
    assert len(exact) > 0


def test_minhash_materialized_candidates_parity(spark, tmp_path):
    """The checkpoint-to-parquet candidate path (the 100 TB trade) must
    return exactly the recompute path's rows."""
    from dblp_to_csv_spark.operators.dedup import dedup_minhash_lsh, minhash_lsh_pairs

    recompute = _rows(
        minhash_lsh_pairs(spark, SF_CORRECTNESS, materialize_candidates_dir=None)
    )
    materialized = _rows(
        minhash_lsh_pairs(
            spark, SF_CORRECTNESS, materialize_candidates_dir=str(tmp_path / "cand")
        )
    )
    auto = _rows(dedup_minhash_lsh(spark, SF_CORRECTNESS))
    assert recompute == materialized == auto
    assert len(recompute) > 0
    assert (tmp_path / "cand").exists()


def test_minhash_docs_sh_materialization_gate(spark, monkeypatch):
    """The verification-stage docs_sh frame materializes only above the
    input-byte gate (r11 double-eval audit: below it, recompute beats the
    blocking array round-trip — measured at sf0.1). Forcing the gate to 0
    must flip the physical strategy without changing a single pair, and the
    bench-scale corpus must sit BELOW the gate so the headline plan stays
    lazy."""
    import dblp_to_csv_spark.operators.dedup as D
    from dblp_to_csv_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    assert 0 < D._input_bytes(docs) < D.MH_VERIFY_MATERIALIZE_BYTES

    lazy = _rows(D.minhash_lsh_pairs(spark, SF_CORRECTNESS))
    monkeypatch.setattr(D, "MH_VERIFY_MATERIALIZE_BYTES", 0)
    materialized = _rows(D.minhash_lsh_pairs(spark, SF_CORRECTNESS))
    assert lazy == materialized
    assert len(lazy) > 0

    # unknown input size (no backing files) takes the scale-safe branch
    synth = spark.range(1).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("a b c").alias("text"),
    )
    assert D._input_bytes(synth) == 1 << 62


def test_embedding_bucketed_subset_of_exact(spark):
    # ground truth via the GEMM twin (parity-gated against the expression
    # path in test_similarity_recall.py) — un-throttles this gate
    from dblp_to_csv_spark.operators.dedup import embedding_cosine_pairs_blas

    # compare on PAIR KEYS, not (pair, cos) tuples: the BLAS twin's parity
    # tolerance vs the expression path is 1e-5 (float reassociation), so a
    # raw cosine straddling a 6th-decimal rounding boundary could round
    # differently per path even though both are correct — exact tuple
    # equality would flake on a regenerated corpus (review r8)
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_cosine_pairs_blas(spark, SF_CORRECTNESS).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine_bucketed(spark, SF_CORRECTNESS).collect()
    }
    assert bucketed <= exact
    assert len(bucketed) > 0, "fixture too weak: no bucketed near-dup pairs"


def test_band_cap_suppresses_hot_bucket(spark, tmp_path):
    """A boilerplate cluster (many near-identical docs sharing every band)
    must vanish under band_cap < cluster size, while an unrelated small
    near-dup pair survives: its buckets are under the cap."""
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    hot = [f"{base} copy" for _ in range(8)]  # 8 identical → every band hot
    cold = [
        "completely different text about spark query planning and shuffles",
        "completely different text about spark query planning and shuffle",
    ]
    pd.DataFrame(
        {"doc_id": range(10), "text": hot + cold}
    ).to_parquet(tmp_path / "documents.parquet")

    uncapped = minhash_lsh_pairs(spark, str(tmp_path))
    capped = minhash_lsh_pairs(spark, str(tmp_path), band_cap=4)
    un = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    cp = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (8, 9) in un and len(un) > 1  # hot cluster + cold pair found
    assert cp == {(8, 9)}  # cap drops the hot cluster, keeps the cold pair


def test_band_cap_is_subset_at_sf(spark):
    """capped ⊆ uncapped on the fixture corpus (cap can only remove)."""
    from dblp_to_csv_spark.operators.dedup import BAND_CAP

    un = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, SF_CORRECTNESS).collect()
    }
    cp = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, SF_CORRECTNESS, band_cap=BAND_CAP).collect()
    }
    assert cp <= un


def test_shingle_df_cap_removes_boilerplate_glue(spark, tmp_path):
    """Documents identical except for a unique tail share almost all their
    shingles (boilerplate): uncapped MinHash pairs them all; with a
    document-frequency cap below the cluster size the boilerplate shingles
    leave the signatures AND the verification sets, so no pair survives."""
    import pandas as pd

    boiler = " ".join(f"w{i}" for i in range(20))  # 18 shared 3-grams
    docs = [f"{boiler} unique{k} tail{k}" for k in range(6)]
    pd.DataFrame({"doc_id": range(6), "text": docs}).to_parquet(
        tmp_path / "documents.parquet"
    )
    uncapped = minhash_lsh_pairs(spark, str(tmp_path))
    capped = minhash_lsh_pairs(spark, str(tmp_path), shingle_df_cap=3)
    assert uncapped.count() == 15  # all 6-choose-2 pairs glued by boilerplate
    assert capped.count() == 0


def test_edit_distance_banding_is_lossless(spark):
    """Symmetric-delete banding must find EXACTLY the brute-force d≤1 pair
    set — unlike MinHash/sign-LSH it is a lossless filter by construction,
    so equality (not subset) is the invariant."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import (
        EDIT_KEY_WORDS,
        EDIT_MAX_DIST,
        dedup_edit_distance_banded,
    )
    from dblp_to_csv_spark.sources.tables import load_table

    banded = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in dedup_edit_distance_banded(spark, SF_CORRECTNESS).collect()
    }
    k = load_table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, EDIT_KEY_WORDS), " ").alias("key"),
    )
    a, b = k.alias("a"), k.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.key", "b.key").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= EDIT_MAX_DIST)
        .collect()
    }
    assert banded == brute and banded


def test_edit_distance_adversarial_corpus(spark, tmp_path):
    """Directed corpus covering every edit kind: equality, substitution,
    one-char insertion, one-char deletion (found, d<=1), a two-edit key and
    an unrelated key (excluded). Expected set computed by an independent
    pure-Python Levenshtein over the same first-4-token keys."""
    import pandas as pd

    from dblp_to_csv_spark.operators.dedup import dedup_edit_distance_banded

    texts = [
        "abc def ghi jkl tail zero",      # 0 base
        "abc def ghi jkl other tail",     # 1 same key -> d=0 vs 0
        "abc dxf ghi jkl tail two",       # 2 substitution -> d=1 vs 0/1
        "abc deef ghi jkl tail three",    # 3 insertion -> d=1 vs 0/1
        "abc df ghi jkl tail four",       # 4 deletion -> d=1 vs 0/1
        "axc dxf ghi jkl tail five",      # 5 two edits vs 0 -> excluded...
        "completely different words here six",  # 6 unrelated
    ]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    keys = [" ".join(t.split(" ")[:4]) for t in texts]
    expected = {
        (a, b, lev(keys[a], keys[b]))
        for a in range(len(keys))
        for b in range(a + 1, len(keys))
        if lev(keys[a], keys[b]) <= 1
    }
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in dedup_edit_distance_banded(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # the corpus exercises every class: at least one d=0 and three d=1 pairs
    assert (0, 1, 0) in got
    assert {(0, 2, 1), (0, 3, 1), (0, 4, 1)} <= got
    # doc 5 is d=2 from doc 0 (both edits) but d=1 from doc 2 (one shared
    # edit) — the banding must make exactly that distinction
    assert (0, 5, 2) not in got and not any((a, b) == (0, 5) for a, b, _ in got)
    assert (2, 5, 1) in got
    assert not any(6 in (a, b) for a, b, _ in got)  # unrelated never pairs


def test_prefix_filter_prunes_candidate_space(spark):
    """The AllPairs prefix join must generate strictly fewer candidate
    pairs than the raw shingle join (the quadratic twin's fan-out) while
    the registered query's output equals the exact result (that part is
    the parity suite's job — this pins the EFFICIENCY claim: the filter
    actually filters). Candidates come from the OPERATOR's own
    _prefix_candidates helper, so a broken prefix bound fails here, not in
    a drifted test copy."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import (
        _prefix_candidates,
        _shingle_frame,
    )

    sh = _shingle_frame(spark, SF_CORRECTNESS)
    raw_pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    cand = _prefix_candidates(sh).count()
    assert cand < raw_pairs, (cand, raw_pairs)


def test_prefix_filter_differential_adversarial(spark, tmp_path):
    """Pure-Python differential for the AllPairs prefix bound over a corpus
    built to stress it: an EXACT-threshold pair (J = 0.5 precisely — the
    ceil boundary the n−⌈t·n⌉+1 prefix must not lose), identical docs,
    minimum-size docs (3 words = 1 shingle), pairs sharing only their
    RAREST vs only their COMMONEST shingles (both prefix extremes), and
    seeded random mutations. The expected pair set is brute-forced here
    with an independent 3-shingle implementation — no shared code with the
    operator."""
    import itertools
    import random

    import pandas as pd

    from dblp_to_csv_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_jaccard_prefix_filter,
    )

    rng = random.Random(77)
    pool = [f"w{i}" for i in range(12)]  # small pool → shared, varied-df shingles
    docs = []
    # exact-boundary pair: 8-word doc vs shared 6-word run + 2 fresh words
    a_words = [f"a{i}" for i in range(8)]
    docs.append(" ".join(a_words))
    docs.append(" ".join(a_words[:6] + ["zq1", "zq2"]))
    # identical pair
    docs.append("dup dup alpha beta gamma")
    docs.append("dup dup alpha beta gamma")
    # minimum-size: single shared shingle (J = 1.0 at size 1)
    docs.append("tiny one shingle")
    docs.append("tiny one shingle")
    # rare-only vs common-only sharing: 'c0 c1 c2' appears in MANY docs
    # (common shingle), 'r0 r1 r2' in exactly two (rare)
    for _ in range(6):
        docs.append("c0 c1 c2 " + " ".join(rng.choices(pool, k=6)))
    docs.append("r0 r1 r2 r3 r4 uniqx")  # shares 3 of 4 shingles with next
    docs.append("r0 r1 r2 r3 r4 uniqy")  # J = 3/5 — above threshold via RARE shingles only
    # seeded random docs for incidental near-boundary pairs
    for _ in range(20):
        docs.append(" ".join(rng.choices(pool, k=rng.randint(3, 12))))
    pd.DataFrame({"doc_id": range(len(docs)), "text": docs}).to_parquet(
        tmp_path / "documents.parquet"
    )

    def sh3(text):  # independent reimplementation of the 3-shingle set
        w = [t for t in "".join(
            ch if ch.isalnum() else " " for ch in text.lower()
        ).split() if t]
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh3(t) for i, t in enumerate(docs)}
    expected = set()
    for i, j in itertools.combinations(range(len(docs)), 2):
        a, b = sets[i], sets[j]
        if not a or not b:
            continue
        jac = len(a & b) / len(a | b)
        if round(jac, 6) >= JACCARD_THRESHOLD:
            expected.add((i, j))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_jaccard_prefix_filter(spark, str(tmp_path)).collect()
    }
    assert got == expected, (sorted(got - expected), sorted(expected - got))
    # the corpus must actually exercise the boundary and both extremes
    assert (0, 1) in expected  # J == 0.5 exactly
    assert (len(docs) - 22, len(docs) - 21) in expected  # rare-only pair


def test_image_dhash_banding_is_lossless(spark):
    """dedup_image_phash's 4x16-bit band equi-join must return EXACTLY the
    hamming<=3 pair set of the quadratic all-pairs ground truth over the
    same dHash sketch (pigeonhole: max_hamming < n_bands). Also pins the
    emit-on-first-collision dedup — the banded plan must not emit a pair
    once per agreeing band."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import banded_hamming_pairs
    from dblp_to_csv_spark.operators.multimodal import (
        DHASH_MAX_HAMMING,
        encode_bmp_payloads,
        image_dhash_payloads,
        with_binary_payload,
    )
    from dblp_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    sketch = (
        image_dhash_payloads(
            encode_bmp_payloads(
                with_binary_payload(docs).select("doc_id", "payload")
            )
        )
        .filter(F.col("ok"))
        .select("doc_id", "b0", "b1", "b2", "b3")
    )
    banded = _rows(
        banded_hamming_pairs(sketch, ["b0", "b1", "b2", "b3"], DHASH_MAX_HAMMING)
    )
    a, b = sketch.alias("a"), sketch.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(4)
    )
    allpairs = _rows(
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= DHASH_MAX_HAMMING)
    )
    assert banded == allpairs
    assert len(banded) > 0, "fixture too weak: no hamming<=3 image pairs at sf0.01"


def test_image_dhash_band_count_exceeds_radius():
    """The losslessness precondition itself: the banded join is only exact
    while max_hamming < n_bands, and banded_hamming_pairs refuses lossy
    configurations outright."""
    import pytest as _pytest

    from dblp_to_csv_spark.operators.dedup import banded_hamming_pairs
    from dblp_to_csv_spark.operators.multimodal import (
        DHASH_BANDS,
        DHASH_MAX_HAMMING,
    )

    assert DHASH_MAX_HAMMING < DHASH_BANDS
    with _pytest.raises(ValueError, match="lossy"):
        banded_hamming_pairs(None, ["b0", "b1"], 2)


def test_audio_fingerprint_banding_is_lossless(spark):
    """dedup_audio_fingerprint's banded join equals the quadratic all-pairs
    ground truth over the same energy-gradient sketch (hamming<=3 < 4
    bands)."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import banded_hamming_pairs
    from dblp_to_csv_spark.operators.multimodal import (
        AUDIO_FP_MAX_HAMMING,
        audio_fingerprint_payloads,
        encode_wav_payloads,
        with_binary_payload,
    )
    from dblp_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    sketch = (
        audio_fingerprint_payloads(
            encode_wav_payloads(
                with_binary_payload(docs).select("doc_id", "payload")
            )
        )
        .filter(F.col("ok"))
        .select("doc_id", "b0", "b1", "b2", "b3")
    )
    banded = _rows(
        banded_hamming_pairs(
            sketch, ["b0", "b1", "b2", "b3"], AUDIO_FP_MAX_HAMMING
        )
    )
    a, b = sketch.alias("a"), sketch.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(4)
    )
    allpairs = _rows(
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= AUDIO_FP_MAX_HAMMING)
    )
    assert banded == allpairs
    assert len(banded) > 0, "fixture too weak: no hamming<=3 audio pairs at sf0.01"


def test_perceptual_hash_plans_have_no_nested_loop(spark):
    """Both r13 perceptual near-dup queries must plan their candidate join
    as an equi-join on (band_idx, band_val) — never a nested loop / cross
    product (the banded machinery's whole point)."""
    from dblp_to_csv_spark.registry import all_queries

    q = all_queries()
    for name in ("dedup_image_phash", "dedup_audio_fingerprint"):
        plan = (
            q[name].fn(spark, SF_CORRECTNESS)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
