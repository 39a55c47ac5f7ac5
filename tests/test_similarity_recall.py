"""Recall checks for the approximate similarity paths against the exact
brute-force baseline (which itself is oracle-verified): LSH/IVF candidates
that survive must be a subset of the corpus, per-query results well-formed,
and bucket pruning must actually prune."""

from __future__ import annotations

from tests.conftest import SF_CORRECTNESS


def _topk(spark, name):
    from dblp_to_csv_spark.registry import all_queries

    df = all_queries()[name].fn(spark, SF_CORRECTNESS)
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    return {q: sorted(v) for q, v in out.items()}


def test_bucketed_variants_subset_of_bruteforce_scores(spark):
    exact = _topk(spark, "similarity_topk_bruteforce")
    for name in (
        "similarity_topk_lsh_bucketed",
        "similarity_topk_lsh_multiprobe",
        "similarity_topk_ivf",
        "similarity_topk_ivf_nprobe",
    ):
        approx = _topk(spark, name)
        assert set(approx).issubset(set(exact))
        for q, rows in approx.items():
            # approximate top-1 similarity can never exceed the exact top-1
            assert rows[0][2] <= exact[q][0][2] + 1e-9, (name, q)
            # ranks are 1..k without gaps
            assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_multiprobe_dominates_single_probe(spark):
    """Multi-probe candidates are a SUPERSET of the single-probe bucket's
    (the probe set contains the home bucket), so per query: every
    single-probe neighbor set is contained in the multi-probe CANDIDATE
    pool — observable as the multi-probe best cosine being ≥ the
    single-probe best, and any common neighbor carrying the same cosine."""
    single = _topk(spark, "similarity_topk_lsh_bucketed")
    multi = _topk(spark, "similarity_topk_lsh_multiprobe")
    assert set(single) <= set(multi) and single
    for q, srows in single.items():
        mrows = multi[q]
        assert mrows[0][2] >= srows[0][2] - 1e-9  # more candidates can't lose
        msim = {n: s for _, n, s in mrows}
        for _, n, s in srows:
            if n in msim:
                assert msim[n] == s, (q, n)


def test_ivf_nprobe_dominates_single_probe(spark):
    """The nprobe=2 probe set contains the home cell (rank-1 centroid IS
    the assignment), so per query the single-probe IVF result is candidate-
    contained in the nprobe one: best cosine monotone, common neighbors
    carry identical cosines."""
    single = _topk(spark, "similarity_topk_ivf")
    multi = _topk(spark, "similarity_topk_ivf_nprobe")
    assert set(single) <= set(multi) and single
    for q, srows in single.items():
        mrows = multi[q]
        assert mrows[0][2] >= srows[0][2] - 1e-9
        msim = {n: s for _, n, s in mrows}
        for _, n, s in srows:
            if n in msim:
                assert msim[n] == s, (q, n)


def test_ivf_prunes_candidates(spark):
    """IVF scoring touches only the query's cell: every query's candidate
    pool is smaller than the corpus (sanity that pruning actually happened —
    with 8 cells a query scores ~1/8 of vectors)."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.registry import all_queries

    df = all_queries()["similarity_topk_ivf"].fn(spark, SF_CORRECTNESS)
    # k=5 requested; a query living in a tiny cell may return fewer — all
    # queries must return between 1 and 5 rows
    per_q = df.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    assert per_q and all(1 <= r["n"] <= 5 for r in per_q)


def test_blas_path_matches_expression_path(spark):
    """The numpy-blocked scorer must produce the same top-k as the
    oracle-checked expression path — identical (query, neighbor, rank)
    triples, cosine equal to 1e-5 (BLAS reassociation tolerance)."""
    from dblp_to_csv_spark.operators.similarity import (
        similarity_topk_blas,
        similarity_topk_bruteforce,
    )
    from tests.conftest import SF_CORRECTNESS

    expr = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity_topk_bruteforce(spark, SF_CORRECTNESS).collect()
    }
    blas = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity_topk_blas(spark, SF_CORRECTNESS).collect()
    }
    assert set(expr) == set(blas)
    for key, (nid, sim) in expr.items():
        bnid, bsim = blas[key]
        assert bnid == nid, f"{key}: neighbor {bnid} != {nid}"
        assert abs(bsim - sim) < 1e-5, f"{key}: {bsim} vs {sim}"


def test_semdedup_drops_subset_of_exact_cosine_pairs(spark):
    """Cell-restriction can only LOSE near-dup pairs, never invent them:
    every vector SemDeDup drops must have an exact cosine ≥ threshold
    partner with a smaller id in the oracle-checked all-pairs result
    (dedup_embedding_cosine uses the same threshold corpus-wide)."""
    from dblp_to_csv_spark.registry import all_queries

    from dblp_to_csv_spark.operators.dedup import embedding_cosine_pairs_blas

    sem = all_queries()["dedup_semantic_semdedup"].fn(spark, SF_CORRECTNESS)
    dropped = {r["vec_id"] for r in sem.collect() if not r["kept"]}
    assert dropped  # fixture corpus has near-dups at this threshold
    # exact ground truth via the GEMM twin (parity-gated below)
    pairs = embedding_cosine_pairs_blas(spark, SF_CORRECTNESS)
    with_smaller_partner = {r["vec_b"] for r in pairs.collect()}
    assert dropped <= with_smaller_partner


def test_blas_pair_scorer_matches_expression_path(spark):
    """The GEMM pair scorer must reproduce the oracle-checked expression
    path exactly: identical (vec_a, vec_b) pair set, cosines to 1e-5 (BLAS
    reassociation tolerance) — the parity gate that lets the other recall
    tests use the fast twin as ground truth."""
    from dblp_to_csv_spark.operators.dedup import (
        dedup_embedding_cosine,
        embedding_cosine_pairs_blas,
    )

    expr = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup_embedding_cosine(spark, SF_CORRECTNESS).collect()
    }
    blas = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_cosine_pairs_blas(spark, SF_CORRECTNESS).collect()
    }
    assert set(expr) == set(blas) and expr
    for pair, sim in expr.items():
        assert abs(blas[pair] - sim) < 1e-5, pair


def test_knn_graph_consistent_with_bucketed_topk_on_queries(spark):
    """Consistency between the kNN graph (KNN_SIGN_BITS=5 buckets) and the
    query-set top-k (SIGN_BITS=3): the 5-bit bucket is a PREFIX REFINEMENT
    of the 3-bit one, so for the query vectors the graph's candidate pool is
    a subset of the top-k's. That forces, per query:
    * every graph neighbor shares the query's 5-bit sign prefix;
    * the graph's best cosine cannot exceed the coarser bucket's best;
    * any (query, neighbor) pair present in BOTH results carries the same
      cosine, and common neighbors appear in the same relative order."""
    from dblp_to_csv_spark.operators.similarity import (
        KNN_K,
        KNN_SIGN_BITS,
        N_QUERIES,
    )
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.sources.tables import load_table

    sign = {
        r["vec_id"]: "".join(
            "1" if r["embedding"][i] >= 0 else "0" for i in range(KNN_SIGN_BITS)
        )
        for r in load_table(spark, SF_CORRECTNESS, "embeddings").collect()
    }
    graph: dict[int, list] = {}
    for r in (
        all_queries()["similarity_knn_graph_bucketed"].fn(spark, SF_CORRECTNESS).collect()
    ):
        if r["vec_id"] < N_QUERIES:
            graph.setdefault(r["vec_id"], []).append(
                (r["rank"], r["neighbor_id"], r["cos_sim"])
            )
    topk: dict[int, list] = {}
    for r in (
        all_queries()["similarity_topk_lsh_bucketed"].fn(spark, SF_CORRECTNESS).collect()
    ):
        topk.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
        )
    assert graph  # query vectors do appear in the graph
    for q, rows in graph.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= KNN_K
        assert all(sign[n] == sign[q] for _, n, _ in rows)  # 5-bit confinement
        coarse = sorted(topk.get(q, []))
        if coarse:
            assert rows[0][2] <= coarse[0][2] + 1e-9  # refinement can't win
            coarse_sim = {n: s for _, n, s in coarse}
            common = [n for _, n, _ in rows if n in coarse_sim]
            for rank, n, s in rows:
                if n in coarse_sim:
                    assert s == coarse_sim[n], (q, n)
            # same relative order among common neighbors
            coarse_order = [n for _, n, _ in coarse if n in set(common)]
            assert common == coarse_order, q


def test_pq_rerank_recall_and_exactness(spark):
    """PQ-ADC + exact rerank: the fixture corpus is i.i.d. random — PQ's
    worst case (no cluster structure; measured ADC-only recall@5 at
    M=4,K=8 is 0.075, and the (M,K) curve 4,8→16,32 tops out at 0.4) — so
    the registered query rezanks the ADC top-PQ_RERANK exactly. Measured
    reranked recall@5 at sf0.01: 0.75 mean. Floor pinned at 0.5; common
    neighbors must carry the bruteforce-identical cosine (the rerank is
    exact by construction)."""
    exact = _topk(spark, "similarity_topk_bruteforce")
    pq = _topk(spark, "similarity_topk_pq")
    assert set(pq) == set(exact)
    recalls = []
    for q, rows in pq.items():
        ex_n = {n for _, n, _ in exact[q]}
        pq_n = {n for _, n, _ in rows}
        recalls.append(len(ex_n & pq_n) / len(ex_n))
        # rerank scores are exact cosines: identical on common neighbors
        ex_sim = {n: s for _, n, s in exact[q]}
        for _, n, s in rows:
            if n in ex_sim:
                assert s == ex_sim[n], (q, n)
        # approximate top-1 can never beat the exact top-1
        assert rows[0][2] <= exact[q][0][2] + 1e-9
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivfadc_composition_equals_ivf_when_rerank_covers_cell(spark):
    """IVFADC = IVF coarse cells × PQ-ADC candidates × exact rerank — the
    two halves the PQ docstring says compose, composed: confine the ADC
    score frame to the query's coarse k-means cell, exact-rerank ALL
    in-cell candidates (at sf0.01 every cell is smaller than PQ_RERANK),
    and the result must equal similarity_topk_ivf EXACTLY — the rerank
    over a fully-covered cell IS the in-cell exact ranking."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.similarity import (
        IVF_CELLS,
        TOP_K,
        _as_double,
        _dot,
        _norm,
        _topk,
        kmeans_cells,
        pq_adc_scores,
    )
    from dblp_to_csv_spark.sources.tables import load_table

    emb = load_table(spark, SF_CORRECTNESS, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    cells = kmeans_cells(emb, k=IVF_CELLS)
    scores = pq_adc_scores(spark, SF_CORRECTNESS)
    qcell = cells.select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell")
    )
    ncell = cells.select(
        F.col("vec_id").alias("neighbor_id"), F.col("cell").alias("ncell")
    )
    confined = (
        scores.join(qcell, "query_id")
        .join(ncell, "neighbor_id")
        .filter(F.col("qcell") == F.col("ncell"))
        .select("query_id", "neighbor_id")
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        _norm(F.col("emb")).alias("qn"),
    )
    ne = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("nemb"),
        _norm(F.col("emb")).alias("nn"),
    )
    cos = _dot(F.col("qe"), F.col("nemb")) / (F.col("qn") * F.col("nn"))
    reranked = (
        confined.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    got = {
        tuple(r) for r in _topk(reranked, "query_id", TOP_K).collect()
    }
    want = {
        tuple(r) for r in _topk_frame_rows(spark)
    }
    assert got == want


def _topk_frame_rows(spark):
    from dblp_to_csv_spark.registry import all_queries

    return all_queries()["similarity_topk_ivf"].fn(spark, SF_CORRECTNESS).collect()


def test_semdedup_kernel_fold_bit_exact(spark):
    """The grouped numpy kernel behind dedup_semantic_semdedup's drop set
    must reproduce the zip_with/aggregate HOF fold BIT-FOR-BIT (== on
    doubles, no tolerance): the kernel accumulates the Gram matrix one
    dimension at a time in dimension order — the exact FP op sequence of
    the sequential fold — so max-raw-cosine per vector is the same double
    the old per-pair aggregate produced. Corpus is adversarial: exact
    duplicates (cos 1.0), negated vectors (cos −1.0), a zero vector (NULL
    norm → excluded from max), near-ties at the 6-dp rounding boundary,
    and denormal-ish magnitudes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.dedup import (
        _dot,
        _norm,
        _semdedup_cell_max_cos,
    )

    rng = np.random.RandomState(7)
    vecs = {
        1: rng.randn(8),
        2: rng.randn(8),
        3: None,  # filled below: duplicate of 1 (cos exactly 1.0)
        4: None,  # negated 2 (cos exactly -1.0)
        5: np.zeros(8),  # zero vector: NULL norm, excluded everywhere
        6: rng.randn(8) * 1e-160,  # tiny magnitudes (norm underflow guard)
        7: rng.randn(8),
        8: None,  # 7 + 1e-9 perturbation: rounding-boundary near-tie
        # NaN/Inf landmines: Spark's when(d > 0, ...) passes a NaN self-dot
        # (NaN orders GREATER than any double) and Spark's max ranks NaN
        # greatest — the kernel must let these PARTICIPATE, unlike the
        # NULL-norm zero vector
        9: None,  # one NaN coordinate: NaN norm, NaN cosines
        10: None,  # one +Inf coordinate: Inf norm → 0/NaN cosines
    }
    vecs[3] = vecs[1].copy()
    vecs[4] = -vecs[2]
    vecs[8] = vecs[7] + 1e-9
    vecs[9] = rng.randn(8)
    vecs[9][3] = float("nan")
    vecs[10] = rng.randn(8)
    vecs[10][5] = float("inf")
    pdf = pd.DataFrame(
        {
            "vec_id": list(vecs),
            "emb": [np.asarray(v, dtype=np.float64) for v in vecs.values()],
            "cell": [0] * len(vecs),
        }
    )
    got = _semdedup_cell_max_cos(pdf)
    got_map = dict(zip(got["vec_id"], got["max_cos_raw"]))

    rows = [(int(k), [float(x) for x in v]) for k, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    emb = emb.withColumn("nrm", _norm(F.col("emb")))
    a, c = emb.alias("a"), emb.alias("c")
    cos = _dot(F.col("a.emb"), F.col("c.emb")) / (
        F.col("a.nrm") * F.col("c.nrm")
    )
    want = (
        a.join(c, F.col("c.vec_id") < F.col("a.vec_id"))
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.max(cos).alias("max_cos_raw"))
        .collect()
    )
    want_map = {
        r["vec_id"]: r["max_cos_raw"]
        for r in want
        if r["max_cos_raw"] is not None
    }
    assert set(got_map) == set(want_map)
    import math

    for k, v in want_map.items():
        if math.isnan(v):
            assert math.isnan(got_map[k]), (k, got_map[k], v)
        else:
            assert got_map[k] == v, (k, got_map[k], v, got_map[k] - v)


def test_decon_kernel_candidates_bit_exact(spark):
    """decontaminate_semantic's mapInPandas scorer must reproduce the old
    crossJoin + HOF-fold + window chain EXACTLY on an adversarial corpus:
    per training vector the same (nearest_eval_id, max_cos) row, with raw
    candidate cosines bit-identical to the fold (the window and ROUND run
    in Spark either way). Cases: rounding-boundary near-ties between TWO
    eval vectors (tie must break to the smaller eval_id), negated/duplicate
    vectors, a zero-norm training vector (all-NULL row: smallest eval_id,
    NULL max_cos), a zero-norm eval vector (excluded), NaN and Inf
    coordinates (NaN cosines sort FIRST and tie-break by eval_id)."""
    import math

    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.operators.similarity import (
        _DECON_FINITE,
        _DECON_NAN,
        _DECON_NULL,
        _decon_candidates_kernel,
        _dot,
        _norm,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(8)
    ev_vecs = {
        100: base,                      # near-tie partner A
        101: base + 1e-9,               # near-tie partner B (same 6-dp class)
        102: np.zeros(8),               # zero-norm eval: excluded everywhere
        103: rng.randn(8),
    }
    nanv = rng.randn(8); nanv[2] = float("nan")
    infv = rng.randn(8); infv[6] = float("inf")
    tr_vecs = {
        1: base.copy(),                 # cos 1.0 vs 100, near-1.0 vs 101
        2: -base,                       # cos -1.0: negative max
        3: np.zeros(8),                 # all-NULL row
        4: rng.randn(8),
        5: nanv,                        # NaN cosines vs every valid eval
        6: infv,                        # Inf norm: 0/NaN cosines
    }
    rows = [
        (int(k), [float(x) for x in v], 0) for k, v in ev_vecs.items()
    ] + [(int(k), [float(x) for x in v], 1) for k, v in tr_vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, emb array<double>, label int")
    emb = emb.withColumn("nrm", _norm(F.col("emb")))
    ev = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("emb").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
    )
    tr = emb.filter(F.col("label") != 0)

    # OLD chain: crossJoin + per-pair rounded fold + top-1 window
    cos = F.round(
        _dot(F.col("emb"), F.col("e_emb")) / (F.col("nrm") * F.col("e_nrm")), 6
    )
    scored_old = tr.crossJoin(F.broadcast(ev)).select(
        "vec_id", "eval_id", cos.alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "eval_id")
    best_old = {
        r["vec_id"]: (r["eval_id"], r["cos"])
        for r in scored_old.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }

    # NEW chain: kernel candidates + the same round + window in Spark
    ev_ids = np.array(sorted(ev_vecs), dtype=np.int64)
    ev_mat = np.array([ev_vecs[i] for i in sorted(ev_vecs)], dtype=np.float64)
    kernel = _decon_candidates_kernel(ev_ids, ev_mat)
    cand = tr.select("vec_id", "emb").mapInPandas(
        kernel, "vec_id long, eval_id long, cos double, kind int"
    )
    raw_cos = (
        F.when(F.col("kind") == _DECON_NAN, F.lit(float("nan")))
        .when(F.col("kind") == _DECON_NULL, F.lit(None).cast("double"))
        .otherwise(F.col("cos"))
    )
    best_new = {
        r["vec_id"]: (r["eval_id"], r["cos"])
        for r in cand.select(
            "vec_id", "eval_id", F.round(raw_cos, 6).alias("cos")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert set(best_new) == set(best_old) == set(tr_vecs)
    for k, (e_old, c_old) in best_old.items():
        e_new, c_new = best_new[k]
        assert e_new == e_old, (k, (e_new, c_new), (e_old, c_old))
        if c_old is None or (isinstance(c_old, float) and math.isnan(c_old)):
            same = (c_new is None and c_old is None) or (
                c_new is not None and math.isnan(c_new) and math.isnan(c_old)
            )
            assert same, (k, c_new, c_old)
        else:
            assert c_new == c_old, (k, c_new, c_old)

    # raw candidate cosines are bit-identical to the unrounded fold
    raw_old = {
        (r["vec_id"], r["eval_id"]): r["rc"]
        for r in tr.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            "eval_id",
            (
                _dot(F.col("emb"), F.col("e_emb"))
                / (F.col("nrm") * F.col("e_nrm"))
            ).alias("rc"),
        )
        .collect()
    }
    fin = [r for r in cand.collect() if r["kind"] == _DECON_FINITE]
    assert fin
    for r in fin:
        assert raw_old[(r["vec_id"], r["eval_id"])] == r["cos"], (
            r,
            raw_old[(r["vec_id"], r["eval_id"])],
        )
