"""Similarity search: exact brute-force vs numpy ground truth; LSH/IVF
path recall; batched query matmul path."""

import numpy as np
import pytest

from auctus_spark.operators.similarity import (
    HyperplaneLSH,
    ann_recall,
    cosine_topk,
    cosine_topk_batch,
)


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.Generator(np.random.PCG64(11))
    centers = rng.normal(size=(4, 32)) * 3
    rows, mat = [], []
    for i in range(400):
        v = centers[i % 4] + rng.normal(size=32) * 0.5
        rows.append((i, v.tolist()))
        mat.append(v)
    return rows, np.array(mat)


def _exact_np(mat, q, k):
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(mat)), -sims))
    return [int(i) for i in order[:k]]


def test_cosine_topk_exact(spark, vectors):
    rows, mat = vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = mat[7]
    got = [r.vec_id for r in cosine_topk(emb, q.tolist(), k=10).collect()]
    assert got == _exact_np(mat, q, 10)


def test_cosine_topk_batch(spark, vectors):
    rows, mat = vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, mat[7].tolist()), (200, mat[13].tolist())],
        "q_id long, embedding array<double>")
    out = cosine_topk_batch(emb, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.q_id, []).append((r.cos_sim, r.vec_id))
    for qid, qv in [(100, mat[7]), (200, mat[13])]:
        ids = [v for _, v in sorted(got[qid], key=lambda t: (-t[0], t[1]))]
        assert ids == _exact_np(mat, qv, 5)


def test_lsh_search_recall(spark, vectors):
    rows, mat = vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lsh = HyperplaneLSH(dim=32, n_planes=10)
    bucketed = lsh.bucketize(emb).cache()
    q = mat[7]
    exact = _exact_np(mat, q, 10)
    approx = [r.vec_id for r in
              lsh.search(bucketed, q.tolist(), k=10).collect()]
    rec = ann_recall(exact, approx)
    assert rec >= 0.6, rec
    # candidate set actually pruned vs full scan
    probes = lsh.probe_buckets(q, 2)
    n_cand = bucketed.filter(bucketed.bucket.isin(probes)).count()
    assert n_cand < 400


def test_lsh_partition_table_pruning(spark, vectors, tmp_path):
    """partition_table writes bucket=N hive partitions;
    search_partitioned reads ONLY the probed partitions (the scan's
    partition filter carries the bucket isin) and returns exactly what
    the in-memory bucketed search returns."""
    rows, mat = vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lsh = HyperplaneLSH(dim=32, n_planes=10)
    path = str(tmp_path / "ann")
    lsh.partition_table(emb, path)
    import glob
    import os
    parts = glob.glob(os.path.join(path, "bucket=*"))
    assert len(parts) > 4                       # really hive-partitioned
    q = mat[7].tolist()
    got = [(r.vec_id, round(r.cos_sim, 9)) for r in
           lsh.search_partitioned(spark, path, q, k=10).collect()]
    want = [(r.vec_id, round(r.cos_sim, 9)) for r in
            lsh.search(lsh.bucketize(emb), q, k=10).collect()]
    assert got == want and len(got) == 10
    # partition pruning: the physical scan keeps a PartitionFilters
    # entry on bucket (pruned read, not a full-table scan)
    plan = (lsh.search_partitioned(spark, path, q, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan and "bucket" in plan.split(
        "PartitionFilters")[1][:200]


def test_ivf_planted_recovers_clusters(spark):
    """Deterministic maxmin-init KMeans recovers the planted one-hot
    clusters exactly (pure lists, one per cluster)."""
    from auctus_spark.operators.similarity import (IVFKMeans,
                                                   planted_embeddings)
    ids = spark.range(0, 400, 1, 4).withColumnRenamed("id", "vec_id")
    emb = planted_embeddings(ids)
    ivf = IVFKMeans(n_lists=16).fit(emb)
    assigned = ivf.assign(emb).select("vec_id", "list_id").collect()
    by_list = {}
    for r in assigned:
        by_list.setdefault(r.list_id, set()).add(r.vec_id % 16)
    assert len(by_list) == 16
    assert all(len(v) == 1 for v in by_list.values())


def test_ivf_search_exact_on_planted(spark):
    """nprobe=2 IVF top-k equals exact brute-force top-k on the
    planted corpus (the ann_ivf gate's contract)."""
    from auctus_spark.operators.similarity import (IVFKMeans,
                                                   planted_embeddings)
    ids = spark.range(0, 400, 1, 4).withColumnRenamed("id", "vec_id")
    emb = planted_embeddings(ids)
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    ivf = IVFKMeans(n_lists=16).fit(emb)
    assigned = ivf.assign(emb)
    q = rows[1]
    got = [r.vec_id for r in
           ivf.search(assigned.filter("vec_id <> 1"), q, k=15,
                      nprobe=2).collect()]
    mat = np.array([rows[i] for i in range(400)])
    want = [i for i in _exact_np(mat, np.array(q), 16) if i != 1][:15]
    assert got == want


def test_ivf_recall_on_random(spark, vectors):
    """On non-planted (4 gaussian clusters) data IVF still reaches
    recall 1.0 probing 4/8 lists that match the generator."""
    from auctus_spark.operators.similarity import IVFKMeans, ann_recall
    rows, mat = vectors
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    ivf = IVFKMeans(n_lists=8, n_iter=10).fit(emb)
    assigned = ivf.assign(emb)
    q = mat[7]
    got = [r.vec_id for r in
           ivf.search(assigned, q.tolist(), k=10, nprobe=4).collect()]
    assert ann_recall(_exact_np(mat, q, 10), got) >= 0.9


def test_ivf_partitioned_pruned_scan(spark, tmp_path):
    """search_partitioned over the IVF layout: zero Exchange, probed
    list_id partitions only (partition pruning)."""
    from auctus_spark.operators.similarity import (IVFKMeans,
                                                   planted_embeddings)
    ids = spark.range(0, 300, 1, 4).withColumnRenamed("id", "vec_id")
    emb = planted_embeddings(ids)
    q = emb.filter("vec_id = 3").collect()[0].embedding
    ivf = IVFKMeans(n_lists=16).fit(emb)
    path = str(tmp_path / "ivfp")
    ivf.partition_table(emb, path)
    df = ivf.search_partitioned(spark, path, q, k=5, nprobe=2)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys, phys
    assert "TakeOrderedAndProject" in phys
    assert "PartitionFilters" in phys
    assert "list_id" in phys.split("PartitionFilters", 1)[1][:300]


def test_cosine_topk_filtered_prefilter_semantics(spark):
    """ES filtered-kNN contract: filter BEFORE search — the result is
    the exact top-k of the filtered set, and rows a global top-k
    would have returned get replaced, not dropped."""
    from pyspark.sql import functions as F

    from auctus_spark.operators.similarity import (cosine_topk,
                                                   cosine_topk_filtered)
    rows = [(0, [1.0, 0.0], "a"), (1, [0.99, 0.1], "b"),
            (2, [0.9, 0.3], "a"), (3, [0.0, 1.0], "a"),
            (4, [0.5, 0.5], "b")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lab string")
    q = [1.0, 0.0]
    flt = [(r.vec_id, r.cos_sim) for r in
           cosine_topk_filtered(df, q, F.col("lab") == "a",
                                k=2).collect()]
    assert [v for v, _ in flt] == [0, 2]   # 1 outranks 2 but is 'b'
    assert len(flt) == 2                   # k survivors guaranteed
    post = [r.vec_id for r in cosine_topk(df, q, k=2).collect()]
    assert post == [0, 1]                  # global top-k differs


def test_rrf_fuse_formula_and_absence(spark):
    """RRF: score = sum 1/(c + rank_i); absence from a retriever
    contributes exactly 0; ties break id asc."""
    from auctus_spark.operators.similarity import rrf_fuse
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double")
    got = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse(a, b, rank_constant=60, k=10).collect()}
    assert got[1] == pytest.approx(1 / 61)
    assert got[2] == pytest.approx(1 / 62 + 1 / 61)   # rank 2 + rank 1
    assert got[3] == pytest.approx(1 / 63)
    assert got[4] == pytest.approx(1 / 62)
    # fused order: doc2 first (both lists), then 1, 4 (1/61 vs 1/62)
    order = [r["doc_id"]
             for r in rrf_fuse(a, b, rank_constant=60, k=10).collect()]
    assert order == [2, 1, 4, 3]
    # symmetric-rank tie (a-rank 1 only vs b-rank 1 only) -> id asc
    a1 = spark.createDataFrame([(7, 1.0)], "doc_id long, score double")
    b1 = spark.createDataFrame([(5, 1.0)], "doc_id long, score double")
    tie = [r["doc_id"] for r in rrf_fuse(a1, b1, k=2).collect()]
    assert tie == [5, 7]


def test_quantized_rescore_matches_exact(spark, vectors):
    """int8-quantized candidate phase + exact rescore: with a window
    comfortably above k on a clustered corpus the result equals the
    exact brute-force top-k (normalization makes quantized dot track
    cosine, the affine correction removes the offset bias, and the
    rescore is exact float cosine)."""
    from auctus_spark.operators.similarity import quantized_topk_rescore
    rows, mat = vectors
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = mat[7]
    got = quantized_topk_rescore(
        emb.filter("vec_id <> 7"), q.tolist(), k=10, window=120)
    ids = [r["vec_id"] for r in got.collect()]
    mask = np.arange(len(mat)) != 7
    sims = (mat[mask] @ q) / (np.linalg.norm(mat[mask], axis=1)
                              * np.linalg.norm(q))
    keep = np.arange(len(mat))[mask]
    order = np.lexsort((keep, -np.round(sims, 6)))
    assert ids == [int(keep[i]) for i in order[:10]]


def test_quantization_mapping_clamped_and_integer(spark, vectors):
    """The quantized components are integers in [0, 255] and the
    corpus min/max map to the endpoints exactly."""
    from auctus_spark.operators.similarity import (
        quantize_vec_expr, scalar_quantization_bounds)
    from pyspark.sql import functions as F
    rows, mat = vectors
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    mn, mx = scalar_quantization_bounds(emb)
    assert mn == pytest.approx(float(mat.min()))
    assert mx == pytest.approx(float(mat.max()))
    qcol = emb.select(quantize_vec_expr(F.col("embedding"),
                                        mn, mx).alias("q"))
    agg = qcol.select(
        F.min(F.array_min("q")).alias("lo"),
        F.max(F.array_max("q")).alias("hi")).collect()[0]
    assert agg["lo"] == 0 and agg["hi"] == 255


def test_linear_fuse_minmax_weights_and_absence(spark):
    """linear retriever: minmax-normalized windows, weighted sum,
    absence -> 0, constant window -> 1.0, id-asc ties."""
    from auctus_spark.operators.similarity import linear_fuse
    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(2, 0.5), (4, 0.5)], "doc_id long, score double")
    got = {r["doc_id"]: r["linear_score"]
           for r in linear_fuse(a, b, weight_a=2.0, weight_b=1.0,
                                k=10).collect()}
    # a-norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0; b is constant -> 1.0 each
    assert got[1] == pytest.approx(2.0)
    assert got[2] == pytest.approx(2.0 * 0.5 + 1.0)
    assert got[3] == pytest.approx(0.0)
    assert got[4] == pytest.approx(1.0)
    order = [r["doc_id"]
             for r in linear_fuse(a, b, weight_a=2.0, weight_b=1.0,
                                  k=10).collect()]
    assert order == [1, 2, 4, 3]   # 2.0-tie between 1 and 2 -> id asc


def test_maxsim_closed_form(spark):
    """maxSim on a handmade bag: score = sum over query vectors of the
    max dot against the doc's vectors; single-vector docs reduce to
    plain dot sums."""
    from auctus_spark.operators.similarity import maxsim_topk
    rows = [
        (0, [1.0, 0.0]), (0, [0.0, 1.0]),       # doc 0: e1, e2
        (1, [0.5, 0.5]),                        # doc 1: one vector
    ]
    vecs = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    qs = [[2.0, 0.0], [0.0, 4.0]]
    got = {r["doc_id"]: r["maxsim"]
           for r in maxsim_topk(vecs, qs, k=10).collect()}
    # doc 0: max(2,0) + max(0,4) = 6 ; doc 1: max(1) + max(2) = 3
    assert got == {0: 6.0, 1: 3.0}
    with pytest.raises(ValueError):
        maxsim_topk(vecs, [], k=5)


def test_maxsim_one_shuffle_plan(spark):
    """The maxSim plan is one partial-aggregated exchange on the doc
    key — no join, no window."""
    from auctus_spark.operators.similarity import maxsim_topk
    vecs = spark.createDataFrame(
        [(i % 7, [float(i), 1.0]) for i in range(50)],
        "doc_id long, embedding array<double>")
    plan = maxsim_topk(vecs, [[1.0, 0.0], [0.0, 1.0]], k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Window" not in plan


def test_binary_rescore_matches_exact(spark, vectors):
    """1-bit sign quantization + exact rescore: on the clustered
    corpus with a generous window the result equals the exact
    brute-force top-k (sign patterns separate the gaussian clusters,
    the rescore is exact float cosine)."""
    from auctus_spark.operators.similarity import binary_topk_rescore
    rows, mat = vectors
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = mat[7]
    got = binary_topk_rescore(
        emb.filter("vec_id <> 7"), q.tolist(), k=10, window=150)
    ids = [r["vec_id"] for r in got.collect()]
    mask = np.arange(len(mat)) != 7
    qn = q / np.linalg.norm(q)
    sims = (mat[mask] @ qn) / np.linalg.norm(mat[mask], axis=1)
    keep = np.arange(len(mat))[mask]
    order = np.lexsort((keep, -np.round(sims, 6)))
    assert ids == [int(keep[i]) for i in order[:10]]


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_quantized_rescore_exhaustive_window_equivalence(spark, seed):
    """Property: with window >= corpus size BOTH quantized tiers are
    EXACTLY the brute-force rounded cosine top-k on any corpus — the
    candidate phase can only reorder, never drop, when nothing is
    cut."""
    from auctus_spark.operators.similarity import (
        binary_topk_rescore, quantized_topk_rescore)
    rng = np.random.Generator(np.random.PCG64(seed))
    mat = rng.normal(size=(60, 12))
    emb = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<double>")
    q = rng.normal(size=12)
    qn = q / np.linalg.norm(q)
    sims = (mat @ qn) / np.linalg.norm(mat, axis=1)
    order = np.lexsort((np.arange(60), -np.round(sims, 6)))
    want = [int(i) for i in order[:8]]
    for fn in (quantized_topk_rescore, binary_topk_rescore):
        got = [r["vec_id"] for r in
               fn(emb, q.tolist(), k=8, window=60).collect()]
        assert got == want, fn.__name__
