"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane-LSH
bucketed search as the scale path (probe the query's bucket plus
hamming-adjacent buckets — an IVF-style candidate cut that turns a full
scan into a partition-pruned scan).  Vector math is either JVM-side
(``zip_with``/``aggregate``) for one query vector, or numpy matmul in a
vectorized pandas UDF for batched queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.
    The query is a literal array → no join, no shuffle except the final
    TakeOrdered(k).  With ``round_to`` the similarity is rounded BEFORE
    the ordering (ties → id asc), the boundary-membership contract an
    external oracle can reproduce exactly."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("v"))
    sim = _dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (e.select(id_col, sim.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))


def cosine_topk_batch(emb: DataFrame, queries: DataFrame, k: int = 10,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      q_vec_col: str = "embedding", q_id_col: str = "q_id"
                      ) -> DataFrame:
    """Exact top-k for a BATCH of query vectors: broadcast the query
    matrix, one numpy matmul per Arrow batch (Q·Vᵀ), per-partition
    top-k, then global window cut — brute force but fully vectorized
    and embarrassingly parallel."""
    qrows = queries.select(q_id_col, q_vec_col).collect()
    q_ids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[q_vec_col], dtype=np.float64)
                   for r in qrows])
    qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m_n @ qm_n.T  # (batch, nq)
            nq = sims.shape[1]
            kk = min(k, sims.shape[0])
            # per-batch top-k per query (cheap pre-cut before shuffle)
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            out = pd.DataFrame({
                "q_id": np.repeat(q_ids, kk),
                "vec_id": pdf["vid"].to_numpy()[idx.T.ravel()],
                "cos_sim": np.take_along_axis(
                    sims, idx, axis=0).T.ravel()})
            yield out

    e = emb.select(F.col(id_col).alias("vid"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    local = e.mapInPandas(score,
                          schema="q_id long, vec_id long, cos_sim double")
    from pyspark.sql import Window as W
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (local.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


class HyperplaneLSH:
    """IVF/LSH-style index: bucket vectors by sign bits of R·v.

    ``partition_table`` writes the bucketed table partitioned by bucket
    id — at scale a query then reads only its probed buckets (partition
    pruning), the ANN analogue of the posting index's term_bucket
    layout.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 89):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.normal(size=(dim, n_planes))
        self.n_planes = n_planes

    def bucket_udf(self):
        planes = self.planes

        @F.pandas_udf(LongType())
        def bucket(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy())
            bits = (m @ planes) > 0
            return pd.Series(
                bits.dot(1 << np.arange(planes.shape[1])).astype(np.int64))
        return bucket

    def bucketize(self, emb: DataFrame, vec_col: str = "embedding"
                  ) -> DataFrame:
        return emb.withColumn(
            "bucket",
            self.bucket_udf()(F.col(vec_col).cast("array<double>")))

    def probe_buckets(self, query_vec: np.ndarray, n_probe_bits: int = 2
                      ) -> list[int]:
        """Query bucket + all buckets within hamming distance
        ``n_probe_bits`` (multi-probe: flips of the least-confident
        bits first would be better; plain enumeration is fine for
        <=2)."""
        margins = np.asarray(query_vec, dtype=np.float64) @ self.planes
        base = int(((margins > 0) * (1 << np.arange(self.n_planes))).sum())
        out = {base}
        if n_probe_bits >= 1:
            for i in range(self.n_planes):
                out.add(base ^ (1 << i))
        if n_probe_bits >= 2:
            order = np.argsort(np.abs(margins))[:6]
            for i in order:
                for j in order:
                    if i < j:
                        out.add(base ^ (1 << int(i)) ^ (1 << int(j)))
        return sorted(out)

    def search(self, bucketed: DataFrame, query_vec: list[float],
               k: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", n_probe_bits: int = 2) -> DataFrame:
        """ANN top-k: scan only the probed buckets, exact cosine inside."""
        probes = self.probe_buckets(np.asarray(query_vec), n_probe_bits)
        cand = bucketed.filter(F.col("bucket").isin(probes))
        return cosine_topk(cand, query_vec, k, vec_col, id_col)

    def partition_table(self, emb: DataFrame, path: str,
                        vec_col: str = "embedding") -> None:
        """Write the bucketed table hive-partitioned by bucket id —
        the ANN analogue of the posting index's term_bucket layout.
        ``search_partitioned`` then touches only the probed buckets'
        files (partition pruning on the ``bucket`` filter)."""
        (self.bucketize(emb, vec_col)
         .repartition("bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(path))

    def search_partitioned(self, spark, path: str,
                           query_vec: list[float], k: int = 10,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           n_probe_bits: int = 2) -> DataFrame:
        """ANN top-k over a :meth:`partition_table` layout: the bucket
        isin-filter folds into partition pruning, so only probed
        partitions are read."""
        return self.search(spark.read.parquet(path), query_vec, k,
                           vec_col, id_col, n_probe_bits)


def planted_embeddings(ids: DataFrame, dim: int = 16,
                       n_clusters: int = 16, id_col: str = "vec_id"
                       ) -> DataFrame:
    """Deterministic clustered corpus, closed-form in the id so an
    external SQL oracle can rebuild it:
    ``v[d] = 1[d == id % n_clusters] + ((id*31 + d*17) % 97 − 48)/480``
    — one-hot cluster centers plus a small arithmetic perturbation.
    JVM-side (transform over sequence), no UDF."""
    i = F.col(id_col)
    return ids.select(
        id_col,
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda dd: (F.when(dd == i % n_clusters, F.lit(1.0))
                                .otherwise(F.lit(0.0))
                                + ((i * 31 + dd * 17) % 97 - 48)
                                / F.lit(480.0))).alias("embedding"))


class IVFKMeans:
    """IVF with a seeded KMeans coarse quantizer — the second ANN
    option next to :class:`HyperplaneLSH`, same partitioned-table
    layout: train centroids on a deterministic sample (driver-side,
    sample-capped like the profiling sketches), assign each vector to
    its max-cosine centroid in a vectorized pandas UDF, write
    hive-partitioned by ``list_id``; a query probes only its
    ``nprobe`` nearest lists (partition pruning at scale).

    Deterministic end-to-end: the init is farthest-point (maxmin)
    from the first sample vector — no RNG — and Lloyd iterations are
    fixed-count, so the same input always yields the same centroids.
    """

    def __init__(self, n_lists: int = 16, n_iter: int = 10,
                 sample_cap: int = 4096):
        self.n_lists = n_lists
        self.n_iter = n_iter
        self.sample_cap = sample_cap
        self.centroids: np.ndarray | None = None

    def fit(self, emb: DataFrame, vec_col: str = "embedding",
            id_col: str = "vec_id") -> "IVFKMeans":
        rows = (emb.select(id_col, F.col(vec_col)
                           .cast("array<double>").alias("v"))
                .orderBy(id_col).limit(self.sample_cap).collect())
        m = np.stack([np.asarray(r["v"], dtype=np.float64)
                      for r in rows])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        seeds = [0]
        mind = 1.0 - mn @ mn[0]
        for _ in range(self.n_lists - 1):
            nxt = int(np.argmax(mind))
            seeds.append(nxt)
            mind = np.minimum(mind, 1.0 - mn @ mn[nxt])
        c = mn[seeds].copy()
        for _ in range(self.n_iter):
            a = (mn @ c.T).argmax(axis=1)
            c = np.vstack([mn[a == j].mean(axis=0) if (a == j).any()
                           else c[j] for j in range(self.n_lists)])
            c = c / np.linalg.norm(c, axis=1, keepdims=True)
        self.centroids = c
        return self

    def assign(self, emb: DataFrame, vec_col: str = "embedding"
               ) -> DataFrame:
        cents = self.centroids

        @F.pandas_udf(LongType())
        def list_of(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            return pd.Series((m @ cents.T).argmax(axis=1)
                             .astype(np.int64))
        return emb.withColumn(
            "list_id", list_of(F.col(vec_col).cast("array<double>")))

    def probe_lists(self, query_vec: np.ndarray, nprobe: int = 2
                    ) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        order = np.argsort(-(self.centroids @ q), kind="stable")
        return [int(x) for x in order[:nprobe]]

    def search(self, assigned: DataFrame, query_vec: list[float],
               k: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", nprobe: int = 2) -> DataFrame:
        """ANN top-k: exact cosine inside the probed lists only."""
        probes = self.probe_lists(np.asarray(query_vec), nprobe)
        cand = assigned.filter(F.col("list_id").isin(probes))
        return cosine_topk(cand, query_vec, k, vec_col, id_col)

    def partition_table(self, emb: DataFrame, path: str,
                        vec_col: str = "embedding") -> None:
        (self.assign(emb, vec_col)
         .repartition("list_id")
         .write.mode("overwrite").partitionBy("list_id").parquet(path))

    def search_partitioned(self, spark, path: str,
                           query_vec: list[float], k: int = 10,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           nprobe: int = 2) -> DataFrame:
        """The list_id isin-filter folds into partition pruning: only
        the probed lists' files are read."""
        return self.search(spark.read.parquet(path), query_vec, k,
                           vec_col, id_col, nprobe)


def ann_recall(exact: list[int], approx: list[int]) -> float:
    return len(set(exact) & set(approx)) / max(len(exact), 1)


def cosine_topk_filtered(emb: DataFrame, query_vec: list[float],
                         predicate, k: int = 10,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """ES kNN-with-filter semantics: the filter applies BEFORE the
    neighbor search, so the result is the exact top-k of the FILTERED
    set (k survivors guaranteed when the set has k rows — unlike
    post-filtering a global top-k, which can return fewer).  Exact
    brute-force form; the IVF/LSH paths pre-filter the same way
    because the predicate pushes below their bucket pruning.

    The filter is a sargable Column predicate evaluated at the scan
    (partition/row-group pruning applies when the filter column is a
    partition or sorted column); the cosine arithmetic only runs on
    survivors.  Reference: ES knn-search filtered-knn."""
    return cosine_topk(emb.filter(predicate), query_vec, k=k,
                       vec_col=vec_col, id_col=id_col)


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame,
             id_col: str = "doc_id", score_col: str = "score",
             rank_constant: int = 60, k: int = 10) -> DataFrame:
    """ES RRF retriever (reciprocal rank fusion): fuse two ranked
    retriever outputs —

        rrf(d) = Σᵢ 1 / (rank_constant + rankᵢ(d))

    with rankᵢ 1-based within retriever i and a document absent from
    a retriever contributing exactly 0 from it (ES
    rrf-retriever semantics, default rank_constant 60).  Returns
    top-``k`` by (rrf_score desc, id asc) — ES breaks rrf ties by
    per-retriever relative score; id asc here, deterministic,
    documented divergence.

    Inputs are already-cut retriever windows (≤ rank_window_size
    rows each, e.g. a BM25 top-k and a kNN top-k), so the unkeyed
    rank windows and the full-outer join touch only those tiny
    frames — the corpus-scale work happened inside each retriever.
    Rank within each window orders by (score desc, id asc); feed
    ROUNDED scores when an external oracle must agree on rank ties.
    """
    from pyspark.sql import Window
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    ra = ranked_a.select(F.col(id_col),
                         F.row_number().over(w).alias("_rank_a"))
    rb = ranked_b.select(F.col(id_col),
                         F.row_number().over(w).alias("_rank_b"))
    j = ra.join(rb, id_col, "full_outer")
    c = float(rank_constant)
    score = (F.coalesce(1.0 / (F.lit(c) + F.col("_rank_a")), F.lit(0.0))
             + F.coalesce(1.0 / (F.lit(c) + F.col("_rank_b")),
                          F.lit(0.0)))
    return (j.select(id_col, score.alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc(id_col))
            .limit(k))


def scalar_quantization_bounds(emb: DataFrame,
                               vec_col: str = "embedding"
                               ) -> tuple[float, float]:
    """Global component min/max over an embedding column — the
    quantization calibration statistic, ONE partial-agg scan
    (``array_min``/``array_max`` per row JVM-side, then a min/max
    reduce; no shuffle of vectors).  Lucene's int8 scalar quantizer
    calibrates per segment with a confidence interval; a global
    exact [min, max] is the deterministic analog (documented
    divergence — no quantile clipping, so the mapping is a pure
    function of the corpus and an external oracle can replay it)."""
    row = emb.select(
        F.min(F.array_min(vec_col)).alias("mn"),
        F.max(F.array_max(vec_col)).alias("mx")).collect()[0]
    return float(row["mn"]), float(row["mx"])


def quantize_vec_expr(col, mn: float, mx: float):
    """uint8 scalar quantization of an ``array<double>`` column:
    q = floor((x − mn) · 255/(mx − mn) + 0.5) clamped to [0, 255]
    (explicit floor(+0.5) so Spark and any external SQL engine round
    identically — no banker's-rounding ambiguity).  JVM-side
    ``transform``; emitted as ``array<long>`` of small ints (the
    on-disk codec stores them as 1 byte each)."""
    scale = 255.0 / (mx - mn)
    return F.transform(
        col, lambda x: F.least(
            F.lit(255.0),
            F.greatest(F.lit(0.0),
                       F.floor((x - F.lit(mn)) * F.lit(scale)
                               + F.lit(0.5)))).cast("long"))


def quantize_query(query_vec: list[float],
                   bounds: tuple[float, float] = (-1.0, 1.0)
                   ) -> tuple[list[float], list[int]]:
    """Normalize a query vector to unit length (plain left-to-right
    double accumulation — the same fold order as the JVM side) and
    quantize it with :func:`quantize_vec_expr`'s exact mapping.
    Returns ``(normalized_floats, quantized_ints)``."""
    mn, mx = bounds
    scale = 255.0 / (mx - mn)
    s = 0.0
    for x in query_vec:
        s += float(x) * float(x)
    nrm = float(np.sqrt(s))
    qn = [float(x) / nrm for x in query_vec]
    qq = [int(min(255.0, max(0.0, float(np.floor((v - mn) * scale
                                                 + 0.5)))))
          for v in qn]
    return qn, qq


def quantized_topk_rescore(emb: DataFrame, query_vec: list[float],
                           k: int = 10, window: int = 50,
                           bounds: tuple[float, float] = (-1.0, 1.0),
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """ES 8.x int8-quantized kNN with exact rescore (the
    ``int8_flat`` / ``rescore_vector.oversample`` contract): unit-
    normalize each vector (Lucene's index-time step for cosine
    similarity — cosine of originals == dot of normalized), quantize
    the normalized components to uint8 on fixed [-1, 1] calibration
    bounds, rank ALL vectors by the affine-corrected integer dot

        appx = Δ²·qdot + mn·Δ·(Σq_doc + Σq_query) + d·mn²
        (Δ = (mx−mn)/255 — the exact reconstruction of the unit dot
         up to per-component rounding error; Lucene stores the same
         correction constants beside its int8 vectors)

    keep a ``window`` (= k · oversample) candidate set, then
    re-score ONLY those candidates with the exact float cosine and
    return the top-``k``.

    Scale story: the quantized phase reads 1 byte/component instead
    of 4 (4× less scan I/O at 100 TB), its dot is exact integer
    whole-stage-codegen arithmetic, and the float math — the
    expensive part — runs on ``window`` rows, not the corpus.  Both
    phases are one scan + TakeOrdered (no shuffle of vectors).

    Determinism contract: fixed calibration bounds make quantization
    a PURE function (no corpus-stat scan, no data-dependent
    calibration — documented divergence from Lucene's confidence-
    interval calibration), floor(+0.5) avoids banker's-rounding
    ambiguity, both phases tie-break by id asc, and the final order
    is on the 6-dp-rounded cosine — so an external SQL oracle can
    replay the whole pipeline."""
    mn, mx = bounds
    delta = (mx - mn) / 255.0
    qn, qq = quantize_query(query_vec, bounds)
    d = len(query_vec)
    sum_qq = sum(qq)
    qq_int = F.array(*[F.lit(v) for v in qq])
    e = emb.select(id_col, F.col(vec_col).cast("array<double>")
                   .alias(vec_col))
    e = e.withColumn("_nrm", _norm(F.col(vec_col)))
    e = e.withColumn("_nv", F.transform(
        F.col(vec_col), lambda x: x / F.col("_nrm")))
    dq = e.withColumn("_qv", quantize_vec_expr(F.col("_nv"), mn, mx))
    qdot = F.aggregate(F.zip_with("_qv", qq_int, lambda a, b: a * b),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)
    sum_qd = F.aggregate("_qv", F.lit(0).cast("long"),
                         lambda acc, x: acc + x)
    appx = (F.lit(delta * delta) * qdot.cast("double")
            + F.lit(mn * delta)
            * (sum_qd.cast("double") + F.lit(float(sum_qq)))
            + F.lit(float(d) * mn * mn))
    cand = (dq.select(id_col, vec_col, appx.alias("_appx"))
            .orderBy(F.desc("_appx"), F.asc(id_col)).limit(window))
    qv = F.array(*[F.lit(float(x)) for x in qn])
    cos = _dot(F.col(vec_col), qv) / (_norm(F.col(vec_col))
                                      * _norm(qv))
    return (cand.select(id_col, F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))


def linear_fuse(ranked_a: DataFrame, ranked_b: DataFrame,
                weight_a: float = 1.0, weight_b: float = 1.0,
                id_col: str = "doc_id", score_col: str = "score",
                k: int = 10) -> DataFrame:
    """ES linear retriever (8.16+) with the ``minmax`` normalizer:
    each retriever's window is min-max normalized —
    norm(s) = (s − min)/(max − min) over the rows THAT retriever
    returned (1.0 for every row when max == min, so a constant-score
    window contributes its full weight; documented choice) — and the
    fused score is Σᵢ wᵢ · normᵢ(d), a document absent from a
    retriever contributing 0 from it.  Top-``k`` by (score desc,
    id asc), deterministic.

    Like :func:`rrf_fuse`, the inputs are already-cut retriever
    windows, so the normalization (a tiny unkeyed min/max) and the
    full-outer join touch only window-sized frames."""
    from pyspark.sql import Window
    wall = Window.partitionBy()

    def norm(df: DataFrame, out: str) -> DataFrame:
        mn = F.min(score_col).over(wall)
        mx = F.max(score_col).over(wall)
        n = F.when(mx == mn, F.lit(1.0)).otherwise(
            (F.col(score_col) - mn) / (mx - mn))
        return df.select(F.col(id_col), n.alias(out))

    j = norm(ranked_a, "_na").join(norm(ranked_b, "_nb"),
                                   id_col, "full_outer")
    score = (F.coalesce(F.col("_na"), F.lit(0.0)) * F.lit(float(weight_a))
             + F.coalesce(F.col("_nb"), F.lit(0.0))
             * F.lit(float(weight_b)))
    return (j.select(id_col, F.round(score, 6).alias("linear_score"))
            .orderBy(F.desc("linear_score"), F.asc(id_col))
            .limit(k))


def maxsim_topk(vecs: DataFrame, query_vecs: list[list[float]],
                k: int = 10, doc_col: str = "doc_id",
                vec_col: str = "embedding") -> DataFrame:
    """Late-interaction maxSim scoring over multi-vector documents
    (ES 8.x ``rank_vectors`` / the ColBERT retrieval pattern): a doc
    is a BAG of vectors (one row per vector in ``vecs``), and

        score(doc) = Σ_{q ∈ query_vecs} max_{d ∈ doc} (q · d)

    Top-``k`` by (round(score, 6) desc, doc id asc).

    Plan: per (row, query-vector) dots are JVM ``zip_with`` /
    ``aggregate`` expressions evaluated in ONE scan — the per-query
    max and the final sum are a single partial-aggregated shuffle on
    the doc key (max and sum both combine map-side), so the corpus-
    scale exchange carries one row per doc, not per vector.  No
    cross join, no window."""
    if not query_vecs:
        raise ValueError("maxsim_topk needs at least one query vector")
    maxes = []
    for i, q in enumerate(query_vecs):
        qv = F.array(*[F.lit(float(x)) for x in q])
        dot = _dot(F.col(vec_col), qv)
        maxes.append(F.max(dot).alias(f"_m{i}"))
    agg = vecs.groupBy(doc_col).agg(*maxes)
    score = F.col("_m0")
    for i in range(1, len(query_vecs)):
        score = score + F.col(f"_m{i}")
    return (agg.select(doc_col, F.round(score, 6).alias("maxsim"))
            .orderBy(F.desc("maxsim"), F.asc(doc_col)).limit(k))


def binary_topk_rescore(emb: DataFrame, query_vec: list[float],
                        k: int = 10, window: int = 50,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """ES 8.x ``bit`` dense_vector / BBQ-style binary quantization
    with exact rescore — the 1-bit tier below
    :func:`quantized_topk_rescore`'s int8: each component quantizes
    to its SIGN bit (sign is norm-invariant, so no normalization pass
    is even needed), candidates rank by hamming distance to the
    query's bit pattern (asc, id asc ties), and the ``window``
    survivors rescore with the exact float cosine.

    Scale story: 1 bit/component = 32× less scan I/O than float32,
    and hamming is pure integer whole-stage-codegen arithmetic (the
    on-disk codec packs 64 components per long and the distance is
    popcount(xor) — the expression here is the unpacked equivalent).
    Quantization is parameter-free (sign), so the whole pipeline is a
    pure function an external SQL oracle replays exactly."""
    qb = [1 if float(x) >= 0.0 else 0 for x in query_vec]
    qb_lit = F.array(*[F.lit(v) for v in qb])
    e = emb.select(id_col, F.col(vec_col).cast("array<double>")
                   .alias(vec_col))
    bits = F.transform(F.col(vec_col),
                       lambda x: F.when(x >= 0.0, F.lit(1))
                       .otherwise(F.lit(0)))
    hamming = F.aggregate(
        F.zip_with(bits, qb_lit, lambda a, b: F.abs(a - b)),
        F.lit(0), lambda acc, x: acc + x)
    cand = (e.select(id_col, vec_col, hamming.alias("_hd"))
            .orderBy(F.asc("_hd"), F.asc(id_col)).limit(window))
    qn, _ = quantize_query(query_vec)
    qv = F.array(*[F.lit(float(x)) for x in qn])
    cos = _dot(F.col(vec_col), qv) / (_norm(F.col(vec_col))
                                      * _norm(qv))
    return (cand.select(id_col, F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))
