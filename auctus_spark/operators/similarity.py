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
                ) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.
    The query is a literal array → no join, no shuffle except the final
    TakeOrdered(k)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("v"))
    sim = _dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))
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


def ann_recall(exact: list[int], approx: list[int]) -> float:
    return len(set(exact) & set(approx)) / max(len(exact), 1)
