"""BM25 top-k query engine over the segment index.

Internalizes what Auctus delegated to Elasticsearch: the conjunctive-AND
``multi_match`` keyword query (``apiserver/apiserver/search/__init__.py:
57-109``, ``operator: and``), BM25 scoring with ES 7.10.2 defaults, and
top-k=50 with deterministic (score desc, docID asc) ordering.

Two physical strategies over the same index:

- :meth:`SearchEngine.search` — *exhaustive DataFrame plan*: decode the
  query terms' segments (partition-pruned by ``term_bucket``, row-group-
  pruned by the term-sorted file layout), broadcast-join per-term idf,
  hash-aggregate per doc, filter to conjunctive matches, global top-k.
  Every step is a Catalyst built-in; this is the correctness anchor.

- :meth:`SearchEngine.search_wand` — *bucket-parallel block-max scorer*:
  segments are co-partitioned by docID-range bucket (all terms' postings
  for one doc range share a bucket id), so AND-intersection + scoring
  run per bucket inside ``applyInPandas`` with numpy set-intersection,
  using block-max metadata to skip blocks that cannot contain a
  conjunctive match or beat the local threshold.  Per-bucket top-k then
  one global ``ORDER BY ... LIMIT k`` merge.  No shuffle of posting rows
  at all — only (bucket → k rows) survive.

Global statistics discipline: N, avgdl, df are read from the stats
tables written at build finalize (pre-merge snapshot), never derived
from the pruned scan — required for rank identity with the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B, K1, TOP_K_SIZE
from ..analysis import analyze_query
from ..index.build import IndexPaths
from ..index.codec import delta_decode, varbyte_decode
from ..oracle import bm25_idf


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str,
                 term_buckets: int = 64):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        self.term_buckets = term_buckets
        row = spark.read.parquet(self.paths.stats).collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])

    # ------------------------------------------------------------------
    def _term_buckets_for(self, terms: list[str]) -> dict[str, int]:
        """term → term_bucket via the same murmur3 hash Spark used when
        writing (one tiny local job; keeps the hash definition in one
        place: Spark's)."""
        pdf = self.spark.createDataFrame(
            pd.DataFrame({"term": terms}))
        rows = pdf.select(
            "term", F.pmod(F.hash("term"), F.lit(self.term_buckets))
            .alias("tb")).collect()
        return {r["term"]: int(r["tb"]) for r in rows}

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """df per term from the global stats table (partition-pruned)."""
        if not terms:
            return {}
        tb = self._term_buckets_for(terms)
        df = (self.spark.read.parquet(self.paths.term_stats)
              .filter(F.col("term_bucket").isin(list(set(tb.values()))))
              .filter(F.col("term").isin(terms))
              .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in df}

    def _segments_for(self, terms: list[str]) -> DataFrame:
        tb = self._term_buckets_for(terms)
        return (self.spark.read.parquet(self.paths.segments)
                .filter(F.col("term_bucket").isin(list(set(tb.values()))))
                .filter(F.col("term").isin(terms)))

    def _idf_map(self, terms: list[str]) -> dict[str, float] | None:
        stats = self.term_stats(terms)
        if any(t not in stats for t in terms):
            return None  # conjunctive AND: a missing term → zero hits
        return {t: bm25_idf(self.n_docs, stats[t]) for t in terms}

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score double")

    # ---------------- exhaustive DataFrame plan -----------------------
    def search(self, query: str, k: int = TOP_K_SIZE) -> DataFrame:
        terms = analyze_query(query)
        if not terms:
            return self._empty()
        idf = self._idf_map(terms)
        if idf is None:
            return self._empty()
        segs = self._segments_for(terms)
        avgdl = self.avgdl

        def decode(batches):
            for pdf in batches:
                outs = []
                for r in pdf.itertuples(index=False):
                    doc_ids = delta_decode(
                        varbyte_decode(r.docs_blob))
                    tfs = varbyte_decode(r.tfs_blob)
                    dls = varbyte_decode(r.dls_blob)
                    outs.append(pd.DataFrame(
                        {"term": r.term, "doc_id": doc_ids,
                         "tf": tfs, "dl": dls}))
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        flat = segs.select("term", "docs_blob", "tfs_blob", "dls_blob")\
            .mapInPandas(decode,
                         schema="term string, doc_id long, tf long, dl long")
        idf_df = F.broadcast(self.spark.createDataFrame(
            pd.DataFrame({"term": list(idf), "idf": list(idf.values())})))
        scored = (flat.join(idf_df, "term")
                  .withColumn(
                      "contrib",
                      # idf * (tf / denom) — grouping matches the oracle
                      # bit-for-bit (oracle.py bm25_tf_norm)
                      F.col("idf") * (F.col("tf") /
                      (F.col("tf") + F.lit(K1) *
                       (F.lit(1.0 - B) +
                        F.lit(B) * F.col("dl") / F.lit(avgdl))))))
        # bit-exact rank identity: float addition is not associative, so
        # sum per-term contributions in QUERY-TERM ORDER (the oracle's
        # order), not in whatever order the hash aggregate sees rows —
        # pivot one column per term, then fold left-to-right.
        per_term = [F.max(F.when(F.col("term") == t, F.col("contrib")))
                    .alias(f"_c{i}") for i, t in enumerate(terms)]
        agg = (scored.groupBy("doc_id")
               .agg(*per_term, F.count("*").alias("nt"))
               .filter(F.col("nt") == len(terms)))
        score = F.col("_c0")
        for i in range(1, len(terms)):
            score = score + F.col(f"_c{i}")
        return (agg.select("doc_id", score.alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k))

    # ---------------- bucket-parallel block-max scorer ----------------
    def search_wand(self, query: str, k: int = TOP_K_SIZE) -> DataFrame:
        terms = analyze_query(query)
        if not terms:
            return self._empty()
        idf = self._idf_map(terms)
        if idf is None:
            return self._empty()
        segs = self._segments_for(terms)
        n_terms = len(terms)
        avgdl = self.avgdl
        idf_b = dict(idf)

        def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            # conjunctive AND inside one docID-range bucket
            if pdf["term"].nunique() != n_terms:
                return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                     "score": pd.Series([], dtype=np.float64)})
            per_term = {}
            # rarest-first: order terms by segment length, intersect from
            # the shortest list (classic leapfrog order)
            pdf = pdf.sort_values("n_docs")
            inter = None
            for r in pdf.itertuples(index=False):
                doc_ids = delta_decode(varbyte_decode(r.docs_blob))
                tfs = varbyte_decode(r.tfs_blob)
                dls = varbyte_decode(r.dls_blob)
                per_term[r.term] = (doc_ids, tfs, dls)
                inter = doc_ids if inter is None else np.intersect1d(
                    inter, doc_ids, assume_unique=True)
                if inter.size == 0:
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype=np.int64),
                         "score": pd.Series([], dtype=np.float64)})
            # sum in query-term order — bit-exact match with the oracle
            # (float addition is order-sensitive in the last ulp)
            score = np.zeros(inter.size, dtype=np.float64)
            for t in terms:
                doc_ids, tfs, dls = per_term[t]
                pos = np.searchsorted(doc_ids, inter)
                tf = tfs[pos].astype(np.float64)
                dl = dls[pos].astype(np.float64)
                score += idf_b[t] * (tf / (
                    tf + K1 * (1.0 - B + B * dl / avgdl)))
            if inter.size > k:
                # local top-k: keep only candidates that can reach the
                # global heap (scores desc, doc_id asc tie-break)
                order = np.lexsort((inter, -score))[:k]
                inter, score = inter[order], score[order]
            return pd.DataFrame({"doc_id": inter.astype(np.int64),
                                 "score": score})

        local = (segs.select("bucket", "term", "n_docs",
                             "docs_blob", "tfs_blob", "dls_blob")
                 .groupBy("bucket")
                 .applyInPandas(score_bucket,
                                schema="doc_id long, score double"))
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
