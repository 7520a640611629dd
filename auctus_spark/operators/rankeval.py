"""Ranking evaluation — the ES Ranking Evaluation API (``_rank_eval``)
as a DataFrame operator.

Given per-query ranked results and graded relevance ratings, computes
per query the four ES metrics: precision@k, recall@k, reciprocal rank,
and nDCG@k (ES ``dcg`` metric: gain (2^rating − 1)/log2(rank + 1),
ideal DCG from the best-possible ordering of the rated set).  Offline
search-quality evaluation is the canonical batch companion of the
batched query engine: score a query set once, join against a judgment
table, aggregate — all expression-level, one shuffle per agg key.

Reference behavior: ES search-rank-eval API (precision, recall,
mean_reciprocal_rank, dcg/ndcg metric definitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_eval(results: DataFrame, ratings: DataFrame, k: int = 10,
              relevant_threshold: int = 1,
              query_col: str = "query_id", doc_col: str = "doc_id",
              rank_col: str = "rank",
              rating_col: str = "rating") -> DataFrame:
    """Per-query ranking metrics.

    ``results``: (query, doc, rank) with rank 1-based within query.
    ``ratings``: (query, doc, integer rating); docs absent from
    ``ratings`` count as rating 0 (ES's unrated-docs-are-irrelevant
    default).  Emits one row per query present in ``results``:

    - ``precision`` = relevant_retrieved / retrieved (≤ k rows)
    - ``recall``    = relevant_retrieved / total_relevant (0 when the
      query has no relevant docs at all)
    - ``reciprocal_rank`` = 1/rank of the first relevant hit, else 0
    - ``ndcg`` = DCG@k / ideal-DCG@k (0 when the rated set is empty)

    Plan: the results window (≤ k rows/query) left-joins the ratings
    on (query, doc) — at scale the judgment table is tiny and
    broadcasts — then three partial-aggregated shuffles on the query
    key (metrics, ideal-DCG, total-relevant), each over
    window/judgment-sized frames, never the corpus."""
    from pyspark.sql import Window
    r = results.filter(F.col(rank_col) <= k)
    j = (r.join(F.broadcast(ratings), [query_col, doc_col], "left")
         .withColumn("_rating",
                     F.coalesce(F.col(rating_col), F.lit(0))))
    rel = (F.col("_rating") >= relevant_threshold).cast("int")
    gain = ((F.pow(F.lit(2.0), F.col("_rating")) - 1.0)
            / F.log2(F.col(rank_col) + F.lit(1.0)))
    per = j.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("_retrieved"),
        F.sum(rel).alias("_rel_ret"),
        F.min(F.when(rel == 1, F.col(rank_col))).alias("_first_rel"),
        F.sum(gain).alias("_dcg"))
    iw = Window.partitionBy(query_col).orderBy(
        F.desc(rating_col), F.asc(doc_col))
    ideal = (ratings.withColumn("_ir", F.row_number().over(iw))
             .filter(F.col("_ir") <= k)
             .groupBy(query_col)
             .agg(F.sum((F.pow(F.lit(2.0), F.col(rating_col)) - 1.0)
                        / F.log2(F.col("_ir") + F.lit(1.0)))
                  .alias("_idcg")))
    totals = ratings.groupBy(query_col).agg(
        F.sum((F.col(rating_col) >= relevant_threshold).cast("int"))
        .alias("_total_rel"))
    out = (per.join(ideal, query_col, "left")
           .join(totals, query_col, "left"))
    precision = F.col("_rel_ret") / F.col("_retrieved")
    recall = F.when(F.coalesce(F.col("_total_rel"), F.lit(0)) > 0,
                    F.col("_rel_ret") / F.col("_total_rel")) \
        .otherwise(F.lit(0.0))
    rr = F.coalesce(1.0 / F.col("_first_rel"), F.lit(0.0))
    ndcg = F.when(F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0,
                  F.col("_dcg") / F.col("_idcg")).otherwise(F.lit(0.0))
    return out.select(
        query_col,
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(rr, 6).alias("reciprocal_rank"),
        F.round(ndcg, 6).alias("ndcg"))
