"""ES ``sparse_vector`` / ``rank_features`` field semantics: learned
(or statistically derived) per-document term→weight maps, queried by a
weighted-term dot product — the ELSER-style "semantic text expansion"
retrieval surface.

ES stores model output as a ``sparse_vector`` mapping (term → float
weight, one posting per term under the hood) and the ``sparse_vector``
query scores ``Σ_t q_weight(t) · doc_weight(t)`` over the query's
expanded terms.  Here:

* **index step** (``sparse_features``) — derive the doc-side map.
  The model itself is external (ELSER is a neural encoder); the
  deterministic stand-in is sublinear tf weighting ``1 + ln(tf)``,
  the classic impact weight — the Spark plumbing (schema
  ``map<string,double>``, partial-agg shape) is exactly what a real
  model UDF would feed.  Two map-side-combinable aggregations: tf per
  (doc, term), then the per-doc map fold.
* **query step** (``sparse_vector_topk``) — for the handful of
  expanded query terms, the score is a fixed chain of
  ``coalesce(map[t], 0) · w_t`` JVM expressions over ONE scan — no
  explode, no shuffle, no Python; ``TakeOrderedAndProject`` cuts the
  top-k.  Docs matching no query term never match (ES contract).

At 100-TB scale the map-column layout is the *stored-field* variant;
for hot query serving you would additionally invert it into the
repo's term-partitioned impact index (``index/build.py``) and run the
same block-max machinery BM25 uses — the scoring algebra here is the
contract both layouts share.  Summation is in the query's given term
order (float64 left-to-right), bit-reproducible across partitionings
because each addend is a per-row map lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auctus_spark.analysis import spark_token_runs


def sparse_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    feat_col: str = "features") -> DataFrame:
    """Per-document sparse feature map term → 1 + ln(tf) (sublinear
    impact weight; plug-point for a real expansion model's output)."""
    toks = docs.select(
        id_col,
        F.explode(spark_token_runs(F.lower(F.col(text_col))))
        .alias("term"))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    w = tf.select(
        id_col, "term",
        (F.lit(1.0) + F.log(F.col("tf").cast("double"))).alias("w"))
    return w.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "w"))).alias(feat_col))


def sparse_vector_topk(feat: DataFrame, query_weights: dict[str, float],
                       k: int = 50, id_col: str = "doc_id",
                       feat_col: str = "features",
                       round_to: int = 6) -> DataFrame:
    """ES sparse_vector query: dot product of the query's term weights
    against each doc's feature map, top-k by (score desc, id asc).

    The score expression is built in the dict's given term order and
    sums left-to-right — the cross-engine determinism contract the
    oracle mirrors.  Zero-weight (absent) docs are excluded like ES
    (a doc must match at least one query term to be a hit)."""
    if not query_weights:
        raise ValueError("query_weights must be non-empty")
    score = None
    for t, wq in query_weights.items():
        contrib = (F.coalesce(F.element_at(F.col(feat_col), F.lit(t)),
                              F.lit(0.0)) * F.lit(float(wq)))
        score = contrib if score is None else score + contrib
    out = (feat.select(F.col(id_col), F.round(score, round_to)
                       .alias("score"))
           .where(F.col("score") > 0)
           .orderBy(F.desc("score"), F.asc(id_col))
           .limit(k))
    return out
