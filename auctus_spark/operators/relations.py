"""Relational document queries: ES parent-child (``has_child`` /
``has_parent``) and ``nested`` field semantics, re-expressed as Spark
joins and higher-order array functions.

ES models one-to-many document relations two ways:

* **join field (parent/child)** — parent and child live as separate
  documents routed to the same shard; ``has_child`` returns parents
  whose children match a query (score_mode none/min/max/sum/avg over
  child scores, min_children/max_children bounds) and ``has_parent``
  returns children whose parent matches.  Spark-first this is just a
  join: the child side is filtered *first* (predicate pushdown), then
  either aggregated per parent key (has_child — the per-key agg is a
  map-side-combinable partial aggregation, so the shuffle moves one
  row per (partition, parent) not one per child) or broadcast-joined
  from the filtered parent side (has_parent — parents are the small
  dimension, ES's routing-colocated lookup becomes a broadcast hash
  join with zero shuffle of the child fact table).
* **nested field** — an array-of-objects column indexed as hidden
  sub-documents so that predicates on multiple sub-fields must match
  within ONE object (vs the flattened "object" mapping where
  ``a=1 AND b=2`` can straddle objects).  Spark's higher-order
  functions express this exactly: ``exists(col, x -> p(x))`` is the
  nested query, ``size(filter(col, ...))`` is inner_hits counting,
  and both run JVM-side inside the scan — no explode, no shuffle,
  no per-row Python.

The auctus reference reaches the same surface through Elasticsearch
(it stores dataset→column docs; see ``lib_index`` mappings); here the
relation machinery is internalized.  At 100 TB the has_child agg is
one shuffle on the parent key (AQE skew-handled), has_parent is
shuffle-free, and nested predicates are pure scan expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "min", "max", "sum", "avg")


def has_child(parents: DataFrame, children: DataFrame,
              parent_key: str, child_key: str,
              child_filter: str, score_col: str | None = None,
              score_mode: str = "none", min_children: int = 1,
              max_children: int | None = None) -> DataFrame:
    """ES ``has_child`` query: parent rows having between
    ``min_children`` and ``max_children`` children that satisfy
    ``child_filter`` (a SQL boolean expression over child columns).

    ``score_mode`` folds the matching children's ``score_col`` into a
    parent ``score`` (ES semantics: ``none`` scores 0).  Returns the
    parent columns plus ``n_matching_children`` and ``score``.

    Plan shape: filtered-child partial agg (count + score fold) →
    one shuffle on ``child_key`` → inner join to parents.  The child
    table is never moved unaggregated.
    """
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if score_mode != "none" and score_col is None:
        raise ValueError("score_col required for scoring score_modes")

    matched = children.where(F.expr(child_filter))
    aggs = [F.count(F.lit(1)).alias("n_matching_children")]
    if score_mode == "none":
        aggs.append(F.lit(0.0).alias("score"))
    else:
        fold = {"min": F.min, "max": F.max, "sum": F.sum,
                "avg": F.avg}[score_mode]
        aggs.append(fold(F.col(score_col).cast("double")).alias("score"))
    per_parent = matched.groupBy(F.col(child_key).alias(parent_key)) \
                        .agg(*aggs)
    per_parent = per_parent.where(
        F.col("n_matching_children") >= F.lit(min_children))
    if max_children is not None:
        per_parent = per_parent.where(
            F.col("n_matching_children") <= F.lit(max_children))
    return parents.join(per_parent, parent_key, "inner")


def has_parent(parents: DataFrame, children: DataFrame,
               parent_key: str, child_key: str,
               parent_filter: str, score_col: str | None = None,
               broadcast_parents: bool = True) -> DataFrame:
    """ES ``has_parent`` query: child rows whose parent satisfies
    ``parent_filter``; with ``score_col`` set, each child inherits its
    parent's score as ``parent_score`` (ES ``score: true``; default
    constant 0 like ES ``score: false``).

    The filtered parent side is broadcast (dimension tables are small
    relative to the child fact table), so the child scan never
    shuffles — the Spark analog of ES's same-shard routing.
    """
    score = (F.col(score_col).cast("double") if score_col
             else F.lit(0.0))
    dim = parents.where(F.expr(parent_filter)).select(
        F.col(parent_key), score.alias("parent_score"))
    if broadcast_parents:
        dim = F.broadcast(dim)
    return children.join(
        dim, children[child_key] == dim[parent_key], "inner") \
        .drop(dim[parent_key])


def nest_children(parents: DataFrame, children: DataFrame,
                  parent_key: str, child_key: str, nested_col: str,
                  fields: list[str]) -> DataFrame:
    """Index-time helper: fold each parent's children into an
    array-of-structs ``nested_col`` (the ES ``nested`` mapping).  One
    shuffle on the parent key — this is the indexing step, paid once.
    Parents with no children get an empty array (ES: a document with
    no nested objects still exists)."""
    packed = children.groupBy(F.col(child_key).alias(parent_key)).agg(
        F.collect_list(F.struct(*[F.col(f) for f in fields]))
        .alias(nested_col))
    out = parents.join(packed, parent_key, "left")
    empty = F.array().cast(
        packed.schema[nested_col].dataType.simpleString())
    return out.withColumn(nested_col,
                          F.coalesce(F.col(nested_col), empty))


def nested_query(df: DataFrame, nested_col: str,
                 predicate: str,
                 inner_hits: bool = False) -> DataFrame:
    """ES ``nested`` query: rows where at least ONE object in
    ``nested_col`` satisfies ``predicate`` (an expression over ``x``,
    e.g. ``"x.status = 'F' AND x.total > 10"``).  This is the nested
    (per-object) semantics — the conjunction holds within a single
    object, which a flattened column mapping cannot express.

    With ``inner_hits`` the count of matching objects is kept as
    ``n_inner_hits`` (ES inner_hits total).  Pure scan expressions —
    ``exists``/``filter`` evaluate JVM-side, no explode, no shuffle.
    """
    match = F.expr(f"exists({nested_col}, x -> {predicate})")
    out = df.where(match)
    if inner_hits:
        out = out.withColumn(
            "n_inner_hits",
            F.expr(f"size(filter({nested_col}, x -> {predicate}))"))
    return out


def nested_agg(df: DataFrame, nested_col: str, group_field: str,
               metric_field: str, parent_id: str) -> DataFrame:
    """ES ``nested`` aggregation with a ``reverse_nested`` leaf:
    explode the nested objects, bucket by ``group_field``, and emit
    per-bucket nested-doc count, metric sum/avg, and the
    reverse_nested parent-document count (distinct parents owning at
    least one object in the bucket).

    One explode + one shuffle on the bucket key; count/sum/avg
    partial-aggregate map-side, the distinct-parent count shuffles
    (parent_id, bucket) pairs — exactly the state ES's reverse_nested
    keeps per bucket.

    The metric sums in decimal(28,6) (exact, order-independent — a
    float sum over millions of rows differs across engines and
    partitionings in the 6th decimal) and the avg derives from that
    exact sum, so results are bit-stable at any parallelism."""
    ex = df.select(parent_id,
                   F.explode(nested_col).alias("_o"))
    dec = F.col(f"_o.{metric_field}").cast("decimal(28,6)")
    out = (ex.groupBy(F.col(f"_o.{group_field}").alias(group_field))
           .agg(F.count(F.lit(1)).alias("doc_count"),
                F.sum(dec).alias("_sum"),
                F.countDistinct(F.col(parent_id))
                .alias("parent_doc_count")))
    return out.select(
        group_field, "doc_count",
        F.col("_sum").cast("double").alias("sum_metric"),
        F.round(F.col("_sum").cast("double") / F.col("doc_count"), 6)
        .alias("avg_metric"),
        "parent_doc_count")


def children_agg(parents: DataFrame, children: DataFrame,
                 parent_key: str, child_key: str,
                 parent_group: str, metric_field: str) -> DataFrame:
    """ES ``children`` aggregation: bucket parents by
    ``parent_group``, then aggregate over each bucket's child
    documents (doc_count = children, plus sum of ``metric_field``).

    Spark shape: broadcast the (parent_key → bucket) projection onto
    the child table — the fact side never shuffles; the per-bucket
    agg partial-aggregates map-side.  The metric sums in
    decimal(28,6) (exact, order-independent across partitionings)."""
    dim = F.broadcast(parents.select(
        F.col(parent_key), F.col(parent_group)))
    joined = children.join(
        dim, children[child_key] == dim[parent_key], "inner")
    return (joined.groupBy(parent_group)
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.sum(F.col(metric_field).cast("decimal(28,6)"))
                 .cast("double").alias("sum_metric")))
