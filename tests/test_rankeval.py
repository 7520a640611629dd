"""ES _rank_eval metric definitions pinned on closed-form fixtures."""

import math

import pytest

from auctus_spark.operators.rankeval import rank_eval


def test_rank_eval_closed_form(spark):
    """5 retrieved docs, graded ratings — precision/recall/MRR/nDCG
    recomputed by hand."""
    results = spark.createDataFrame(
        [("q", 10 + r, r) for r in range(1, 6)],
        "query_id string, doc_id long, rank long")
    # rated: rank2 -> 3, rank4 -> 1, plus an UNRETRIEVED doc rated 2
    ratings = spark.createDataFrame(
        [("q", 12, 3), ("q", 14, 1), ("q", 99, 2)],
        "query_id string, doc_id long, rating int")
    row = rank_eval(results, ratings, k=5).collect()[0]
    assert row["precision"] == pytest.approx(2 / 5)
    assert row["recall"] == pytest.approx(2 / 3)
    assert row["reciprocal_rank"] == pytest.approx(1 / 2)
    dcg = ((2 ** 3 - 1) / math.log2(3) + (2 ** 1 - 1) / math.log2(5))
    idcg = ((2 ** 3 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(3)
            + (2 ** 1 - 1) / math.log2(4))
    assert row["ndcg"] == pytest.approx(round(dcg / idcg, 6))


def test_rank_eval_no_relevant_and_threshold(spark):
    """A query with zero relevant docs gets recall/MRR/nDCG 0 (not
    null); relevant_threshold reclassifies low grades."""
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)],
        "query_id string, doc_id long, rank long")
    empty = spark.createDataFrame(
        [], "query_id string, doc_id long, rating int")
    row = rank_eval(results, empty, k=5).collect()[0]
    assert (row["precision"], row["recall"],
            row["reciprocal_rank"], row["ndcg"]) == (0.0, 0.0, 0.0, 0.0)
    low = spark.createDataFrame(
        [("q", 1, 1)], "query_id string, doc_id long, rating int")
    strict = rank_eval(results, low, k=5,
                       relevant_threshold=2).collect()[0]
    assert strict["precision"] == 0.0
    assert strict["reciprocal_rank"] == 0.0
    # but the grade still contributes gain to DCG (ES dcg is
    # threshold-free) — ndcg stays 1.0 here (result order == ideal)
    assert strict["ndcg"] == pytest.approx(1.0)
