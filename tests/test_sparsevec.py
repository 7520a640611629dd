"""Sparse-vector (ELSER-style weighted-terms) retrieval semantics."""

import math

import pytest

from auctus_spark.operators import sparsevec as SV


@pytest.fixture(scope="module")
def feats(spark):
    docs = spark.createDataFrame(
        [(1, "data data join"), (2, "join vector"),
         (3, "scan filter"), (4, "data")],
        "doc_id bigint, text string")
    return SV.sparse_features(docs).cache()


def test_sparse_features_weights(feats):
    m = {r.doc_id: r.features for r in feats.collect()}
    assert m[1]["data"] == pytest.approx(1.0 + math.log(2.0))
    assert m[1]["join"] == 1.0
    assert set(m[2]) == {"join", "vector"}
    assert m[4]["data"] == 1.0


def test_sparse_vector_topk_scores_and_exclusion(feats):
    out = SV.sparse_vector_topk(
        feats, {"data": 2.0, "vector": 0.5}, k=10).collect()
    # doc 3 matches no query term -> excluded (ES contract)
    got = [(r.doc_id, r.score) for r in out]
    w1 = round((1.0 + math.log(2.0)) * 2.0, 6)
    assert got == [(1, w1), (4, 2.0), (2, 0.5)]


def test_sparse_vector_topk_order_ties_and_k(feats):
    # identical scores tie-break by doc_id asc; k cuts
    out = SV.sparse_vector_topk(feats, {"join": 1.0}, k=1).collect()
    assert [(r.doc_id, r.score) for r in out] == [(1, 1.0)]


def test_sparse_vector_requires_weights(feats):
    with pytest.raises(ValueError):
        SV.sparse_vector_topk(feats, {})


def test_query_is_scan_only(feats):
    df = feats.localCheckpoint()
    plan = SV.sparse_vector_topk(df, {"data": 1.0}, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
