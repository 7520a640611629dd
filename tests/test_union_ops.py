"""Union operators vs the reference's golden values
(tests/test_search.py:350-370) and union-execution semantics
(augmentation.py:627-764)."""

import pandas as pd
import pytest

from auctus_spark.operators.union_ops import (
    greedy_best_pairs,
    interleave_results,
    name_similarity,
    name_similarity_df,
    union_execute,
    union_score,
)


def test_name_similarity_golden():
    # golden values from reference tests/test_search.py:350-370
    assert round(name_similarity("temperature", "temperature"), 2) == 1.00
    assert round(name_similarity("fridge temperature", "temperature"), 2) == 0.56
    assert round(name_similarity("avg temperature", "temperature avg"), 3) == 0.625
    assert round(name_similarity("temperature", "temperament"), 2) == 0.38
    # short-string path (<3 chars → whole string is the gram)
    assert name_similarity("ab", "ab") == 1.0
    assert name_similarity("ab", "cd") == 0.0


def test_name_similarity_df_matches_python(spark):
    pairs = [("temperature", "temperature"),
             ("fridge temperature", "temperature"),
             ("avg temperature", "temperature avg"),
             ("temperature", "temperament"),
             ("ab", "ab"), ("ab", "cd"), ("abc", "ab")]
    df = spark.createDataFrame(pairs, "left_name string, right_name string")
    got = {(r.left_name, r.right_name): r.similarity
           for r in name_similarity_df(df).collect()}
    for l_, r_ in pairs:
        assert got[(l_, r_)] == pytest.approx(name_similarity(l_, r_))


def test_greedy_best_pairs():
    sims = pd.DataFrame({
        "left_name": ["a", "a", "b", "b"],
        "right_name": ["x", "y", "x", "y"],
        "similarity": [0.9, 0.8, 0.85, 0.1]})
    # a-x (0.9) taken, b-x blocked, a-y blocked, b-y (0.1) taken
    assert greedy_best_pairs(sims) == [("a", "x", 0.9), ("b", "y", 0.1)]


def test_union_score():
    # (sum sims / n_left_cols) * es_score — union.py:190-198
    assert union_score([0.9, 0.5], 4, 2.0) == pytest.approx(0.7)


def test_union_execute(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "d3mIndex long, k string, v double")
    right = spark.createDataFrame([("c",), ("d",)], "kk string")
    out = union_execute(left, right, column_mapping={"kk": "k"})
    rows = out.orderBy("d3mIndex").collect()
    assert [r.k for r in rows] == ["a", "b", "c", "d"]
    assert [r.d3mIndex for r in rows] == [0, 1, 2, 3]
    assert rows[2].v is None  # missing column null-filled


def test_interleave(spark):
    df = spark.createDataFrame(
        [("join", 0.9, "j1"), ("join", 0.7, "j2"), ("union", 0.8, "u1"),
         ("union", 0.2, "u2"), ("join", 0.1, "j3")],
        "kind string, score double, id string")
    got = [r.id for r in interleave_results(df, k=4).collect()]
    # rank1: j1,u1 then rank2: j2,u2 (kind asc within rank)
    assert got == ["j1", "u1", "j2", "u2"]
