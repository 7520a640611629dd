"""ShingleFilter fast-phrase semantics: closed-form + consistency with
match_phrase doc sets."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.pipeline import _shingles, shingle_phrase_topk


def test_shingle_array_expr(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b", "c"]), (1, ["x"]), (2, [])],
        "doc_id long, l array<string>")
    got = {r["doc_id"]: r["s"]
           for r in df.select("doc_id",
                              _shingles(F.col("l")).alias("s"))
           .collect()}
    assert got == {0: ["a b", "b c"], 1: [], 2: []}


def test_shingle_phrase_scoring_closed_form(spark):
    """tf counts shingle OCCURRENCES (overlapping stream), dl is
    len-1, df/N over all docs; 2-token requirement enforced."""
    import math
    docs = spark.createDataFrame(
        [(0, "hash join hash join"),      # shingles: hj, jh, hj -> tf 2
         (1, "hash join only"),           # tf 1, dl 2
         (2, "no match here at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["score"]
           for r in shingle_phrase_topk(docs, "hash join",
                                        k=10).collect()}
    assert set(out) == {0, 1}
    n, df, avgdl = 3, 2, (3 + 2 + 4) / 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    s0 = idf * (2 / (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl)))
    s1 = idf * (1 / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl)))
    assert out[0] == pytest.approx(s0)
    assert out[1] == pytest.approx(s1)
    with pytest.raises(ValueError, match="two-token"):
        shingle_phrase_topk(docs, "one two three")
    assert shingle_phrase_topk(docs, "zz qq", k=5).count() == 0
