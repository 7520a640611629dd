"""Chunking / packing (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.chunking import (chunk_documents,
                                             pack_documents)


def test_chunk_documents_disjoint(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],
        "doc_id long, text string")
    out = {r.chunk_id: r for r in chunk_documents(df, size=4).collect()}
    assert sorted(out) == [0, 1, 2]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[2].chunk_text == "t8 t9"          # partial tail kept
    assert [out[i].n_tokens for i in (0, 1, 2)] == [4, 4, 2]


def test_chunk_documents_overlap(spark):
    """stride < size: windows every stride tokens, each covering
    size tokens; every token appears in ceil(size/stride) interior
    windows; no window starts past the end."""
    toks = [f"t{i}" for i in range(7)]
    df = spark.createDataFrame([(1, " ".join(toks))],
                               "doc_id long, text string")
    out = {r.chunk_id: r.chunk_text
           for r in chunk_documents(df, size=4, stride=2).collect()}
    assert out == {0: "t0 t1 t2 t3", 1: "t2 t3 t4 t5", 2: "t4 t5 t6",
                   3: "t6"}
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=5)


def test_pack_documents(spark):
    """Per-group streams cut by start offset; a doc longer than the
    budget owns its start sequence; groups pack independently."""
    rows = [(1, "a", "x " * 300), (2, "a", "x " * 300),
            (3, "a", "x " * 300), (4, "b", "x " * 700),
            (5, "b", "x " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: (r.seq_id, r.n_tokens)
           for r in pack_documents(df, budget=500).collect()}
    assert out[1] == (0, 300)      # starts at 0
    assert out[2] == (0, 300)      # starts at 300
    assert out[3] == (1, 300)      # starts at 600
    assert out[4] == (0, 700)      # oversized doc owns its start seq
    assert out[5] == (1, 10)       # starts at 700 in group b
    with pytest.raises(ValueError):
        pack_documents(df, budget=0)
