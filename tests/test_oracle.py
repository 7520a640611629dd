"""Reference scorer sanity — golden Lucene BM25 values computed by hand,
conjunctive AND semantics, tie-break (score desc, docID asc)."""

import math

from auctus_spark.oracle import OracleIndex, bm25_idf, bm25_tf_norm


def test_idf_golden():
    # Lucene: idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    assert math.isclose(bm25_idf(2, 1), math.log(1 + 1.5 / 1.5))
    assert math.isclose(bm25_idf(100, 10), math.log(1 + 90.5 / 10.5))


def test_tf_norm_golden():
    # tf=2, dl=4, avgdl=4 → 2 / (2 + 1.2*(0.25 + 0.75)) = 2/3.2
    assert math.isclose(bm25_tf_norm(2, 4, 4.0), 2 / 3.2)


def test_search_single_term():
    idx = OracleIndex.build([(0, "a b c d"), (1, "a a b c"), (2, "x y z w")])
    res = idx.search("a")
    assert [d for d, _ in res] == [1, 0]
    idf = bm25_idf(3, 2)
    assert math.isclose(res[0][1], idf * bm25_tf_norm(2, 4, 4.0))
    assert math.isclose(res[1][1], idf * bm25_tf_norm(1, 4, 4.0))


def test_conjunctive_and():
    idx = OracleIndex.build([(0, "a b"), (1, "a c"), (2, "b c")])
    assert [d for d, _ in idx.search("a b")] == [0]
    assert idx.search("a z") == []  # missing term → no hits
    assert idx.search("") == []


def test_tiebreak_docid_asc():
    # identical docs → identical scores → docID ascending
    idx = OracleIndex.build([(5, "q r s"), (3, "q r s"), (9, "q r s")])
    res = idx.search("q r")
    assert [d for d, _ in res] == [3, 5, 9]
    assert res[0][1] == res[1][1] == res[2][1]


def test_topk_cut():
    docs = [(i, "common term " + f"pad{i} " * (i + 1)) for i in range(60)]
    idx = OracleIndex.build(docs)
    res = idx.search("common", k=50)
    assert len(res) == 50
    # shorter docs score higher (length norm) → doc 0 first
    assert res[0][0] == 0


def test_synonym_chain_order_surface_lookup_single_stem():
    """ES chain order (elasticsearch.yml): lowercase -> synonym lookup
    on the SURFACE form -> stem each alternative exactly ONCE.  Porter2
    is not idempotent ('parses'->'pars'->'par'), so stem-before-lookup
    both misses the synonym key and corrupts the term."""
    from auctus_spark.oracle import _analyze_slots
    slots = _analyze_slots("parses", {"parses": ["decode"]}, stem=True)
    assert slots == [["pars", "decod"]]
    # and end-to-end: a stemmed index finds docs via the synonym
    idx = OracleIndex.build(
        [(0, "parsing tokens"), (1, "decoded tokens"), (2, "other stuff")],
        stem=True)
    hits = [d for d, _ in idx.search_synonyms(
        "parses", {"parses": ["decode"]})]
    assert sorted(hits) == [0, 1]
