"""query_string / simple_query_string: parser shapes, Lucene occur
semantics, BM25 leaf scoring vs closed-form math."""

import math

import pytest

from auctus_spark.query.querystring import (Bool, Leaf, Not, Req,
                                            parse_query_string,
                                            parse_simple_query_string,
                                            query_string_topk,
                                            simple_query_string_topk)

K1, B = 1.2, 0.75


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _tfn(tf, dl, avgdl):
    return tf / (tf + K1 * (1 - B + B * dl / avgdl))


@pytest.fixture()
def docs(spark):
    rows = [(1, "hash join fast", "en"), (2, "join data data", "de"),
            (3, "data merge", "en"), (4, "join data", "en"),
            (5, "nothing here", "de")]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def test_parse_query_string_shapes():
    ast = parse_query_string('(a AND b) OR "x y"^2 -lang:de +c NOT d',
                             keyword_fields=("lang",))
    assert isinstance(ast, Bool) and ast.op == "or"
    kinds = [type(c).__name__ for c in ast.children]
    assert kinds == ["Bool", "Leaf", "Not", "Req", "Not"]
    assert ast.children[1].kind == "phrase"
    assert ast.children[1].boost == 2.0
    assert ast.children[2].child.field == "lang"
    # phrase keeps duplicate words (raw tokenize, not analyze)
    ph = parse_query_string('"a b a"')
    assert ph.words == ["a", "b", "a"]
    # text: prefix folds into the default field
    assert parse_query_string("text:foo").words == ["foo"]
    assert parse_query_string("") is None


def test_parse_simple_query_string_precedence():
    # '|' binds looser than '+'; '-' is prefix; never raises
    ast = parse_simple_query_string("a + b | c")
    assert ast.op == "or"
    assert isinstance(ast.children[0], Bool)
    assert ast.children[0].op == "and"
    assert parse_simple_query_string(")))(((") is None
    # malformed boost chars degrade to terms, no exception
    assert parse_simple_query_string("a ^ b") is not None


def test_query_string_scores_closed_form(docs):
    """(join AND data) OR "hash join"^2 -lang:de — every score
    recomputed from the BM25 closed form."""
    got = {r["doc_id"]: r["score"]
           for r in query_string_topk(
               docs, '(join AND data) OR "hash join"^2 -lang:de',
               keyword_fields=("lang",)).collect()}
    n, avgdl = 5, 12 / 5
    i_join, i_data, i_hash = _idf(n, 3), _idf(n, 3), _idf(n, 1)
    # doc 2 (lang de) excluded despite matching join AND data
    assert 2 not in got
    # doc 4: join+data branch, dl 2
    exp4 = i_join * _tfn(1, 2, avgdl) + i_data * _tfn(1, 2, avgdl)
    assert got[4] == pytest.approx(exp4, abs=1e-6)
    # doc 1: phrase branch, pf 1, dl 3, idf = sum of term idfs, x2
    exp1 = 2.0 * (i_hash + i_join) * _tfn(1, 3, avgdl)
    assert got[1] == pytest.approx(exp1, abs=1e-6)
    assert set(got) == {1, 4}


def test_keyword_field_and_wildcard_scoring(docs):
    """keyword leaf = idf/(1+k1) with the field's df; wildcard leaf =
    constant 1.0."""
    got = {r["doc_id"]: r["score"]
           for r in query_string_topk(docs, "dat* OR lang:de",
                                      keyword_fields=("lang",)
                                      ).collect()}
    kw = _idf(5, 2) / (1 + K1)
    assert got[5] == pytest.approx(kw, abs=1e-6)          # kw only
    assert got[3] == pytest.approx(1.0)                   # wildcard
    assert got[2] == pytest.approx(1.0 + kw, abs=1e-6)    # both


def test_required_makes_others_optional(docs):
    """Lucene occur: once a '+' clause exists at a level, bare
    siblings become pure-scoring (not required)."""
    got = {r["doc_id"]: r["score"]
           for r in query_string_topk(docs, "+merge data").collect()}
    assert set(got) == {3}            # only doc 3 has merge
    # its score includes the optional data clause
    n, avgdl = 5, 12 / 5
    exp = (_idf(n, 1) * _tfn(1, 2, avgdl)
           + _idf(n, 3) * _tfn(1, 2, avgdl))
    assert got[3] == pytest.approx(exp, abs=1e-6)


def test_simple_query_string_never_raises(docs):
    got = {r["doc_id"] for r in simple_query_string_topk(
        docs, "(join + data) | merge -hash").collect()}
    assert got == {2, 3, 4}           # doc1 excluded by -hash
    assert simple_query_string_topk(docs, "~~^^||").collect() == []


def test_phrase_freq_repeats_and_boundaries(spark):
    """phrase freq counts overlapping consecutive runs; short docs
    (size < phrase len) never match."""
    rows = [(1, "a b a b a"), (2, "a"), (3, "b a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in query_string_topk(docs, '"a b a"').collect()}
    # doc1: starts at 0 and 2 -> pf 2
    n, avgdl = 3, 8 / 3
    # per-word idfs in phrase order: df(a)=3 (all docs), df(b)=2
    idf = 2 * _idf(n, 3) + _idf(n, 2)
    assert got[1] == pytest.approx(idf * _tfn(2, 5, avgdl), abs=1e-6)
    assert set(got) == {1}


def test_combined_fields_bm25f_closed_form(spark):
    """combined_fields mixes weighted tf/dl into ONE BM25 (term-
    centric BM25F) — recomputed from the closed form; weight < 1
    rejected (ES contract)."""
    from auctus_spark import pipeline
    rows = [(1, "x y", "x"), (2, "y z", "x y"), (3, "z", "z")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, title string")
    got = {r["doc_id"]: r["score"]
           for r in pipeline.combined_fields_topk(
               docs, "x", {"text": 1.0, "title": 2.0},
               operator="and", round_to=None).collect()}
    n = 3
    # dl_c: d1 = 2 + 2*1 = 4; d2 = 2 + 2*2 = 6; d3 = 1 + 2*1 = 3
    avgdl = (4 + 6 + 3) / 3
    # df(x) over ANY field: docs 1, 2 -> 2
    idf = _idf(n, 2)
    # tf_c(x): d1 = 1 + 2*1 = 3; d2 = 0 + 2*1 = 2
    def s(tfc, dlc):
        return idf * (tfc / (tfc + K1 * (1 - B + B * dlc / avgdl)))
    assert got[1] == pytest.approx(s(3, 4), abs=1e-9)
    assert got[2] == pytest.approx(s(2, 6), abs=1e-9)
    assert 3 not in got
    with pytest.raises(ValueError):
        pipeline.combined_fields_topk(docs, "x", {"text": 0.5})


def test_distance_feature_score(spark):
    from datetime import datetime
    from auctus_spark import pipeline
    rows = [(1, datetime(2024, 1, 15)), (2, datetime(2024, 1, 16)),
            (3, None)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r["event_id"]: r["score"]
           for r in pipeline.distance_feature_topk(
               df, "ts", "2024-01-15 00:00:00", pivot=86400.0,
               k=10).collect()}
    assert got[1] == pytest.approx(1.0)          # at origin
    assert got[2] == pytest.approx(0.5)          # one pivot away
    assert 3 not in got                          # null never matches


def test_terms_set_per_doc_minimum(spark):
    """terms_set: m is read per doc — same hit profile passes for
    m=1 and fails for m=3."""
    from auctus_spark import pipeline
    from pyspark.sql import functions as F
    rows = [(1, "a b x", 2), (2, "a x y", 2), (3, "a b c", 3),
            (4, "a b c", 4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, m int")
    got = {r["doc_id"] for r in pipeline.terms_set_topk(
        docs, ["a", "b", "c"], F.col("m")).collect()}
    # doc1: 2 hits >= 2 OK; doc2: 1 < 2 no; doc3: 3 >= 3 OK;
    # doc4: 3 < 4 no
    assert got == {1, 3}


def test_percolate_routing(spark):
    """percolate: every registered query's condition evaluated in one
    scan; (query_id, doc_id) pairs; unparseable queries skipped."""
    from auctus_spark.query.querystring import percolate
    rows = [(1, "hash join now", "en"), (2, "join data", "de"),
            (3, "vector merge", "en")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    qs = [(10, "join + data"), (20, '"hash join"'),
          (30, "merge -join"), (40, "lang:de"), (50, "")]
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(docs, qs, grammar="simple",
                              keyword_fields=("lang",)).collect()}
    assert got == {(10, 2), (20, 1), (30, 3), (40, 2)}
    # plan: one scan, no exchange
    plan = percolate(docs, qs, keyword_fields=("lang",))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
