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
