"""Tokenizer contract tests — the analyzer chain shared by oracle,
Spark engine and SQL oracles (reference: elasticsearch.yml:6-15 standard
tokenizer + lowercase; identifier split core.py:100-123)."""

import pandas as pd

from auctus_spark.analysis import (
    analyze_query,
    expand_identifier,
    term_frequencies,
    tokenize,
    tokenize_series,
)


def test_tokenize_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("def foo_bar(x): return x+1") == [
        "def", "foo_bar", "x", "return", "x", "1"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_tokenize_matches_series():
    texts = ["Import numpy as np", "getHTTPResponse2 = None", "", "a b a"]
    ser = tokenize_series(pd.Series(texts))
    for t, lst in zip(texts, ser):
        assert tokenize(t) == list(lst)


def test_expand_identifier():
    assert expand_identifier("getHTTPResponse2") == [
        "get", "http", "response", "2"]
    assert expand_identifier("snake_case_name") == ["snake", "case", "name"]
    assert expand_identifier("camelCaseName") == ["camel", "case", "name"]
    assert expand_identifier("a2b") == ["a", "2", "b"]


def test_term_frequencies():
    s = pd.Series(["a b a", "b c"])
    ids = pd.Series([10, 20])
    tf = term_frequencies(ids, tokenize_series(s))
    got = {(r.term, r.doc_id): r.tf for r in tf.itertuples(index=False)}
    assert got == {("a", 10): 2, ("b", 10): 1, ("b", 20): 1, ("c", 20): 1}


def test_analyze_query_dedup_order():
    assert analyze_query("Foo foo BAR foo") == ["foo", "bar"]
    assert analyze_query("color", {"color": ["colour"]}) == ["color", "colour"]


def test_strip_html():
    from auctus_spark.analysis import strip_html
    html = ('<p>Hello <b>world</b> &amp; friends, see '
            '<a href="http://x.org/data">here</a>!</p>')
    out = strip_html(html)
    assert "<" not in out and "&amp;" not in out
    assert "Hello world & friends" in out
    assert "http://x.org/data" in out  # href kept searchable
