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


def test_date_math_parser():
    """ES date-math: anchors, left-to-right add/round steps, Monday
    weeks, month-end clamping, deterministic-now contract."""
    from datetime import datetime

    import pytest

    from auctus_spark.query.datemath import parse_date_math as p
    assert p("2024-01-10||/w") == datetime(2024, 1, 8)
    assert p("2024-01-08||+1w/w") == datetime(2024, 1, 15)
    assert p("2024-01-31||+1M") == datetime(2024, 2, 29)   # leap clamp
    assert p("2023-01-31||+1M") == datetime(2023, 2, 28)
    assert p("2024-03-15T10:30:45||/h") == datetime(2024, 3, 15, 10)
    assert p("2024-03-15||-7d/d") == datetime(2024, 3, 8)
    assert p("now+1d", now=datetime(2024, 1, 1)) == datetime(2024, 1, 2)
    assert p("2024-02") == datetime(2024, 2, 1)
    # steps apply in written order (round/add do not commute)
    assert p("2024-01-10||/w+1d") == datetime(2024, 1, 9)
    assert p("2024-01-10||+1d/w") == datetime(2024, 1, 8)
    for bad in ["now", "2024-01-08||+x", "2024-01-08||/3d", "junk"]:
        with pytest.raises(ValueError):
            p(bad)


def test_date_math_range_filter(spark):
    """date_math_range: gte inclusive / lt exclusive, literal bounds
    (sargable), week window matches hand filtering."""
    import datetime as dt

    from auctus_spark.query.datemath import date_math_range
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
            for i in range(30)]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    got = sorted(r["i"] for r in date_math_range(
        df, "ts", gte="2024-01-08||/w",
        lt="2024-01-08||+1w/w").collect())
    assert got == [7, 8, 9, 10, 11, 12, 13]   # Jan 8 (Mon) .. Jan 14
    plan = date_math_range(df, "ts", gte="2024-01-08||/w")._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "2024-01-08" in plan               # folded literal bound
