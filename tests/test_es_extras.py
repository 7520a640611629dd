"""geo_shape envelope, terms lookup, search templates, collapse
inner_hits, ip_range/ip_prefix aggs."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.geo import geo_shape_envelope_filter
from auctus_spark.operators.profiling import ip_prefix_agg, ip_range_agg
from auctus_spark.query.querystring import render_search_template
from auctus_spark.query.search import terms_lookup_filter
from auctus_spark import pipeline


@pytest.fixture(scope="module")
def boxes(spark):
    # (id, min_lat, min_lon, max_lat, max_lon)
    return spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0),    # inside the envelope
         (2, -5.0, -5.0, 5.0, 5.0),    # straddles the lower corner
         (3, 40.0, 40.0, 50.0, 50.0),  # fully outside
         (4, -30.0, -30.0, 30.0, 30.0)],  # contains the envelope
        "id int, min_lat double, min_lon double, "
        "max_lat double, max_lon double")


def test_geo_shape_envelope_relations(boxes):
    env = ((20.0, -10.0), (-10.0, 20.0))  # top_left, bottom_right
    got = {rel: sorted(r.id for r in geo_shape_envelope_filter(
        boxes, env, rel).collect())
        for rel in ("intersects", "within", "contains", "disjoint")}
    assert got["intersects"] == [1, 2, 4]
    assert got["within"] == [1, 2]
    assert got["contains"] == [4]
    assert got["disjoint"] == [3]
    with pytest.raises(ValueError):
        geo_shape_envelope_filter(boxes, env, "overlaps")
    with pytest.raises(ValueError):
        geo_shape_envelope_filter(boxes, ((10.0, 170.0), (-10.0, -170.0)))


def test_terms_lookup(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, tag string")
    lookup = spark.createDataFrame(
        [(10, ["a", "c"]), (11, [])],
        "lid int, tags array<string>")
    got = sorted(r.id for r in terms_lookup_filter(
        fact, "tag", lookup, "lid", 10, "tags").collect())
    assert got == [1, 3]
    # empty list and absent doc match nothing (ES contract)
    assert terms_lookup_filter(fact, "tag", lookup, "lid", 11,
                               "tags").count() == 0
    assert terms_lookup_filter(fact, "tag", lookup, "lid", 99,
                               "tags").count() == 0


def test_render_search_template():
    t = "{{q}}{{#lang}} AND lang:{{lang}}{{/lang}}{{^lang}} (any){{/lang}}"
    assert render_search_template(t, {"q": "data join",
                                      "lang": "en"}) == \
        "data join AND lang:en"
    assert render_search_template(t, {"q": "data join"}) == \
        "data join (any)"
    # missing plain variable renders empty (mustache behavior)
    assert render_search_template("x {{nope}} y", {}) == "x  y"


def test_collapse_inner_hits(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pipeline.collapse_inner_hits_topk(
        docs, "join", "source", k=3, inner_size=2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) <= 3
    for rows in by_src.values():
        ranks = sorted(r.inner_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))  # 1..n, n<=2
        best = max(rows, key=lambda r: (r.score, -r.doc_id))
        assert best.inner_rank == 1
    # lead hits are the global collapse_topk result
    lead = {(r.source, r.doc_id) for r in out if r.inner_rank == 1}
    ref = pipeline.collapse_topk(docs, "join", "source", k=3,
                                 round_to=6).collect()
    assert {(r.source, r.doc_id) for r in ref} == lead


def test_ip_range_agg(spark):
    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.0.5",), ("10.0.1.0",), ("192.168.0.1",)],
        "ip string")
    out = {r.key: r.doc_count for r in ip_range_agg(
        df, "ip", [("10.0.0.0", "10.0.1.0"),
                   ("10.0.1.0", None),
                   (None, "10.0.0.0")]).collect()}
    assert out == {"10.0.0.0-10.0.1.0": 2, "10.0.1.0-*": 2,
                   "*-10.0.0.0": 0}


def test_ip_prefix_agg(spark):
    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.255.9",), ("10.1.0.1",),
         ("192.168.3.4",)], "ip string")
    out = {r.prefix: r.doc_count
           for r in ip_prefix_agg(df, "ip", 16).collect()}
    assert out == {"10.0.0.0/16": 2, "10.1.0.0/16": 1,
                   "192.168.0.0/16": 1}
    out24 = {r.prefix: r.doc_count
             for r in ip_prefix_agg(df, "ip", 24).collect()}
    assert out24["10.0.0.0/24"] == 1
    with pytest.raises(ValueError):
        ip_prefix_agg(df, "ip", 0)
