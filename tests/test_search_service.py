"""Auctus-parity search surface: filters, facets, pagination + caps,
fuzzy, augmentation-search assembly."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.query.search import (
    MAX_SCROLL,
    SearchQuery,
    SearchService,
    augmentation_search,
    join_candidates,
    union_candidates,
)


@pytest.fixture(scope="module")
def svc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SearchService(docs)


def test_keyword_search_with_filters(spark, svc):
    r = svc.search(SearchQuery(keywords="join", size=10,
                               filters={"lang": ["en"]}),
                   facets=["source"])
    hits = r["hits"].collect()
    assert 0 < len(hits) <= 10
    # filter respected
    langs = (svc.docs.join(r["hits"].select("doc_id"), "doc_id")
             .select("lang").distinct().collect())
    assert [x.lang for x in langs] == ["en"]
    # facets describe the FULL hit set (ES terms aggregations,
    # reference search/__init__.py:587-603), not the page window
    full = (svc.docs.filter(F.col("lang") == "en")
            .filter(F.array_contains(
                F.split(F.lower("text"), r"[^a-z0-9_]+"), "join"))
            .count())
    total = sum(x.n for x in r["facets"]["source"].collect())
    assert total == full >= len(hits)


def test_pagination(svc):
    p1 = [r.doc_id for r in
          svc.search(SearchQuery(keywords="join", page=1, size=5))
          ["hits"].collect()]
    p2 = [r.doc_id for r in
          svc.search(SearchQuery(keywords="join", page=2, size=5))
          ["hits"].collect()]
    both = [r.doc_id for r in
            svc.search(SearchQuery(keywords="join", page=1, size=10))
            ["hits"].collect()]
    assert p1 + p2 == both
    with pytest.raises(ValueError):
        svc.search(SearchQuery(keywords="x", page=MAX_SCROLL, size=50))


def test_exclude_ids(svc):
    r1 = [r.doc_id for r in
          svc.search(SearchQuery(keywords="join", size=5))["hits"].collect()]
    r2 = svc.search(SearchQuery(keywords="join", size=5,
                                exclude_ids=[r1[0]]))["hits"].collect()
    assert r1[0] not in [r.doc_id for r in r2]


def test_fuzzy(spark):
    df = spark.createDataFrame(
        [(1, "temperature"), (2, "temperatura"), (3, "pressure")],
        "doc_id long, name string")
    svc = SearchService(df, text_col="name")
    got = [r.doc_id for r in svc.fuzzy_match("name", "Temperature").collect()]
    assert got == [1, 2]


def test_join_candidates(spark):
    cov = spark.createDataFrame(
        [("d1", 0.0, 100.0), ("d2", 50.0, 60.0), ("d3", 1000.0, 2000.0)],
        "cand_id string, gte double, lte double")
    q = spark.createDataFrame([(0.0, 100.0)], "q_gte double, q_lte double")
    got = [r.cand_id for r in join_candidates(q, cov).collect()]
    assert got == ["d1", "d2"]


def test_union_candidates(spark):
    out = union_candidates(
        ["temperature", "city_name"],
        {"candA": ["temperatur", "city_names"], "candB": ["zzz", "qqq"],
         "candC": ["temperature"]},
        spark=spark)
    ids = [d["id"] for d in out]
    assert "candA" in ids          # both columns pair well
    assert "candB" not in ids      # no similar pair
    assert "candC" not in ids      # only 1 similar pair < min_pairs=2
    assert out[0]["id"] == "candA"
    assert sorted(out[0]["pairs"]) == [
        ("city_name", "city_names"), ("temperature", "temperatur")]


def test_augmentation_interleave(spark):
    j = spark.createDataFrame([("j1", 0.9), ("j2", 0.5)],
                              "id string, score double")
    u = spark.createDataFrame([("u1", 0.8)], "id string, score double")
    got = [r.id for r in augmentation_search(j, u, k=3).collect()]
    assert got == ["j1", "u1", "j2"]


def test_keyword_filter_boost(spark):
    from auctus_spark.query.search import keyword_filter_boost
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "gamma")],
        "doc_id long, text string")
    got = {r.doc_id: r.score
           for r in keyword_filter_boost(df, "alpha beta").collect()}
    assert got == {1: 10.0}  # conjunctive filter, constant weight


def test_runtime_fields_filter_and_facets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    svc = SearchService(docs, runtime_mappings={
        "band": ("CASE WHEN n_chars < 200 THEN 'short' "
                 "WHEN n_chars < 350 THEN 'med' ELSE 'long' END"),
        # runtime fields may reference earlier runtime fields
        "is_short": "band = 'short'"})
    r = svc.search(SearchQuery(filters={"is_short": [True]}, size=500),
                   facets=["band"])
    f = {x.band: x.n for x in r["facets"]["band"].collect()}
    assert set(f) == {"short"}
    expect = docs.filter("n_chars < 200").count()
    assert f["short"] == expect == r["hits"].count()


def test_post_filter_narrows_hits_not_facets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    svc = SearchService(docs)
    q = SearchQuery(filters={"lang": ["en"]},
                    post_filter="n_chars >= 300", size=500)
    r = svc.search(q, facets=["lang"])
    n_en = docs.filter("lang = 'en'").count()
    n_post = docs.filter("lang = 'en' AND n_chars >= 300").count()
    assert r["hits"].count() == n_post < n_en
    # facets ignore post_filter (ES contract)
    assert {x.lang: x.n for x in r["facets"]["lang"].collect()} == \
        {"en": n_en}


def test_global_facets_escape_query_scope(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    svc = SearchService(docs)
    r = svc.search(SearchQuery(filters={"lang": ["fr"]}, size=10),
                   facets=["lang"], global_facets=["lang"])
    g = {x.lang: x.n for x in r["global_facets"]["lang"].collect()}
    assert g == {x.lang: x[1] for x in
                 docs.groupBy("lang").count().collect()}
    assert set(x.lang for x in r["facets"]["lang"].collect()) == {"fr"}


def test_alias_registry(spark, sf_dir):
    from auctus_spark.query.search import AliasRegistry
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = AliasRegistry()
    reg.add("west", docs, "lang = 'en'", is_write_index=True)
    reg.add("west", docs, "lang = 'fr'")
    got = reg.resolve("west")
    assert got.count() == docs.filter("lang in ('en','fr')").count()
    assert reg.write_target("west") is docs
    with pytest.raises(ValueError):
        reg.add("west", docs, is_write_index=True)  # second writer
    with pytest.raises(KeyError):
        reg.resolve("nope")
    reg.add("all", docs)
    assert reg.resolve("all").count() == docs.count()
    with pytest.raises(ValueError):
        reg.write_target("all")
    reg.remove("west")
    with pytest.raises(KeyError):
        reg.resolve("west")


def test_mget_request_order(spark, sf_dir):
    from auctus_spark.query.search import mget
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = mget(docs, [17, 3, 999_999_999], "doc_id") \
        .orderBy("_requested_order").collect()
    # missing id absent; present ids carry request positions
    assert [(r.doc_id, r._requested_order) for r in rows] == \
        [(17, 1), (3, 2)]


def test_alias_rollover_ilm(spark):
    """ES _rollover: condition on the write index's doc count; on
    rollover the old write index stays readable, writes move to the
    new generation; dry_run evaluates without flipping."""
    from auctus_spark.query.search import AliasRegistry
    g1 = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    g2 = spark.createDataFrame([(i,) for i in range(100, 103)],
                               "doc_id long")
    reg = AliasRegistry()
    reg.add("logs", g1, is_write_index=True)
    not_met = reg.rollover("logs", g2, max_docs=10)
    assert not_met == {"rolled_over": False, "dry_run": False,
                       "conditions": {"[max_docs: 10]": False},
                       "doc_count": 5}
    assert reg.write_target("logs") is g1
    dry = reg.rollover("logs", g2, max_docs=5, dry_run=True)
    assert dry["rolled_over"] is False and dry["conditions"][
        "[max_docs: 5]"] is True
    assert reg.write_target("logs") is g1          # unchanged
    res = reg.rollover("logs", g2, max_docs=5)
    assert res["rolled_over"] is True
    assert reg.write_target("logs") is g2
    # reads fan out over BOTH generations
    assert reg.resolve("logs").count() == 8
