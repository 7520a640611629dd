"""End-to-end MetadataCatalog chain (reference test_integ.py:149-205
analog): profile fixtures -> document tables -> keyword/join/union
search.  Values are oracle-gated in __spark_entry__ ([auctus_e2e],
[union_search_e2e]); these tests pin the structural contracts."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.query.catalog import MetadataCatalog


@pytest.fixture(scope="module")
def catalog(spark, sf_dir):
    cat = MetadataCatalog(spark)
    for t, desc in [
            ("nation", "reference list of nations with region codes"),
            ("customer", "customer accounts with market segment"),
            ("orders", "customer orders with total price order date")]:
        cat.add_dataset(t, spark.read.parquet(f"{sf_dir}/{t}.parquet"),
                        description=desc)
    return cat


def test_document_tables_shape(catalog):
    ds = {r["dataset_id"]: r for r in catalog.datasets_table().collect()}
    assert set(ds) == {"nation", "customer", "orders"}
    assert ds["orders"]["nb_columns"] == 6
    assert ds["orders"]["nb_temporal_columns"] == 1
    assert ds["orders"]["types"] == "categorical,numerical,temporal"
    assert "o_orderkey" in ds["orders"]["attribute_keywords"]
    assert " orderkey" in ds["orders"]["attribute_keywords"]  # expanded
    cols = {(r["dataset_id"], r["column"]): r
            for r in catalog.columns_table().collect()}
    assert cols[("orders", "o_orderdate")]["semantic_types"] \
        == "DATE_TIME"
    assert cols[("customer", "c_mktsegment")]["semantic_types"] \
        == "CATEGORICAL"
    assert cols[("customer", "c_acctbal")]["structural_type"] == "FLOAT"
    assert cols[("customer", "c_acctbal")]["mean"] is not None


def test_coverage_spans_are_min_max(catalog, spark, sf_dir):
    cov = {(r["dataset_id"], r["column"]): r
           for r in catalog.coverage_table().collect()}
    mm = spark.read.parquet(f"{sf_dir}/customer.parquet").agg(
        F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    assert cov[("customer", "c_acctbal")]["gte"] == float(mm[0])
    assert cov[("customer", "c_acctbal")]["lte"] == float(mm[1])
    ts = cov[("orders", "o_orderdate")]
    assert ts["kind"] == "temporal" and ts["gte_s"] < ts["lte_s"]


def test_keyword_search_conjunctive(catalog):
    hits = [r["dataset_id"]
            for r in catalog.keyword_search("customer").collect()]
    assert hits[0] == "customer" and "orders" in hits
    assert "nation" not in hits
    # conjunctive AND: a term missing from every doc -> zero hits
    assert catalog.keyword_search("customer zzz_nothing").count() == 0


def test_join_search_overlap(catalog):
    got = {(r["dataset_id"], r["column"]): r["score"]
           for r in catalog.join_search(500.0, 3000.0).collect()}
    # fully-contained query range -> score exactly 1.0
    assert got[("customer", "c_acctbal")] == 1.0
    # non-overlapping spans are excluded entirely
    assert ("nation", "n_nationkey") not in got


def test_union_search_rules(spark, sf_dir):
    cat = MetadataCatalog(spark)
    for t in ["customer", "supplier", "nation", "orders", "part"]:
        cat.add_dataset(t, spark.read.parquet(f"{sf_dir}/{t}.parquet"))
    out = cat.union_search("customer").collect()
    by_cand = {}
    for r in out:
        by_cand.setdefault(r["cand_id"], []).append(r)
    # every kept candidate satisfies the >= 2-pairs rule
    assert all(len(v) >= 2 for v in by_cand.values())
    # same-type constraint: c_name (TEXT) pairs with s_name, never a key
    sup = {(r["left_name"], r["right_name"]) for r in by_cand["supplier"]}
    assert ("c_name", "s_name") in sup
    assert ("c_nationkey", "s_nationkey") in sup
    # union score formula: sum(sims)/n_left, constant per candidate
    for cand, rows in by_cand.items():
        s = sum(r["similarity"] for r in rows) / 5
        assert all(abs(r["score"] - s) < 1e-12 for r in rows), cand
    # pairing is deterministic across invocations
    again = cat.union_search("customer").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
