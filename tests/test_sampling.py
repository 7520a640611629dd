"""Deterministic sampling / splitting (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.sampling import (deterministic_split,
                                             weighted_sample)


def _pop(spark, n=20000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
        .alias("source"))


def test_weighted_sample_rates_and_determinism(spark):
    df = _pop(spark)
    w = {"src0": 1.0, "src1": 0.5, "src2": 0.1, "src3": 0.0}
    out = weighted_sample(df, w, default_weight=0.0)
    per = {r.source: r.n for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == 5000                 # w=1 keeps everything
    assert "src3" not in per                   # w=0 keeps nothing
    assert abs(per["src1"] / 5000 - 0.5) < 0.03
    assert abs(per["src2"] / 5000 - 0.1) < 0.02
    # deterministic: same rows after an arbitrary repartition
    again = weighted_sample(df.repartition(17), w, default_weight=0.0)
    assert sorted(r.doc_id for r in out.collect()) \
        == sorted(r.doc_id for r in again.collect())
    # unknown stratum -> default weight
    odd = df.withColumn("source", F.lit("mystery"))
    kept = weighted_sample(odd, w, default_weight=0.25).count()
    assert abs(kept / 20000 - 0.25) < 0.02


def test_deterministic_split(spark):
    df = _pop(spark)
    out = deterministic_split(df, {"train": 0.8, "val": 0.1,
                                   "test": 0.1})
    assert out.count() == 20000                # nothing dropped
    per = {r.split: r.n for r in
           out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"train", "val", "test"}
    assert abs(per["train"] / 20000 - 0.8) < 0.02
    assert abs(per["val"] / 20000 - 0.1) < 0.01
    # stable across repartition AND disjoint from sampling decisions
    again = deterministic_split(df.repartition(13),
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in again.collect()}
    assert a == b
    with pytest.raises(ValueError):
        deterministic_split(df, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        deterministic_split(df, {})


def test_domain_mixture_sample(spark):
    from auctus_spark.operators.sampling import domain_mixture_sample
    import pytest as _pt
    rows = [(i, "a") for i in range(800)] + \
           [(i + 1000, "b") for i in range(100)] + \
           [(i + 2000, "c") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_mixture_sample(
        df, {"a": 0.5, "b": 0.25, "c": 0.25}, "source", "doc_id")
    got = {r[0]: r[1] for r in
           out.groupBy("source").count().collect()}
    # binding domain: b (100 rows / 0.25 -> T=400); b keeps all
    assert got["b"] == 100
    # a keeps ~200 of 800, c ~100 of 500 (Bernoulli, not exact)
    assert abs(got["a"] - 200) < 60 and abs(got["c"] - 100) < 45
    # deterministic: same rows on re-run and after repartition
    again = domain_mixture_sample(
        df.repartition(7), {"a": 0.5, "b": 0.25, "c": 0.25},
        "source", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == \
        sorted(r.doc_id for r in again.collect())
    with _pt.raises(ValueError):
        domain_mixture_sample(df, {"a": 0.5, "zz": 0.5})
    with _pt.raises(ValueError):
        domain_mixture_sample(df, {"a": 0.9})
