"""Join operators: augmentation-join fan-in semantics, temporal
alignment, range/spatial candidate scoring, spatial nearest join —
mirroring reference test_augmentation.py expectations."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.joins import (
    augment_join,
    normalize_join_key,
    range_overlap_score,
    spatial_nearest_join,
    spatial_overlap_score,
    temporal_aligned_join,
)


def test_augment_join_fanin(spark):
    """One output row per left row; numeric right cols get
    mean/sum/max/min; null-preserving sum (augmentation.py:239-257)."""
    left = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    right = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, None), (2, None)],
        "id long, salary double")
    out = augment_join(left, right, ["id"]).orderBy("id").collect()
    assert len(out) == 3
    r1 = out[0]
    assert r1["mean_salary"] == 15.0 and r1["sum_salary"] == 30.0
    assert r1["max_salary"] == 20.0 and r1["min_salary"] == 10.0
    r2 = out[1]
    assert r2["sum_salary"] is None  # all-null group sums to null not 0
    r3 = out[2]
    assert r3["sum_salary"] is None  # no match at all (left join)


def test_augment_join_nonnumeric_first(spark):
    left = spark.createDataFrame([(1,)], "id long")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "id long, tag string")
    out = augment_join(left, right, ["id"]).collect()[0]
    assert out["tag"] == "x"


def test_augment_join_conflict_rename(spark):
    left = spark.createDataFrame([(1, "L")], "id long, name string")
    right = spark.createDataFrame([(1, "R")], "id long, name string")
    out = augment_join(left, right, ["id"]).collect()[0]
    assert out["name"] == "L" and out["name_r"] == "R"


def test_normalize_join_key(spark):
    df = spark.createDataFrame([("ABC",), ("dEf",)], "k string")
    got = [r.k for r in normalize_join_key(df, "k", "text").collect()]
    assert got == ["abc", "def"]


def test_temporal_aligned_join(spark):
    """hourly right joined to daily left truncates hours to days
    (augmentation.py:134-231 + temporal.py)."""
    left = spark.createDataFrame(
        [(dt.datetime(2019, 4, 23), "yes")], "d timestamp, rain string")
    right = spark.createDataFrame(
        [(dt.datetime(2019, 4, 23, 7), 1.0),
         (dt.datetime(2019, 4, 23, 9), 3.0),
         (dt.datetime(2019, 4, 24, 7), 9.0)], "t timestamp, v double")
    out = temporal_aligned_join(left, right, "d", "t", "day", "hour")
    vals = sorted(r.v for r in out.collect())
    assert vals == [1.0, 3.0]


def test_range_overlap_score(spark):
    cand = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 6.0), ("c", 100.0, 200.0)],
        "cand_id string, gte double, lte double")
    q = spark.createDataFrame([(0.0, 10.0)], "q_gte double, q_lte double")
    got = {r.cand_id: r.score for r in
           range_overlap_score(cand, q).collect()}
    # painless formula: (min(lte)-max(gte)+1)/total_query_coverage
    assert got["a"] == pytest.approx(11 / 11)
    assert got["b"] == pytest.approx(2 / 11)
    assert "c" not in got


def test_spatial_overlap_score(spark):
    cand = spark.createDataFrame(
        [("a", 0.0, 0.0, 10.0, 10.0), ("b", 5.0, 5.0, 15.0, 15.0)],
        "cand_id string, min_lon double, min_lat double, "
        "max_lon double, max_lat double")
    q = spark.createDataFrame(
        [(0.0, 0.0, 10.0, 10.0)],
        "q_min_lon double, q_min_lat double, q_max_lon double, "
        "q_max_lat double")
    got = {r.cand_id: r.score for r in
           spatial_overlap_score(cand, q).collect()}
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(0.25)


def test_script_score_join_modes(spark):
    """The generic function_score/script_score facade: arbitrary match
    predicate + score expression, ES score_mode folding and weight
    (boost_mode multiply)."""
    from pyspark.sql import functions as F

    from auctus_spark.operators.joins import script_score_join
    cand = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 6.0), ("c", 100.0, 200.0)],
        "cand_id string, gte double, lte double")
    q = spark.createDataFrame([(0.0, 10.0), (5.0, 6.0)],
                              "q_gte double, q_lte double")
    match = ((F.col("q_gte") <= F.col("lte"))
             & (F.col("q_lte") >= F.col("gte")))
    # fraction of the CANDIDATE covered by the query range — a formula
    # neither built-in scorer implements
    script = ((F.least("lte", "q_lte") - F.greatest("gte", "q_gte") + 1)
              / (F.col("lte") - F.col("gte") + 1))
    for mode, want_a, want_b in [
            ("sum", 11 / 11 + 2 / 11, 2 / 2 + 2 / 2),
            ("max", 11 / 11, 1.0),
            ("min", 2 / 11, 1.0),
            ("avg", (11 / 11 + 2 / 11) / 2, 1.0)]:
        got = {r.cand_id: r.score for r in script_score_join(
            cand, q, match, script, mode).collect()}
        assert got["a"] == pytest.approx(want_a), mode
        assert got["b"] == pytest.approx(want_b), mode
        assert "c" not in got
    w = {r.cand_id: r.score for r in script_score_join(
        cand, q, match, script, "max", weight=2.5).collect()}
    assert w["a"] == pytest.approx(2.5)


def test_spatial_nearest_join(spark):
    left = spark.createDataFrame(
        [(0.0, 0.0, "origin"), (5.0, 5.0, "mid")],
        "lat double, lon double, label string")
    right = spark.createDataFrame(
        [(0.1, 0.1), (4.9, 5.2), (40.0, 40.0)], "rlat double, rlon double")
    out = spatial_nearest_join(left, right, "lat", "lon", "rlat", "rlon",
                               max_dist=1.0)
    rows = {(r.rlat, r.rlon): r.label for r in out.collect()}
    assert rows[(0.1, 0.1)] == "origin"
    assert rows[(4.9, 5.2)] == "mid"
    assert (40.0, 40.0) not in rows  # beyond max_dist → discarded
