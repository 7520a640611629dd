"""Augmentation dispatcher (reference lib_core/augment.py:11-63)."""

import pytest

from auctus_spark.operators.augment import augment


def test_join_task(spark):
    left = spark.createDataFrame([("A", 1), ("B", 2)], "city string, x long")
    right = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "town string, temp double")
    out = augment(left, right, {
        "type": "join", "left_columns": ["city"],
        "right_columns": ["town"], "key_kinds": {"city": "text"}})
    rows = {r.city: r for r in out.collect()}
    assert rows["a"]["mean_temp"] == pytest.approx(15.0)
    assert rows["b"]["sum_temp"] == pytest.approx(5.0)


def test_union_task(spark):
    left = spark.createDataFrame([(1, "x")], "d3mIndex long, name string")
    right = spark.createDataFrame([("y",), ("z",)], "nm string")
    out = augment(left, right, {
        "type": "union", "left_columns": ["name"], "right_columns": ["nm"]})
    assert sorted(r.name for r in out.collect()) == ["x", "y", "z"]


def test_temporal_join_task(spark):
    import datetime as dt
    left = spark.createDataFrame(
        [(dt.datetime(2019, 4, 23), "l1")], "d timestamp, tag string")
    right = spark.createDataFrame(
        [(dt.datetime(2019, 4, 23, 9), 4.0)], "t timestamp, v double")
    out = augment(left, right, {
        "type": "join", "left_columns": ["d"], "right_columns": ["t"],
        "temporal_resolution": ("day", "hour")})
    assert out.collect()[0]["v"] == 4.0


def test_unknown_type(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        augment(df, df, {"type": "nope"})
