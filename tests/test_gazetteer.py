"""Offline broadcast-gazetteer admin resolver (reference
spatial.py:333-403 disambiguation + profile_types.py:264-275 70%
rule, re-expressed as broadcast join + tiny option aggregate)."""

from pyspark.sql import functions as F

from auctus_spark.operators.gazetteer import (
    build_gazetteer,
    resolve_admin_areas,
)

SF = "/root/testdata/sf0.001"


def _gaz(spark):
    return build_gazetteer(
        spark.read.parquet(f"{SF}/nation.parquet"),
        spark.read.parquet(f"{SF}/region.parquet"))


def test_all_nations_resolve_level1(spark):
    gaz = _gaz(spark)
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    out = resolve_admin_areas(nation, gaz, "n_name")
    rows = {r.name: r for r in out.collect()}
    assert len(rows) == 25
    r = rows["nation_7"]          # nationkey 7, region 2, j = 1
    assert r.area_id == 107 and r.level == 1
    assert (r.min_lat, r.max_lat) == (-36.0, -32.0)   # 20-60+4
    assert (r.min_lon, r.max_lon) == (-102.0, -94.0)  # -110+8


def test_under_70pct_resolution_returns_none(spark):
    gaz = _gaz(spark)
    vals = [(f"nation_{i}",) for i in range(5)] + [
        (f"not_a_place_{i}",) for i in range(6)]
    df = spark.createDataFrame(vals, "v string")
    assert resolve_admin_areas(df, gaz, "v") is None


def test_common_parent_disambiguates(spark):
    """A name present in two regions resolves to the region shared
    with the other names (reference: 'counties in the same state')."""
    gaz_rows = [
        ("springfield", 200, 1, 10, 0, 0.0, 1.0, 0.0, 1.0),
        ("springfield", 201, 1, 11, 0, 2.0, 3.0, 2.0, 3.0),
        ("shelbyville", 202, 1, 10, 0, 0.0, 1.0, 1.0, 2.0),
        ("ogdenville", 203, 1, 10, 0, 1.0, 2.0, 0.0, 1.0),
        ("capital city", 204, 1, 10, 0, 1.0, 2.0, 1.0, 2.0),
    ]
    gaz = spark.createDataFrame(
        gaz_rows, "name string, area_id long, level int, "
                  "parent_id long, parent_level int, min_lat double, "
                  "max_lat double, min_lon double, max_lon double")
    df = spark.createDataFrame(
        [("Springfield",), ("Shelbyville",), ("Ogdenville",),
         ("Capital City",)], "v string")
    out = {r.name: r.area_id
           for r in resolve_admin_areas(df, gaz, "v").collect()}
    assert out["springfield"] == 200      # parent 10 won, not 201


def test_prefers_lower_level(spark):
    """Names that are both countries and states resolve as countries
    (reference orders options by ascending level)."""
    gaz_rows = []
    for i, name in enumerate(["alpha", "beta", "gamma", "delta"]):
        gaz_rows.append((name, i, 0, None, None,
                         0.0, 1.0, 0.0, 1.0))
        gaz_rows.append((name, 100 + i, 1, 50, 0,
                         0.0, 1.0, 0.0, 1.0))
    gaz = spark.createDataFrame(
        gaz_rows, "name string, area_id long, level int, "
                  "parent_id long, parent_level int, min_lat double, "
                  "max_lat double, min_lon double, max_lon double")
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",)], "v string")
    out = {r.name: r for r in resolve_admin_areas(df, gaz, "v").collect()}
    assert all(r.level == 0 for r in out.values())
    assert out["alpha"].area_id == 0


def test_region_names_resolve_level0(spark):
    gaz = _gaz(spark)
    region = spark.read.parquet(f"{SF}/region.parquet")
    out = {r.name: r
           for r in resolve_admin_areas(region, gaz, "r_name").collect()}
    assert len(out) == 5
    assert out["europe"].level == 0 and out["europe"].area_id == 3
    assert out["europe"].min_lat == -30.0


def test_broadcast_plan(spark):
    """The gazetteer join must broadcast, never shuffle the dim."""
    gaz = _gaz(spark)
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    names = (nation.select(F.lower(F.trim("n_name")).alias("name"))
             .distinct())
    plan = names.join(F.broadcast(gaz), "name") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
