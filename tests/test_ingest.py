"""ES ingest pipeline processor semantics on closed-form fixtures."""

import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.ingest import (_dissect_to_regex,
                                           ingest_pipeline)


def test_processor_chain(spark):
    df = spark.createDataFrame(
        [(1, '{"user": "Ada", "n": "7"}', "  Click ", "a-b-c")],
        "id long, payload string, kind string, path string")
    procs = [
        {"json": {"field": "payload", "target_field": "obj"}},
        {"grok": {"field": "payload", "pattern": '"n": "([0-9]+)"',
                  "captures": {"n_str": 1}}},
        {"convert": {"field": "n_str", "type": "long"}},
        {"rename": {"field": "n_str", "target_field": "n"}},
        {"trim": {"field": "kind"}},
        {"lowercase": {"field": "kind"}},
        {"split": {"field": "path", "separator": "-"}},
        {"set": {"field": "v", "value": 3}},
        {"remove": {"field": "payload"}},
    ]
    row = ingest_pipeline(df, procs).collect()[0]
    assert row["obj"]["user"] == "Ada" and row["obj"]["n"] == "7"
    assert row["n"] == 7 and isinstance(row["n"], int)
    assert row["kind"] == "click"
    assert row["path"] == ["a", "b", "c"]
    assert row["v"] == 3 and "payload" not in row.asDict()


def test_dissect_and_enrich(spark):
    rx, keys = _dissect_to_regex("%{ip} - %{user} [%{ts}]")
    assert keys == ["ip", "user", "ts"]
    df = spark.createDataFrame(
        [(1, "1.2.3.4 - ada [2024]", "eu")],
        "id long, line string, region string")
    lookup = spark.createDataFrame(
        [("eu", "Europe")], "region string, region_name string")
    out = ingest_pipeline(
        df,
        [{"dissect": {"field": "line",
                      "pattern": "%{ip} - %{user} [%{ts}]"}},
         {"enrich": {"lookup": "regions", "on": "region",
                     "fields": ["region_name"]}}],
        lookups={"regions": lookup}).collect()[0]
    assert (out["ip"], out["user"], out["ts"]) == ("1.2.3.4", "ada",
                                                   "2024")
    assert out["region_name"] == "Europe"
    with pytest.raises(ValueError, match="not supplied"):
        ingest_pipeline(df, [{"enrich": {"lookup": "x", "on": "id",
                                         "fields": []}}])
    with pytest.raises(ValueError, match="unknown processor"):
        ingest_pipeline(df, [{"nope": {}}])


def test_pipeline_is_single_projection(spark):
    """A no-enrich pipeline stays one scan + one projection — no
    shuffle, no UDF (whole-stage codegen end to end)."""
    df = spark.createDataFrame([(1, "x", "A")],
                               "id long, a string, b string")
    out = ingest_pipeline(df, [
        {"lowercase": {"field": "b"}},
        {"set": {"field": "c", "value": 1}},
        {"gsub": {"field": "a", "pattern": "x", "replacement": "y"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
