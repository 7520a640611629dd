"""Format detection / conversion layer (reference detect.py +
converters + core.py sampling)."""

import os

import pytest

from auctus_spark.sources import (
    count_rows_to_skip,
    detect_format,
    pivoted_columns,
    read_any,
    sample_dataset,
    unpivot,
)


def test_detect_parquet(sf_dir):
    assert detect_format(f"{sf_dir}/region.parquet")["format"] == "parquet"


def test_detect_csv_and_tsv(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("a,b,c\n1,2,3\n4,5,6\n7,8,9\n")
    assert detect_format(str(p)) == {"format": "csv", "separator": ","}
    t = tmp_path / "a.tsv"
    t.write_text("a\tb\tc\n1\t2\t3\n4\t5\t6\n7\t8\t9\n")
    assert detect_format(str(t))["separator"] == "\t"


def test_detect_json(tmp_path):
    j = tmp_path / "a.json"
    j.write_text('{"a": 1}\n{"a": 2}\n')
    assert detect_format(str(j))["format"] == "json"


def test_header_junk_skip(tmp_path):
    import io
    # reference tests/data/lazo.csv: junk title rows before the header
    content = "My Great Report\n\ndessert,year\ncake,2001\npie,2002\nflan,2003\n"
    assert count_rows_to_skip(io.StringIO(content)) == 2
    clean = "a,b\n1,2\n3,4\n5,6\n"
    assert count_rows_to_skip(io.StringIO(clean)) == 0


def test_pivot_detection():
    assert pivoted_columns(["country", "2018", "2019", "2020"]) == [1, 2, 3]
    assert pivoted_columns(
        ["id", "2019-01", "2019-02", "2019-03", "x"]) == [1, 2, 3]
    assert pivoted_columns(["a", "b", "2019"]) is None


def test_read_any_csv(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("name,value\nx,1\ny,2\nz,3\n")
    df = read_any(spark, str(p))
    assert df.columns == ["name", "value"]
    assert df.count() == 3


def test_read_any_skip_rows(spark, tmp_path):
    p = tmp_path / "junk.csv"
    p.write_text("Junk Title\n\nname,value\nx,1\ny,2\nz,3\nw,4\n")
    df = read_any(spark, str(p))
    assert df.columns == ["name", "value"]
    assert df.count() == 4


def test_unpivot(spark):
    df = spark.createDataFrame(
        [("us", 1.0, 2.0), ("fr", 3.0, 4.0)],
        "country string, `2019` double, `2020` double")
    out = unpivot(df, ["country"], ["2019", "2020"]).collect()
    got = {(r.country, r.date): r.value for r in out}
    assert got == {("us", "2019"): 1.0, ("us", "2020"): 2.0,
                   ("fr", "2019"): 3.0, ("fr", "2020"): 4.0}


def test_sample_deterministic(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s1 = sample_dataset(df, 500).count()
    s2 = sample_dataset(df, 500).count()
    assert s1 == s2  # seeded
    assert s1 < df.count()
