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


def test_d3m_dataset_doc_golden(spark, tmp_path):
    """Full datasetDoc.json parity with the reference writer
    (d3m.py:25-98; golden mirrors tests/test_materialize.py
    basic_d3m_metadata_with_index): structural->colType map,
    categorical/boolean semantic overrides, index role, 4.0.0
    resFormat shape, sorted 2-indent serialization."""
    import glob
    import json

    from auctus_spark.sources import T_CATEGORICAL, d3m_metadata, write_d3m

    df = spark.createDataFrame(
        [("remi", "france", 4, True), ("aecio", "brazil", 7, False)],
        "name string, country string, number long, what boolean")
    out = str(tmp_path / "ds")
    doc = write_d3m(df, out, "test1",
                    metadata={"name": "basic", "size": 425},
                    semantic_types={"country": [T_CATEGORICAL]})
    golden_cols = [
        {"colIndex": 0, "colName": "d3mIndex", "colType": "integer",
         "role": ["index"]},
        {"colIndex": 1, "colName": "name", "colType": "string",
         "role": ["attribute"]},
        {"colIndex": 2, "colName": "country", "colType": "categorical",
         "role": ["attribute"]},
        {"colIndex": 3, "colName": "number", "colType": "integer",
         "role": ["attribute"]},
        {"colIndex": 4, "colName": "what", "colType": "boolean",
         "role": ["attribute"]},
    ]
    golden = {
        "about": {
            "datasetID": "test1",
            "datasetName": "basic",
            "datasetSchemaVersion": "4.0.0",
            "datasetVersion": "1.0",
            "approximateSize": "425 B",
            "license": "unknown",
            "redacted": False,
        },
        "dataResources": [{
            "resID": "learningData",
            "resType": "table",
            "resFormat": {"text/csv": ["csv"]},
            "resPath": "tables/learningData.csv",
            "isCollection": False,
            "columns": golden_cols,
        }],
    }
    assert doc == golden
    with open(f"{out}/datasetDoc.json") as fp:
        assert json.load(fp) == golden
    # learningData.csv really carries the d3mIndex
    part = glob.glob(f"{out}/tables/learningData.csv/*.csv")[0]
    with open(part) as fp:
        header = fp.readline().strip()
    assert header.startswith("d3mIndex,")
    # 3.2.0 keeps the list-shaped resFormat
    cols = [{"name": "name",
             "structural_type": "http://schema.org/Text",
             "semantic_types": []}]
    doc32 = d3m_metadata("x", {"columns": cols}, version="3.2.0")
    assert doc32["dataResources"][0]["resFormat"] == ["text/csv"]
    import pytest
    with pytest.raises(ValueError, match="version"):
        d3m_metadata("x", {"columns": cols}, version="9.9")


def test_read_corpus_table_name_and_path(spark, tmp_path):
    """Corpus input adapter: catalog table names resolve through
    spark.table() (the Iceberg-on-cluster path — here a catalog temp
    table), filesystem paths read as parquet, junk refs fail loudly."""
    import pytest

    from auctus_spark.sources import read_corpus_table
    df = spark.createDataFrame(
        [(0, "r", "a.py", "c0", "py", "import os")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    df.createOrReplaceTempView("corpus_tbl")
    got = read_corpus_table(spark, "corpus_tbl")
    assert got.count() == 1 and got.columns == df.columns
    p = str(tmp_path / "corpus_pq")
    df.write.parquet(p)
    assert read_corpus_table(spark, p).count() == 1
    with pytest.raises(ValueError, match="neither a catalog table"):
        read_corpus_table(spark, "no_such_table_anywhere")
