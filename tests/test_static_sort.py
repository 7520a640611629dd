"""Index sorting + early termination: exact file-prefix top-k."""

import os

import pytest
from pyspark.sql import functions as F

from auctus_spark.index.static_sort import (
    MANIFEST,
    _select_prefix,
    topk_sorted,
    write_sorted_table,
)


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srt") / "tbl")
    # heavy ties (v = i % 17) force boundary-straddling duplicates
    df = spark.range(0, 3000).select(
        F.col("id"), (F.col("id") % 17).cast("long").alias("v"))
    # plant nulls: they must be excluded from the sorted layout
    df = df.withColumn(
        "v", F.when(F.col("id") % 101 == 0, None).otherwise(F.col("v")))
    write_sorted_table(df, path, "v", n_files=8)
    return path


def test_manifest_shape(sorted_path):
    import json
    with open(os.path.join(sorted_path, MANIFEST)) as fh:
        m = json.load(fh)
    files = m["files"]
    assert len(files) == 8 and m["sort_col"] == "v"
    # desc range order: max non-increasing, disjoint up to boundaries
    for a, b in zip(files, files[1:]):
        assert a["max"] >= b["max"] and a["min"] >= b["max"]


def test_topk_matches_full_sort_at_every_k(spark, sorted_path):
    full = spark.read.parquet(sorted_path) \
        .orderBy(F.desc("v"), F.asc("id"))
    for k in (1, 7, 200, 377, 1000, 5000):
        got = [(r.id, r.v) for r in
               topk_sorted(spark, sorted_path, k, tie_col="id")
               .collect()]
        want = [(r.id, r.v) for r in full.limit(k).collect()]
        assert got == want, f"k={k}"


def test_early_termination_reads_file_prefix(spark, sorted_path):
    df = topk_sorted(spark, sorted_path, 10, tie_col="id")
    read = set(df.inputFiles())
    total = set(spark.read.parquet(sorted_path).inputFiles())
    assert len(read) < len(total)
    assert read <= total
    # k=10 over ~170-row slices: one slice + possible boundary ties
    assert len(read) <= 2


def test_nulls_excluded(spark, sorted_path):
    assert spark.read.parquet(sorted_path) \
        .where(F.col("v").isNull()).count() == 0


def test_select_prefix_boundary_ties():
    files = [
        {"file": "a", "min": 5, "max": 9, "rows": 10},
        {"file": "b", "min": 5, "max": 5, "rows": 4},   # all boundary
        {"file": "c", "min": 1, "max": 5, "rows": 10},  # continues 5s
        {"file": "d", "min": 0, "max": 0, "rows": 10},
    ]
    chosen = [e["file"] for e in _select_prefix(files, 10)]
    # a covers k=10, but b (max==a.min) and c (max==b.min) hold ties
    assert chosen == ["a", "b", "c"]
    assert [e["file"] for e in _select_prefix(files, 35)] == \
        ["a", "b", "c", "d"]
    assert _select_prefix([], 5) == []
