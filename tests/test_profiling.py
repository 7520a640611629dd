"""Profiling sketch layer vs reference semantics (lib_profiler)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.profiling import (
    categorical_histogram,
    classify_column,
    infer_structural_types,
    numeric_histogram,
    numeric_profile,
    range_sketch_pdf,
    temporal_resolution,
    text_word_histogram,
)


def test_numeric_profile(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (3.0,)], "v double")
    r = numeric_profile(df, "v").collect()[0]
    assert r["mean"] == pytest.approx(2.25)
    # population stddev (two-pass in reference numerical.py:17-35)
    assert r["stddev"] == pytest.approx(np.std([1, 2, 3, 3]))
    assert r["num_distinct_values"] == 3


def test_numeric_histogram_matches_numpy(spark):
    vals = [float(x) for x in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.bin: r["count"] for r in numeric_histogram(df, "v").collect()}
    want, _ = np.histogram(vals, bins=10)
    assert [got.get(i, 0) for i in range(10)] == want.tolist()


def test_categorical_histogram(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "v string")
    rows = categorical_histogram(df, "v").collect()
    assert [(r.v, r["count"]) for r in rows] == [("a", 5), ("b", 3), ("c", 1)]


def test_text_word_histogram(spark):
    df = spark.createDataFrame([("The cat and the dog",)], "t string")
    rows = text_word_histogram(df, "t", k=2).collect()
    assert (rows[0].word, rows[0]["count"]) == ("the", 2)


def test_temporal_resolution(spark):
    import datetime as dt
    daily = spark.createDataFrame(
        [(dt.datetime(2019, 4, 23) + dt.timedelta(days=i),)
         for i in range(30)], "t timestamp")
    assert temporal_resolution(daily, "t") == "day"
    hourly = spark.createDataFrame(
        [(dt.datetime(2019, 6, 12) + dt.timedelta(hours=i),)
         for i in range(52)], "t timestamp")
    assert temporal_resolution(hourly, "t") == "hour"


def test_structural_type_voting(spark):
    ints = spark.createDataFrame([(str(i),) for i in range(100)], "c string")
    r = infer_structural_types(ints, "c").collect()[0].asDict()
    assert classify_column(r) == "INTEGER"

    # 2% unclean tolerance (profile_types.py:82)
    dirty = spark.createDataFrame(
        [(str(i),) for i in range(99)] + [("oops",)], "c string")
    r = infer_structural_types(dirty, "c").collect()[0].asDict()
    assert classify_column(r) == "INTEGER"

    floats = spark.createDataFrame(
        [(f"{i}.5",) for i in range(50)], "c string")
    r = infer_structural_types(floats, "c").collect()[0].asDict()
    assert classify_column(r) == "FLOAT"

    text = spark.createDataFrame(
        [("some long free text here",)] * 10, "c string")
    r = infer_structural_types(text, "c").collect()[0].asDict()
    assert classify_column(r) == "TEXT"
    assert r["free_text_ratio"] >= 0.5


def test_range_sketch():
    # two well-separated clusters; KMeans k=3 may split one of them
    # (the reference's own check allows 2..3 ranges,
    # tests/test_profile.py:26-38) — no range may straddle the gap
    v = np.concatenate([np.linspace(0, 10, 50), np.linspace(100, 110, 50)])
    ranges = range_sketch_pdf(v)
    assert 2 <= len(ranges) <= 3
    assert not any(r["gte"] <= 10.0 < 100.0 <= r["lte"] for r in ranges)
    assert ranges[0]["gte"] >= 0.0 and ranges[-1]["lte"] <= 110.0
    # KMeans-parity golden case (reference test_profile.py: year column
    # {2014 x n, 2015 x m} → two exact single-value ranges)
    yr = np.array([2014.0] * 5 + [2015.0] * 4)
    assert range_sketch_pdf(yr) == [{"gte": 2014.0, "lte": 2014.0},
                                    {"gte": 2015.0, "lte": 2015.0}]
    # tiny cluster (<10%) dropped
    v2 = np.concatenate([np.linspace(0, 10, 98), np.array([1000.0, 1001.0])])
    r2 = range_sketch_pdf(v2)
    assert all(r["lte"] <= 10.0 for r in r2)
    # degenerate
    assert range_sketch_pdf(np.array([5.0])) == [{"gte": 5.0, "lte": 5.0}]
    assert range_sketch_pdf(np.array([])) == []


# ---------------------------------------------------------------------
# exact percentiles + significant_terms
# ---------------------------------------------------------------------

def test_percentile_profile_exact(spark):
    """PERCENTILE_CONT contract on a hand-checkable series: 1..5,
    p=0.5 -> 3.0, p=0.25 -> 2.0 (linear interpolation on (n-1)p)."""
    from auctus_spark.operators.profiling import percentile_profile
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)],
                               "v double")
    out = {r.p: r.value
           for r in percentile_profile(df, "v",
                                       ps=[0.25, 0.5, 0.9]).collect()}
    assert out[0.5] == 3.0
    assert out[0.25] == 2.0
    assert abs(out[0.9] - 4.6) < 1e-9   # 1 + 0.9*4 = 4.6


def test_percentile_profile_grouped(spark):
    from auctus_spark.operators.profiling import percentile_profile
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)],
        "g string, v double")
    out = {(r.g, r.p): r.value
           for r in percentile_profile(df, "v", ps=[0.5],
                                       by="g").collect()}
    assert out[("a", 0.5)] == 2.0 and out[("b", 0.5)] == 20.0


def test_significant_terms_jlh(spark):
    """Term exclusive to the foreground scores highest; a term with
    identical fg/bg rates is filtered (not positively significant)."""
    from auctus_spark.operators.profiling import significant_terms
    rows = ([(i, "special marker common", "fg") for i in range(4)]
            + [(10 + i, "plain filler common", "bg") for i in range(8)])
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = significant_terms(df, F.col("grp") == "fg", k=5,
                            min_doc_count=2).collect()
    terms = [r.term for r in out]
    assert terms[0] in ("special", "marker")    # fg-exclusive, tied
    assert "common" not in terms                # fg_pct == bg_pct
    by = {r.term: r for r in out}
    # fg-exclusive: fg_pct=1, bg_pct=4/12 -> jlh = (1-1/3)*3 = 2.0
    assert abs(by["special"].jlh - 2.0) < 1e-6
    assert by["special"].df_fg == 4 and by["special"].df_bg == 4


def test_hll_cardinality(spark):
    """Deterministic HLL: estimate within 3% of truth at 20k distinct
    (the paper's 1.04/sqrt(4096) = 1.6% standard error), exact-small
    linear-counting branch fires at tiny cardinalities (and is itself
    m*ln(m/V)), duplicates don't change the sketch, p validated."""
    import math

    from auctus_spark.operators.profiling import hll_cardinality

    big = spark.range(20000).select(
        (F.col("id") * 7 + 13).alias("x"))
    row = hll_cardinality(big, "x").collect()[0]
    assert not row.exact_small
    assert abs(row.estimate - 20000) / 20000 < 0.03
    # duplicates: a value's registers are idempotent under max
    dup = big.union(big).union(big)
    row2 = hll_cardinality(dup, "x").collect()[0]
    assert row2.estimate == row.estimate
    # small range: linear counting, closed form m*ln(m/V)
    small = spark.range(100).select(F.col("id").alias("x"))
    r = hll_cardinality(small, "x").collect()[0]
    assert r.exact_small
    v = 4096 - r.registers_used
    assert r.estimate == 4096.0 * math.log(4096.0 / v)
    assert abs(r.estimate - 100) / 100 < 0.05
    # empty input -> estimate 0 via the linear-counting branch
    empty = spark.range(0).select(F.col("id").alias("x"))
    r0 = hll_cardinality(empty, "x").collect()[0]
    assert r0.estimate == 0.0 and r0.registers_used == 0
    with pytest.raises(ValueError):
        hll_cardinality(big, "x", p=3)


def test_date_histogram(spark):
    """Calendar-aligned buckets; dense axis includes zero-count days;
    min_doc_count filters sparse buckets; bad interval rejected."""
    import datetime as dt

    from auctus_spark.operators.profiling import date_histogram
    rows = [(dt.datetime(2024, 1, 1, 5), ), (dt.datetime(2024, 1, 1, 9),),
            (dt.datetime(2024, 1, 4, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    dense = date_histogram(df, "ts", "day", min_doc_count=0).collect()
    assert [(r.bucket_start.day, r["count"]) for r in dense] \
        == [(1, 2), (2, 0), (3, 0), (4, 1)]
    sparse = date_histogram(df, "ts", "day", min_doc_count=2).collect()
    assert [(r.bucket_start.day, r["count"]) for r in sparse] == [(1, 2)]
    with pytest.raises(ValueError):
        date_histogram(df, "ts", "fortnight")


def test_composite_agg_paging(spark):
    """Cursor paging walks ALL buckets exactly once, tuple-ordered;
    after-cursor is strict; mismatched after keys rejected."""
    from auctus_spark.operators.profiling import composite_agg
    rows = [(a, b) for a in "abc" for b in "xyz" for _ in range(2)]
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    pages, after = [], None
    while True:
        page = composite_agg(df, ["k1", "k2"], size=4,
                             after=after).collect()
        if not page:
            break
        pages += [(r.k1, r.k2, r.doc_count) for r in page]
        after = {"k1": page[-1].k1, "k2": page[-1].k2}
    assert pages == [(a, b, 2) for a in "abc" for b in "xyz"]
    with pytest.raises(ValueError):
        composite_agg(df, ["k1", "k2"], after={"k1": "a"})
    with pytest.raises(ValueError):
        composite_agg(df, [])


def test_rare_terms(spark):
    """Terms with df <= max_doc_count, (df asc, term asc); in-doc
    repeats count once (doc frequency, not collection frequency)."""
    from auctus_spark.operators.profiling import rare_terms
    df = spark.createDataFrame(
        [(1, "common rare1 rare1 rare1"), (2, "common mid"),
         (3, "common mid rare2")], "doc_id long, text string")
    out = [(r.term, r.doc_count) for r in
           rare_terms(df, max_doc_count=2).collect()]
    assert out == [("rare1", 1), ("rare2", 1), ("mid", 2)]


def test_bucket_pipeline(spark):
    """cumulative_sum / derivative (null first) / trailing moving
    average over a hand-built bucket axis."""
    from auctus_spark.operators.profiling import bucket_pipeline
    df = spark.createDataFrame(
        [(1, 10), (2, 4), (3, 0), (4, 6)], "b long, count long")
    out = bucket_pipeline(df, "count", "b", window=3).collect()
    assert [r.cumulative_sum for r in out] == [10, 14, 14, 20]
    assert [r.derivative for r in out] == [None, -6, -4, 6]
    assert [round(r.moving_avg_3, 6) for r in out] \
        == [10.0, 7.0, round(14 / 3, 6), round(10 / 3, 6)]


def test_cms_estimates(spark):
    """Count-min: estimate >= true count ALWAYS (one-sided), exact at
    generous width, monotonically tighter with more hash rows."""
    from auctus_spark.operators.profiling import cms_estimates
    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "v string")
    truth = {"a": 100, "b": 10, "c": 1, "zz": 0}
    wide = {r.key: r.estimate for r in
            cms_estimates(df, "v", list(truth), w=4096, d=4).collect()}
    assert wide == truth                       # no collisions at w=4096
    tight = {r.key: r.estimate for r in
             cms_estimates(df, "v", list(truth), w=4, d=4).collect()}
    assert all(tight[k] >= truth[k] for k in truth)   # one-sided
    d1 = {r.key: r.estimate for r in
          cms_estimates(df, "v", list(truth), w=4, d=1).collect()}
    assert all(tight[k] <= d1[k] for k in truth)      # min over rows
    with pytest.raises(ValueError):
        cms_estimates(df, "v", ["a"], w=0)


def test_bloom_contains(spark):
    """Bloom: NO false negatives ever; tiny filter saturates to
    all-true (the documented failure direction); absent keys answer
    false at sane sizing."""
    from auctus_spark.operators.profiling import bloom_contains
    df = spark.createDataFrame([(f"v{i}",) for i in range(50)],
                               "v string")
    present = [f"v{i}" for i in range(0, 50, 7)]
    absent = ["nope1", "nope2", "nope3"]
    got = {r.key: r.maybe_present for r in
           bloom_contains(df, "v", present + absent,
                          m=4096, k=4).collect()}
    assert all(got[p] for p in present)        # no false negatives
    assert not any(got[a] for a in absent)     # m=4096, n=50: clean
    sat = {r.key: r.maybe_present for r in
           bloom_contains(df, "v", absent, m=2, k=1).collect()}
    assert all(sat.values())                   # saturated filter
    with pytest.raises(ValueError):
        bloom_contains(df, "v", ["a"], m=4096, k=0)


def test_filters_agg(spark):
    """Named match-AND buckets, one scan: doc counts per filter on a
    hand-computed corpus; empty filter bucket reports 0."""
    from auctus_spark.operators.profiling import filters_agg
    df = spark.createDataFrame(
        [(1, "data join x"), (2, "data only"), (3, "join data y"),
         (4, "scan filter"), (5, "filter z")],
        "doc_id long, text string")
    out = {r.bucket: r.doc_count for r in filters_agg(
        df, {"dj": ["data", "join"], "fs": ["filter", "scan"],
             "zz": ["zzz"]}).collect()}
    assert out == {"dj": 2, "fs": 1, "zz": 0}


def test_range_agg(spark):
    """ES range agg: [from, to) half-open, overlapping buckets count
    independently, nulls excluded."""
    from auctus_spark.operators.profiling import range_agg
    df = spark.createDataFrame(
        [(1, 10.0), (2, 50.0), (3, 99.0), (4, 150.0), (5, None)],
        "id long, v double")
    out = {r.bucket: (r.range_from, r.range_to, r.doc_count)
           for r in range_agg(df, "v",
                              [(None, 50.0), (50.0, 100.0),
                               (80.0, None)]).collect()}
    assert out["*-50.0"] == (None, 50.0, 1)       # 10 only (50 excl)
    assert out["50.0-100.0"] == (50.0, 100.0, 2)  # 50, 99
    assert out["80.0-*"] == (80.0, None, 2)       # 99, 150 (overlap)


def test_adjacency_matrix_agg(spark):
    """ES adjacency_matrix: singles + pairwise intersections in one
    scan, empty cells dropped, >100 filters rejected."""
    import pytest as _pytest

    from auctus_spark.operators.profiling import adjacency_matrix_agg
    df = spark.createDataFrame(
        [(1, "data join scan filter"), (2, "data join"),
         (3, "scan filter"), (4, "nothing")],
        "doc_id long, text string")
    out = {r.bucket: r.doc_count for r in adjacency_matrix_agg(
        df, {"dj": ["data", "join"], "fs": ["filter", "scan"],
             "zz": ["zzz"]}).collect()}
    assert out == {"dj": 2, "fs": 2, "dj&fs": 1}
    with _pytest.raises(ValueError):
        adjacency_matrix_agg(df, {f"f{i}": ["x"] for i in range(101)})


def test_histogram_agg_es_formula(spark):
    """ES histogram bucketing: floor((v-offset)/interval)*interval
    + offset — correct for negatives; min_doc_count prunes."""
    from auctus_spark.operators.profiling import histogram_agg
    vals = [-7.0, -0.1, 0.0, 4.9, 5.0, 5.1, 12.0, 12.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)],
                               "v double")
    got = {r["bucket_key"]: r["doc_count"]
           for r in histogram_agg(df, "v", 5.0).collect()}
    assert got == {-10.0: 1, -5.0: 1, 0.0: 2, 5.0: 2, 10.0: 2}
    # offset shifts bucket edges
    got = {r["bucket_key"]: r["doc_count"]
           for r in histogram_agg(df, "v", 5.0, offset=1.0).collect()}
    assert got == {-9.0: 1, -4.0: 2, 1.0: 3, 11.0: 2}
    # min_doc_count prunes sparse buckets
    got = {r["bucket_key"]: r["doc_count"]
           for r in histogram_agg(df, "v", 5.0,
                                  min_doc_count=2).collect()}
    assert got == {0.0: 2, 5.0: 2, 10.0: 2}
    with pytest.raises(ValueError):
        histogram_agg(df, "v", 0.0)


def test_extended_stats_agg_matches_numpy(spark):
    """One-pass moments == numpy population stats; constant column
    clamps variance at exactly 0.0 (no negative epsilon)."""
    from auctus_spark.operators.profiling import extended_stats_agg
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = extended_stats_agg(df, "v", sigma=2.0).collect()[0]
    a = np.array(vals)
    assert r["count"] == 8 and r["min"] == 1.0 and r["max"] == 9.0
    assert r["sum"] == a.sum()
    assert r["avg"] == pytest.approx(a.mean())
    assert r["sum_of_squares"] == (a * a).sum()
    assert r["variance"] == pytest.approx(np.var(a))  # population
    assert r["std_deviation"] == pytest.approx(np.std(a))
    assert r["std_deviation_bound_upper"] == pytest.approx(
        a.mean() + 2 * np.std(a))
    const = spark.createDataFrame([(2.0,)] * 5, "v double")
    rc = extended_stats_agg(const, "v").collect()[0]
    assert rc["variance"] == 0.0 and rc["std_deviation"] == 0.0


def test_top_hits_agg_per_bucket_topk(spark):
    """top_hits: per-bucket top-size by sort desc, ties by tiebreak
    asc; buckets smaller than size emit all rows."""
    from auctus_spark.operators.profiling import top_hits_agg
    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 30.0),
            ("a", 4, 20.0), ("b", 5, 1.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = [(r["bucket"], r["hit_rank"], r["id"])
           for r in top_hits_agg(df, "g", "v", size=2,
                                 tiebreak_col="id").collect()]
    assert got == [("a", 1, 2), ("a", 2, 3), ("b", 1, 5)]
    with pytest.raises(ValueError):
        top_hits_agg(df, "g", "v")


def test_percentile_ranks_agg_cdf(spark):
    """percentile_ranks == empirical CDF x100 (inclusive <=)."""
    from auctus_spark.operators.profiling import percentile_ranks_agg
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 8.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["value"]: r["percentile_rank"]
           for r in percentile_ranks_agg(
               df, "v", [0.5, 3.0, 5.0, 10.0, 99.0]).collect()}
    assert got == {0.5: 0.0, 3.0: 37.5, 5.0: 75.0, 10.0: 100.0,
                   99.0: 100.0}


def test_boxplot_agg_matches_numpy(spark):
    """boxplot quartiles == numpy linear-interpolation percentiles."""
    from auctus_spark.operators.profiling import boxplot_agg
    vals = [float(x) for x in [9, 1, 4, 7, 2, 6, 3, 8, 5]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = boxplot_agg(df, "v").collect()[0]
    a = np.array(vals)
    assert r["min"] == 1.0 and r["max"] == 9.0
    assert r["q1"] == pytest.approx(np.percentile(a, 25))
    assert r["q2"] == pytest.approx(np.percentile(a, 50))
    assert r["q3"] == pytest.approx(np.percentile(a, 75))
    assert r["iqr"] == pytest.approx(np.percentile(a, 75)
                                     - np.percentile(a, 25))


def test_weighted_avg_and_multi_terms_and_stats_bucket(spark):
    from auctus_spark.operators.profiling import (multi_terms_agg,
                                                  stats_bucket,
                                                  weighted_avg_agg)
    rows = [("a", "x", 2.0, 1.0), ("a", "x", 4.0, 3.0),
            ("b", "y", 10.0, None), ("a", None, 5.0, 2.0),
            ("b", "y", 6.0, 2.0)]
    df = spark.createDataFrame(
        rows, "g string, h string, v double, w double")
    wa = weighted_avg_agg(df, "v", "w").collect()[0]
    # (2*1 + 4*3 + 5*2 + 6*2) / (1+3+2+2) = 36/8
    assert wa["weighted_avg"] == pytest.approx(36.0 / 8.0)
    mt = [(r["g"], r["h"], r["doc_count"])
          for r in multi_terms_agg(df, ["g", "h"], size=10).collect()]
    assert mt == [("a", "x", 2), ("b", "y", 2)]  # null key dropped
    sb = stats_bucket(
        multi_terms_agg(df, ["g", "h"], size=10)).collect()[0]
    assert (sb["count"], sb["min"], sb["max"], sb["avg"], sb["sum"]) \
        == (2, 2.0, 2.0, 2.0, 4.0)


def test_geo_bounds_and_centroid(spark):
    from auctus_spark.operators.geo import (geo_bounds_agg,
                                            geo_centroid_agg)
    pts = [(10.0, -20.0), (-5.0, 170.0), (40.0, 3.0), (None, 8.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    b = geo_bounds_agg(df, "lat", "lon").collect()[0]
    assert (b["top_left_lat"], b["top_left_lon"],
            b["bottom_right_lat"], b["bottom_right_lon"]) \
        == (40.0, -20.0, -5.0, 170.0)
    c = geo_centroid_agg(df, "lat", "lon").collect()[0]
    assert c["count"] == 3
    assert c["lat"] == pytest.approx(15.0)
    assert c["lon"] == pytest.approx(51.0)


def test_auto_date_histogram_ladder(spark):
    """Interval ladder: hour fits small targets, day/month picked as
    the target shrinks; counts match date_histogram at the pick."""
    import datetime as dt
    from auctus_spark.operators.profiling import auto_date_histogram
    rows = [(dt.datetime(2024, 3, 1) + dt.timedelta(hours=6 * i),)
            for i in range(20)]          # 5 days, 4 events/day
    df = spark.createDataFrame(rows, "ts timestamp")
    # span = 115 hour-steps (interval picks on SPAN, not non-empty
    # buckets): 120 fits hour, 50 does not
    big = auto_date_histogram(df, "ts", buckets=120).collect()
    assert big[0]["interval"] == "hour" and len(big) == 20
    day = auto_date_histogram(df, "ts", buckets=10).collect()
    assert day[0]["interval"] == "day" and len(day) == 5
    assert all(r["count"] == 4 for r in day)
    wk = auto_date_histogram(df, "ts", buckets=2).collect()
    assert wk[0]["interval"] == "week" and len(wk) <= 2
    # empty input -> empty frame with the contract schema
    empty = spark.createDataFrame([], "ts timestamp")
    assert auto_date_histogram(empty, "ts").count() == 0


def test_bucket_pipeline2_and_bucket_sort(spark):
    """serial_diff lag handling, percent_of_sum sums to 1, z-score
    zero on constant series; bucket_sort sorts/truncates with
    deterministic tie-break and drops null metrics first."""
    from auctus_spark.operators.profiling import (bucket_pipeline2,
                                                  bucket_sort)
    rows = [(1, 10), (2, 30), (3, 20), (4, 40)]
    df = spark.createDataFrame(rows, "bucket_start int, count int")
    out = {r["bucket_start"]: r
           for r in bucket_pipeline2(df, "count", "bucket_start",
                                     lag=2).collect()}
    assert out[1]["serial_diff_2"] is None
    assert out[2]["serial_diff_2"] is None
    assert out[3]["serial_diff_2"] == 10.0
    assert out[4]["serial_diff_2"] == 10.0
    assert sum(r["percent_of_sum"] for r in out.values()) \
        == pytest.approx(1.0)
    mean, sd = 25.0, np.std([10, 30, 20, 40])
    assert out[2]["z_score"] == pytest.approx((30 - mean) / sd)
    const = spark.createDataFrame([(1, 5), (2, 5)],
                                  "bucket_start int, count int")
    zc = bucket_pipeline2(const, "count", "bucket_start").collect()
    assert all(r["z_score"] == 0.0 for r in zc)
    srt = [(r["bucket_start"], r["count"]) for r in
           bucket_sort(df.union(spark.createDataFrame(
               [(5, None)], "bucket_start int, count int")),
               sort_col="count", size=3).collect()]
    assert srt == [(4, 40), (2, 30), (3, 20)]


def test_terms_agg_ordered_by_metric(spark):
    """terms agg with sub-agg ordering: metric desc, bucket asc ties;
    null keys drop; null metric values excluded from the sub-agg."""
    from auctus_spark.operators.profiling import terms_agg_ordered
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", None),
            (None, 99.0), ("c", 2.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = [(r["bucket"], r["doc_count"], r["metric_value"])
           for r in terms_agg_ordered(df, "k", "v").collect()]
    assert got == [("b", 2, 10.0), ("a", 2, 2.0), ("c", 1, 2.0)]
    with pytest.raises(ValueError):
        terms_agg_ordered(df, "k", "v", metric="median")


def test_string_stats_entropy(spark):
    """string_stats: length stats + Shannon entropy (log2) over the
    character distribution of all values, nulls skipped."""
    from auctus_spark.operators.profiling import string_stats_agg
    df = spark.createDataFrame(
        [("aab",), ("b",), (None,)], "s string")
    r = string_stats_agg(df, "s").collect()[0]
    assert r["count"] == 2
    assert r["min_length"] == 1 and r["max_length"] == 3
    assert r["avg_length"] == pytest.approx(2.0)
    # chars: a,a,b,b -> p=0.5 each -> entropy 1 bit
    assert r["entropy"] == pytest.approx(1.0)
    # skewed: aaab -> -(3/4 log2 3/4 + 1/4 log2 1/4)
    df2 = spark.createDataFrame([("aaab",)], "s string")
    r2 = string_stats_agg(df2, "s").collect()[0]
    exp = -(0.75 * np.log2(0.75) + 0.25 * np.log2(0.25))
    assert r2["entropy"] == pytest.approx(exp)


def test_median_absolute_deviation_exact(spark):
    """exact MAD: median(|x - median|), interpolating median."""
    from auctus_spark.operators.profiling import (
        median_absolute_deviation_agg)
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = median_absolute_deviation_agg(df, "v").collect()[0]
    a = np.array(vals)
    med = np.median(a)
    assert r["median"] == pytest.approx(med)
    assert r["mad"] == pytest.approx(np.median(np.abs(a - med)))


def test_t_test_welch_and_pooled(spark):
    """Welch t + Welch-Satterthwaite dof vs closed-form numpy;
    homoscedastic pools variance with dof n1+n2-2."""
    from auctus_spark.operators.profiling import t_test_agg
    a = [2.1, 2.5, 2.3, 2.9, 3.1]
    b = [1.1, 1.5, 1.9, 1.2]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = t_test_agg(df, "v", "g", "a", "b").collect()[0]
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t_exp = (np.mean(a) - np.mean(b)) / np.sqrt(se2)
    dof_exp = se2**2 / ((va / na)**2 / (na - 1)
                        + (vb / nb)**2 / (nb - 1))
    assert r["t_stat"] == pytest.approx(t_exp)
    assert r["dof"] == pytest.approx(dof_exp)
    rp = t_test_agg(df, "v", "g", "a", "b",
                    "homoscedastic").collect()[0]
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    tp = (np.mean(a) - np.mean(b)) / np.sqrt(sp2 * (1/na + 1/nb))
    assert rp["t_stat"] == pytest.approx(tp)
    assert rp["dof"] == na + nb - 2
    with pytest.raises(ValueError):
        t_test_agg(df, "v", "g", "a", "b", "paired")


def test_top_metrics_deterministic_winner(spark):
    """top_metrics size=1: per bucket the metrics of the row sorting
    first on sort_col; ties broken by tiebreak asc."""
    from auctus_spark.operators.profiling import top_metrics_agg
    rows = [("a", 5.0, 1, 10.0), ("a", 5.0, 2, 20.0),
            ("a", 3.0, 3, 30.0), ("b", 1.0, 4, 40.0)]
    df = spark.createDataFrame(
        rows, "g string, s double, id long, m double")
    got = {r["g"]: (r["top_s"], r["top_m"])
           for r in top_metrics_agg(
               df, "g", "s", ["m"], tiebreak_col="id").collect()}
    assert got == {"a": (5.0, 10.0), "b": (1.0, 40.0)}
    asc = {r["g"]: r["top_m"]
           for r in top_metrics_agg(df, "g", "s", ["m"], "id",
                                    descending=False).collect()}
    assert asc["a"] == 30.0


def test_value_count_missing(spark):
    from auctus_spark.operators.profiling import value_count_missing_agg
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (None, "y")], "a int, b string")
    got = {r["field"]: (r["value_count"], r["missing"])
           for r in value_count_missing_agg(df, ["a", "b"]).collect()}
    assert got == {"a": (2, 1), "b": (2, 1)}


def test_date_range_overlapping_buckets(spark):
    """date_range: [from, to) half-open, overlapping ranges count a
    doc once per containing range, open ends allowed."""
    from datetime import datetime
    from auctus_spark.operators.profiling import date_range_agg
    ts = [datetime(2024, 1, 1), datetime(2024, 2, 15),
          datetime(2024, 3, 1), None]
    df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
    ranges = [(None, "2024-02-01"),
              ("2024-01-01", "2024-03-01"),
              ("2024-02-01", None)]
    got = {r["bucket"]: r["doc_count"]
           for r in date_range_agg(df, "ts", ranges).collect()}
    assert got == {"*-2024-02-01": 1,
                   "2024-01-01-2024-03-01": 2,
                   "2024-02-01-*": 2}


def test_rate_agg_calendar_divisor(spark):
    """rate: month bucket divides by that month's day count
    (Feb 2024 = 29, leap-aware)."""
    from datetime import datetime
    from auctus_spark.operators.profiling import rate_agg
    rows = [(datetime(2024, 1, 10), 31.0),
            (datetime(2024, 1, 20), 31.0),
            (datetime(2024, 2, 5), 58.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    got = {r["bucket_start"].month: r["rate_per_day"]
           for r in rate_agg(df, "ts", "v").collect()}
    assert got[1] == pytest.approx(2.0)   # 62 / 31
    assert got[2] == pytest.approx(2.0)   # 58 / 29
    cnt = {r["bucket_start"].month: r["rate_per_day"]
           for r in rate_agg(df, "ts").collect()}
    assert cnt[1] == pytest.approx(2 / 31)
    with pytest.raises(ValueError):
        rate_agg(df, "ts", interval="week")


def test_moving_fn_shift0_window(spark):
    """moving_fn: ES shift=0 window = the `window` buckets strictly
    before the current; empty window -> null."""
    from datetime import datetime
    from auctus_spark.operators.profiling import (bucket_script,
                                                  bucket_selector,
                                                  moving_fn)
    rows = [(datetime(2024, 1, d), float(c))
            for d, c in [(1, 2), (2, 4), (3, 6), (4, 8)]]
    b = spark.createDataFrame(rows, "bucket_start timestamp, count double")
    got = {r["bucket_start"].day: r["moving_avg"]
           for r in moving_fn(b, "count", window=2).collect()}
    assert got[1] is None
    assert got[2] == pytest.approx(2.0)
    assert got[3] == pytest.approx(3.0)     # avg(2, 4)
    assert got[4] == pytest.approx(5.0)     # avg(4, 6)
    with pytest.raises(ValueError):
        moving_fn(b, "count", fn="median")
    # bucket_script arithmetic + bucket_selector (null drops)
    s = bucket_script(moving_fn(b, "count", window=2),
                      "count / moving_avg", "ratio")
    kept = {r["bucket_start"].day
            for r in bucket_selector(s, "ratio > 1.5").collect()}
    assert kept == {2, 3, 4}  # day1 null ratio drops; others 2/1.6


def test_cumulative_cardinality_first_seen(spark):
    from datetime import datetime
    from auctus_spark.operators.profiling import cumulative_cardinality
    rows = [(datetime(2024, 1, 1), 1), (datetime(2024, 1, 1), 2),
            (datetime(2024, 1, 2), 1), (datetime(2024, 1, 3), 3),
            (datetime(2024, 1, 3), 1), (None, 9)]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {r["bucket_start"].day:
           (r["doc_count"], r["new_keys"], r["cumulative_cardinality"])
           for r in cumulative_cardinality(df, "ts", "user_id").collect()}
    assert got == {1: (2, 2, 2), 2: (1, 0, 2), 3: (2, 1, 3)}


def test_matrix_stats_vs_numpy(spark):
    from auctus_spark.operators.profiling import matrix_stats
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (4.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {(r["field_a"], r["field_b"]):
           (r["mean_a"], r["covariance"], r["correlation"])
           for r in matrix_stats(df, ["x", "y"]).collect()}
    # null row drops listwise -> x = [1,2,3], y = [2,4,5]
    x = np.array([1.0, 2.0, 3.0])
    y = np.array([2.0, 4.0, 5.0])
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    corr = cov / (x.std() * y.std())
    assert got[("x", "x")][0] == pytest.approx(x.mean())
    assert got[("x", "x")][1] == pytest.approx(x.var())
    assert got[("x", "y")][1] == pytest.approx(cov)
    assert got[("x", "y")][2] == pytest.approx(corr)
    with pytest.raises(ValueError):
        matrix_stats(df, ["x"])


def test_significant_text_dedups_copies(spark):
    """filter_duplicate_text: 5 pasted copies of a foreground doc
    count once, so the copied term loses its fake significance."""
    from auctus_spark.operators.profiling import (significant_terms,
                                                  significant_text)
    rows = ([(i, "spamword base", "de") for i in range(5)]
            + [(10, "realword base other", "de"),
               (11, "realword base words", "de"),
               (12, "realword base stuff", "de"),
               (20, "base other words", "en"),
               (21, "base stuff things", "en"),
               (22, "base other things", "en")])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    fg = F.col("lang") == "de"
    with_dups = {r["term"] for r in significant_terms(
        df, fg, min_doc_count=3).collect()}
    deduped = {r["term"] for r in significant_text(
        df, fg, min_doc_count=3).collect()}
    assert "spamword" in with_dups       # copies fake df_fg = 5
    assert "spamword" not in deduped     # one survivor < min_doc_count
    assert "realword" in deduped


def test_bigram_logprob_closed_form(spark):
    from auctus_spark.operators.textstats import bigram_logprob
    rows = [(1, "a b a b"), (2, "a b"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_neg_logprob"])
           for r in bigram_logprob(df).collect()}
    # bigrams: d1: ab, ba, ab; d2: ab -> c(ab)=3, c(ba)=1
    # left counts: c1(a)=3 (ab x3), c1(b)=1; V = 3 (a, b, x)
    import math
    p_ab = (3 + 1) / (3 + 1 * 3)
    p_ba = (1 + 1) / (1 + 1 * 3)
    m1 = -(math.log(p_ab) * 2 + math.log(p_ba)) / 3
    assert got[1][0] == 3
    assert got[1][1] == pytest.approx(m1, abs=1e-9)
    assert got[2] == (1, pytest.approx(-math.log(p_ab), abs=1e-9))
    assert got[3][0] == 0 and got[3][1] is None


def test_variable_width_histogram_adapts(spark):
    """VWH: two dense clusters + outlier -> bucket widths adapt;
    keys are exact member means; counts partition the data."""
    from auctus_spark.operators.profiling import variable_width_histogram
    vals = [1.0, 1.1, 1.2, 10.0, 10.1, 10.2, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = variable_width_histogram(df, "v", buckets=3).collect()
    assert len(rows) == 3
    got = [(r["key"], r["min"], r["max"], r["doc_count"])
           for r in rows]
    assert got[0] == (pytest.approx(1.1), 1.0, 1.2, 3)
    assert got[1] == (pytest.approx(10.1), 10.0, 10.2, 3)
    assert got[2] == (100.0, 100.0, 100.0, 1)
    # fewer distinct values than buckets -> k collapses
    tiny = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    assert variable_width_histogram(tiny, "v", buckets=3).count() == 1


def test_categorize_text_templates(spark):
    """categorize_text: digit-bearing tokens mask to <num>, exact
    template grouping, (count desc, category asc) order."""
    from auctus_spark.operators.profiling import categorize_text
    rows = [("user 17 did click",), ("user 9 did click",),
            ("user 17 did purchase",), ("heartbeat OK",)]
    df = spark.createDataFrame(rows, "text string")
    got = [(r["category"], r["doc_count"])
           for r in categorize_text(df, "text").collect()]
    assert got == [("user <num> did click", 2),
                   ("heartbeat ok", 1),
                   ("user <num> did purchase", 1)]
    assert categorize_text(df, "text", k=1).count() == 1


def test_change_point_spike_dip_flat(spark):
    """change_point: MAD-unit robust z-score argmax; spike vs dip
    typing; flat series yields no change point."""
    from auctus_spark.operators.profiling import change_point
    vals = [10.0, 11.0, 10.0, 9.0, 50.0, 10.0, 11.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "b int, v double")
    r = change_point(df, "b", "v").collect()
    assert len(r) == 1
    # median 10, MAD = median(|v-10|) = 1 -> score 40
    assert (r[0]["key"], r[0]["type"], r[0]["score"]) == (4, "spike",
                                                          40.0)
    dip = change_point(
        spark.createDataFrame([(i, v) for i, v in enumerate(
            [10.0, 11.0, 10.0, 9.0, -30.0, 10.0, 11.0])],
            "b int, v double"), "b", "v").collect()[0]
    assert dip["type"] == "dip"
    flat = spark.createDataFrame([(0, 5.0), (1, 5.0), (2, 5.0)],
                                 "b int, v double")
    assert change_point(flat, "b", "v").collect() == []


def test_scripted_metric_map_combine_reduce(spark):
    """scripted_metric: per-partition partial states, per-group
    reduce — sum of squares per group matches the closed form."""
    import pandas as pd
    from auctus_spark.operators.scripted import scripted_metric

    def mc(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("g", as_index=False).agg(
            ss=("v", lambda s: float((s * s).sum())),
            n=("v", "size"))
        return g[["g", "ss", "n"]]

    def red(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [pdf["g"].iloc[0]],
                             "sum_sq": [float(pdf["ss"].sum())],
                             "n": [int(pdf["n"].sum())]})

    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double") \
        .repartition(4)
    got = {r["g"]: (r["sum_sq"], r["n"])
           for r in scripted_metric(
               df, mc, red, ["g"], "g string, ss double, n long",
               "g string, sum_sq double, n long").collect()}
    assert got == {"a": (21.0, 3), "b": (9.0, 1)}


def test_moving_percentiles(spark):
    from auctus_spark.operators.profiling import moving_percentiles
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30, 40, 50])],
        "bucket_start int, n int")
    out = moving_percentiles(b, "n", "bucket_start", window=3,
                             percents=(50.0, 100.0)) \
        .orderBy("bucket_start").collect()
    # shift=0 frame: strictly-before window; first bucket null
    assert out[0].p50 is None
    assert out[1].p50 == 10.0            # window [10]
    assert out[2].p50 == 15.0            # [10,20] -> interpolated
    assert out[3].p50 == 20.0            # [10,20,30]
    assert out[4].p50 == 30.0            # [20,30,40]
    assert out[4].p100 == 40.0


def test_bucket_correlation(spark):
    from auctus_spark.operators.profiling import bucket_correlation
    b = spark.createDataFrame(
        [(1, 2.0), (2, 4.0), (3, 6.0)], "n int, m double")
    assert bucket_correlation(b, "n", "m").first().correlation == 1.0
    b2 = spark.createDataFrame(
        [(1, 6.0), (2, 4.0), (3, 2.0)], "n int, m double")
    assert bucket_correlation(b2, "n", "m").first().correlation == -1.0


def test_bucket_count_ks_test(spark):
    from auctus_spark.operators.profiling import bucket_count_ks_test
    # perfectly uniform counts -> ecdf == uniform cdf -> D == 0
    u = spark.createDataFrame([(i, 5) for i in range(4)],
                              "bucket_start int, n int")
    assert bucket_count_ks_test(u, "n").first().d_statistic == 0.0
    # all mass in the first bucket -> D = 1 - 1/n
    s = spark.createDataFrame([(0, 100), (1, 0), (2, 0), (3, 0)],
                              "bucket_start int, n int")
    assert s.count() == 4
    assert bucket_count_ks_test(s, "n").first().d_statistic == 0.75


def test_downsample_rollup_gauge_and_last(spark):
    """Downsample: hourly gauge summary + last_value (latest ts,
    id-desc tiebreak) — closed-form fixture with a ts tie."""
    from auctus_spark.operators.profiling import downsample_agg
    rows = [
        (1, "2024-01-01 10:05:00", "cpu", 1.0),
        (2, "2024-01-01 10:20:00", "cpu", 5.0),
        (3, "2024-01-01 10:20:00", "cpu", 3.0),   # ts tie: id 3 wins
        (4, "2024-01-01 11:00:00", "cpu", 7.0),
        (5, "2024-01-01 10:30:00", "mem", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r["event_type"], str(r["bucket"])): r
           for r in downsample_agg(df, "ts").collect()}
    cpu10 = out[("cpu", "2024-01-01 10:00:00")]
    assert (cpu10["v_min"], cpu10["v_max"], cpu10["v_sum"],
            cpu10["v_count"], cpu10["v_last"]) == (1.0, 5.0, 9.0, 3, 3.0)
    assert out[("cpu", "2024-01-01 11:00:00")]["v_last"] == 7.0
    assert out[("mem", "2024-01-01 10:30:00".replace("30", "00"))][
        "v_count"] == 1


def test_terms_sharded_error_bound(spark):
    """ES doc_count_error_upper_bound: a term cut by a shard gets
    that shard's smallest returned count added to its bound; a term
    returned by every shard has bound 0."""
    from auctus_spark.operators.profiling import terms_agg_sharded
    # 2 shards via id % 2. shard 0 rows: a,a,a,b,b,c ; shard 1: a,c,c,b
    rows = []
    rid = 0

    def add(shard, key, n):
        nonlocal rid
        for _ in range(n):
            while rid % 2 != shard:
                rid += 1
            rows.append((rid, key))
            rid += 1
    add(0, "a", 3); add(0, "b", 2); add(0, "c", 1)
    add(1, "a", 1); add(1, "c", 2); add(1, "b", 1)
    df = spark.createDataFrame(rows, "rid long, k string")
    out = {r["k"]: (r["doc_count"], r["doc_count_error_upper_bound"])
           for r in terms_agg_sharded(df, "k", shard_col="rid",
                                      n_shards=2, shard_size=2,
                                      size=10).collect()}
    # shard 0 returns top2 (a:3, b:2), last=2; shard 1 top2 (c:2, a:1), last=1
    # a: returned by both -> bound 0, count 4
    # b: cut by shard 1 -> bound 1 (shard 1's last), count 2
    # c: cut by shard 0 -> bound 2 (shard 0's last), count 2
    assert out["a"] == (4, 0)
    assert out["b"] == (2, 1)
    assert out["c"] == (2, 2)


def test_random_sampler_deterministic_estimator(spark):
    """random_sampler: the Knuth-hash sample is partition-invariant
    and the estimate is sampled/p; p=1.0 degenerates to exact."""
    from auctus_spark.operators.profiling import random_sampler_agg
    df = spark.createDataFrame(
        [(i, "k") for i in range(1000)], "doc_id long, lang string")
    full = random_sampler_agg(df, "doc_id", "lang",
                              probability=1.0).collect()[0]
    assert full["sampled_count"] == 1000
    assert full["est_doc_count"] == 1000.0
    s1 = random_sampler_agg(df.repartition(1), "doc_id", "lang",
                            probability=0.25).collect()[0]
    s8 = random_sampler_agg(df.repartition(8), "doc_id", "lang",
                            probability=0.25).collect()[0]
    assert s1 == s8                      # partition-invariant
    assert s1["est_doc_count"] == round(s1["sampled_count"] / 0.25, 6)
    # a 25% sample of 1000 uniform ids lands well inside [150, 350]
    assert 150 <= s1["sampled_count"] <= 350
    with pytest.raises(ValueError):
        random_sampler_agg(df, "doc_id", "lang", probability=0.0)


@pytest.mark.parametrize("seed", [5, 23])
def test_terms_sharded_degenerate_is_exact(spark, seed):
    """Property: with shard_size >= per-shard cardinality nothing is
    cut — every error bound is 0 and merged counts equal the exact
    global groupBy."""
    import random
    from auctus_spark.operators.profiling import terms_agg_sharded
    rnd = random.Random(seed)
    rows = [(i, f"k{rnd.randrange(6)}") for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, k string")
    got = {r["k"]: (r["doc_count"], r["doc_count_error_upper_bound"])
           for r in terms_agg_sharded(df, "k", shard_col="rid",
                                      n_shards=4, shard_size=100,
                                      size=100).collect()}
    exact = {}
    for _, k in rows:
        exact[k] = exact.get(k, 0) + 1
    assert got == {k: (c, 0) for k, c in exact.items()}
