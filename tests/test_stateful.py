"""Stateful streaming sessionizer (applyInPandasWithState)."""

import datetime as dt

from auctus_spark.analysis import load_synonyms
from auctus_spark.streaming.stateful import sessionize_stateful


def test_sessionize_stateful(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions separated by 2h
        (1, base, 1.0), (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(hours=2), 5.0),
        # user 2: one session
        (2, base, 7.0), (2, base + dt.timedelta(minutes=5), 1.0),
    ]
    src = tmp_path / "stream"
    src.mkdir()
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(str(src))

    from pyspark.sql import functions as F
    stream = (spark.readStream.schema(df.schema).parquet(str(src))
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize_stateful(stream, gap_minutes=30)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_start").collect()
    # only CLOSED sessions emit: user 1's first session closed when the
    # 2h-later event arrived in the same batch; open sessions stay in
    # state awaiting timeout
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 1 and s.n_events == 2 and s.value_sum == 3.0
    assert (s.session_end - s.session_start) == dt.timedelta(minutes=10)


def test_load_synonyms(tmp_path):
    p = tmp_path / "syn.txt"
    p.write_text("# comment\n\ncolour, color\ngray, grey\nusa => united, states\n")
    syn = load_synonyms(str(p))
    assert syn["colour"] == ["color"] and syn["color"] == ["colour"]
    assert syn["usa"] == ["united", "states"]
    from auctus_spark.analysis import analyze_query
    assert analyze_query("Colour", syn) == ["colour", "color"]
