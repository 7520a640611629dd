"""Pure-Python murmur3 must equal Spark's F.hash exactly — the
term_bucket partition-pruning contract."""

import pandas as pd
from pyspark.sql import functions as F

from auctus_spark.index.spark_hash import spark_hash_string, term_bucket


def test_matches_spark_hash(spark):
    terms = ["", "a", "ab", "abc", "abcd", "abcde", "import", "def",
             "uniq_token_11", "ü", "日本語", "x" * 100, "snake_case_name",
             "getHTTPResponse2", "Z", "\x00", "émigré"]
    df = spark.createDataFrame(pd.DataFrame({"t": terms}))
    rows = df.select("t", F.hash("t").alias("h"),
                     F.pmod(F.hash("t"), F.lit(64)).alias("b")).collect()
    for r in rows:
        assert spark_hash_string(r["t"]) == r["h"], r["t"]
        assert term_bucket(r["t"], 64) == r["b"], r["t"]
