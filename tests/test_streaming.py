"""Streaming: incremental index maintenance via foreachBatch (results
identical to a batch build) and watermarked windowed aggregation."""

import math

from auctus_spark.corpus import generate_corpus
from auctus_spark.index.build import IndexBuilder
from auctus_spark.query.bm25 import SearchEngine
from auctus_spark.streaming.incremental import (
    StreamingIndexer,
    incremental_update,
    streaming_event_counts,
)


def _search(spark, d, q):
    eng = SearchEngine(spark, d, term_buckets=4)
    return [(int(r.doc_id), float(r.score))
            for r in eng.search(q).collect()]


def test_incremental_equals_full(spark, tmp_path):
    pdf = generate_corpus(300, min_tokens=20, max_tokens=100, vocab_size=600)
    full_dir = str(tmp_path / "full")
    IndexBuilder(spark, full_dir, doc_bucket=128, chunk_docs=100,
                 term_buckets=4).build(spark.createDataFrame(pdf))

    inc_dir = str(tmp_path / "inc")
    b = IndexBuilder(spark, inc_dir, doc_bucket=128, chunk_docs=100,
                     term_buckets=4)
    b.build(spark.createDataFrame(pdf[pdf.doc_id < 100]))
    incremental_update(b, spark.createDataFrame(pdf[pdf.doc_id >= 100]))
    for q in ["import", "def return"]:
        assert _search(spark, inc_dir, q) == _search(spark, full_dir, q)


def test_streaming_indexer(spark, tmp_path):
    """Micro-batched stream of corpus files → same index as batch."""
    pdf = generate_corpus(200, min_tokens=20, max_tokens=80, vocab_size=400)
    src = str(tmp_path / "src")
    # two parquet files = two ingest units
    spark.createDataFrame(pdf[pdf.doc_id < 100]).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf[pdf.doc_id >= 100]).coalesce(1) \
        .write.mode("append").parquet(src)

    idx_dir = str(tmp_path / "sidx")
    b = IndexBuilder(spark, idx_dir, doc_bucket=64, chunk_docs=100,
                     term_buckets=4)
    indexer = StreamingIndexer(b)
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = indexer.attach(stream, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    stats = indexer.finalize()
    assert stats["n_docs"] == 200

    full_dir = str(tmp_path / "fullb")
    IndexBuilder(spark, full_dir, doc_bucket=64, chunk_docs=100,
                 term_buckets=4).build(spark.createDataFrame(pdf))
    assert _search(spark, idx_dir, "import") == _search(
        spark, full_dir, "import")
    oracle_avg = sum(len(c.split()) for c in pdf.content) / 200
    assert math.isclose(stats["avgdl"], oracle_avg, rel_tol=1e-12)


def test_streaming_event_counts(spark, sf_dir, tmp_path):
    # file-stream source needs a directory
    import shutil
    src = tmp_path / "events_dir"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    agg = streaming_event_counts(spark, str(src), schema)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("evt_counts")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS n FROM evt_counts").collect()[0]
    want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got["n"] == want


def test_streaming_dedup_collapses_duplicates(spark, tmp_path):
    """Streaming exact dedup: duplicated content across files
    collapses to one row per distinct text (state-store dedup)."""
    import shutil
    from auctus_spark.streaming.dedup import streaming_dedup
    src = tmp_path / "docs_stream"
    src.mkdir()
    pdf = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],
        "doc_id long, text string")
    pdf.write.parquet(str(tmp_path / "seed"))
    for f in (tmp_path / "seed").glob("*.parquet"):
        shutil.copy(f, src / f.name)
    schema = spark.read.parquet(str(tmp_path / "seed")).schema
    stream = (spark.readStream.format("parquet").schema(schema)
              .load(str(src)))
    q = (streaming_dedup(stream).writeStream
         .outputMode("append").format("memory")
         .queryName("dedup_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT text, count(*) AS n FROM dedup_out "
                    "GROUP BY text").collect()
    assert {(r["text"], r["n"]) for r in got} == {("alpha", 1),
                                                  ("beta", 1)}
