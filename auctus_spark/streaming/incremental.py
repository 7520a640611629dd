"""Incremental index maintenance.

The reference profiles new datasets from an AMQP queue and upserts ES
documents (``profiler/profiler.py:238-434``).  The north rule needs
resumable BATCH; this module adds the streaming analogue on top of the
chunked builder:

- :func:`incremental_update` — batch: tokenize only the chunks whose
  lineage rows are missing (new doc ranges), then re-finalize stats +
  segments.  New docs land in new docID ranges → new chunks → old
  chunks untouched (this is why chunking is by fixed docID range).
- :class:`StreamingIndexer` — Structured Streaming ``foreachBatch``
  wrapper: each micro-batch of new documents is appended through the
  same chunk path, giving exactly-once-per-chunk semantics via the
  lineage table (a replayed batch hits already-committed chunks and
  skips them).

Windowed/watermarked aggregates are demonstrated by
:func:`streaming_event_counts` over the events table (Auctus itself
has no streaming operators — SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import IndexBuilder


def incremental_update(builder: IndexBuilder, new_docs: DataFrame) -> dict:
    """Append new documents (strictly increasing doc_id ranges) to an
    existing index: build missing chunks, refresh global stats and
    segments.  Already-indexed chunks are skipped via lineage."""
    builder.tokenize_chunks(new_docs, resume=True)
    stats = builder.finalize_stats()
    builder.encode_segments(stats["avgdl"])
    builder.finalize_term_stats()
    return stats


class StreamingIndexer:
    """foreachBatch sink: micro-batches of corpus rows → chunked index.

    Stats/segments finalize is deferred to :meth:`finalize` (cheap
    per-batch appends, one consolidation) — the streaming/batch-duality
    pattern: the stream only ever runs stage 1.
    """

    def __init__(self, builder: IndexBuilder):
        self.builder = builder
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.builder.tokenize_chunks(batch_df, resume=True)
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        return (stream_df.writeStream
                .foreachBatch(self)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    def finalize(self) -> dict:
        stats = self.builder.finalize_stats()
        self.builder.encode_segments(stats["avgdl"])
        self.builder.finalize_term_stats()
        return stats


def streaming_event_counts(spark: SparkSession, events_path: str,
                           schema, window: str = "5 minutes",
                           watermark: str = "10 minutes") -> DataFrame:
    """Watermarked windowed aggregation over an event stream — the
    standard late-data-tolerant rollup (counts + value sums per
    event_type per window)."""
    stream = (spark.readStream.format("parquet").schema(schema)
              .load(events_path))
    # parquet may carry TIMESTAMP_NTZ; watermarks need TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("value_sum")))
