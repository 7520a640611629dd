"""Streaming exact deduplication — Structured Streaming state-store
dedup for a continuously-arriving document feed (the online twin of
``operators.dedup.exact_dedup``).

Two modes, both pure built-ins (no custom state handler needed —
Spark's dropDuplicates family keeps the seen-key set in the state
store, checkpointed and recoverable):

* **bounded state** (``ts_col`` + ``watermark`` given):
  ``dropDuplicatesWithinWatermark`` — duplicate keys arriving within
  the watermark horizon collapse to the first arrival, and state for
  keys older than the watermark is evicted, so state size is bounded
  by the horizon's key cardinality.  This is the production shape for
  an unbounded crawl feed.
* **exact-forever** (no ts): plain ``dropDuplicates`` on the key —
  state grows with distinct keys; correct for bounded backfills,
  documented as such.

The dedup key is md5(text) (or any caller column set) computed INSIDE
the stream — content-addressed like the batch operator, so batch and
streaming dedup agree on what counts as a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(stream: DataFrame, text_col: str = "text",
                    ts_col: str | None = None,
                    watermark: str = "10 minutes") -> DataFrame:
    """Deduplicate a streaming DataFrame by content hash.  With
    ``ts_col`` the state is watermark-bounded
    (``dropDuplicatesWithinWatermark``); without, exact-forever
    ``dropDuplicates`` (bounded backfills only — documented)."""
    hashed = stream.withColumn("_text_hash", F.md5(F.col(text_col)))
    if ts_col is not None:
        w = (hashed.withColumn(ts_col,
                               F.col(ts_col).cast("timestamp"))
             .withWatermark(ts_col, watermark))
        return w.dropDuplicatesWithinWatermark(["_text_hash"])
    return hashed.dropDuplicates(["_text_hash"])
