"""Scale-safe sequential row numbering.

``row_number().over(Window.orderBy(...))`` with no partition key is a
single-partition window: every row flows through ONE task — the
classic 100-TB scale-killer.  This module assigns a global 0..N-1
index with per-partition offsets instead (the zipWithIndex
construction, kept in DataFrame land):

1. ``monotonically_increasing_id()`` encodes (partition_id << 33) +
   row-position-within-partition (consecutive from 0 — Spark's
   documented layout since 1.6).
2. One tiny aggregate computes per-partition row counts (map-side
   partial; the shuffle moves #partitions rows).
3. Driver-side prefix sums give each partition an offset; a broadcast
   join + ``offset + (mid & (2^33-1))`` yields the global index.

Rows are numbered in (partition, position) order — identical ordering
to the single-partition ``orderBy(monotonically_increasing_id())``
window it replaces, without the serialization point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1


def sequential_index(df: DataFrame, index_col: str,
                     start: int = 0) -> DataFrame:
    """Add ``index_col`` numbering rows ``start..start+N-1`` in
    (partition, position) order.  No single-partition exchange; cost is
    one extra pass for the per-partition counts.

    The input plan is evaluated TWICE (counts job + downstream action),
    and ``monotonically_increasing_id`` is only stable if partition
    boundaries don't move between the two.  Arbitrary upstream plans
    (nondeterministic sources, AQE-coalesced shuffles) can shift them —
    so pin the evaluation with an eager ``localCheckpoint`` (blocks in
    the block manager, MEMORY_AND_DISK, lineage truncated): both jobs
    read the SAME materialized rows, and misalignment is impossible by
    construction."""
    tmp = df.withColumn("_mid", F.monotonically_increasing_id()) \
            .localCheckpoint(eager=True)
    counts = (tmp.groupBy(F.shiftright("_mid", 33).alias("_pid"))
              .agg(F.count(F.lit(1)).alias("_n"))
              .collect())
    acc = start
    rows = []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        rows.append((int(r["_pid"]), acc))
        acc += int(r["_n"])
    spark = df.sparkSession
    offsets = spark.createDataFrame(rows, "_pid long, _off long")
    out = (tmp.withColumn("_pid", F.shiftright("_mid", 33))
           .join(F.broadcast(offsets), "_pid")
           .withColumn(index_col,
                       (F.col("_off")
                        + F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK)))
                       .cast("long"))
           .drop("_pid", "_mid", "_off"))
    return out
