"""Index sorting + early termination (ES ``index.sort.field`` /
Lucene ``IndexWriterConfig.setIndexSort``): lay the document table out
pre-sorted by a static field so that queries sorted by that field stop
after reading a file prefix instead of scanning the corpus.

ES writes every segment sorted by the index sort and the collector
early-terminates once ``k`` docs are collected per segment.  The
Spark-native analog:

* **write** (``write_sorted_table``) — ``repartitionByRange`` on the
  sort key (descending) + ``sortWithinPartitions``, one file per range
  slice, plus a tiny JSON manifest of per-file (min, max, rows)
  gathered by ONE column-pruned pass at build time.  Range
  partitioning gives the global invariant the early-termination proof
  needs: every row in file *i* sorts before every row in file *i+1*
  (up to boundary ties).
* **query** (``topk_sorted``) — pick the shortest file prefix whose
  cumulative row count reaches ``k``, then extend it over any
  following file whose ``max`` equals the prefix's boundary ``min``
  (boundary ties can still displace ids at the k-th slot).  Every
  excluded file then has ``max`` strictly below the selected rows'
  minimum, and the selected rows already number ≥ k, so no excluded
  row can enter the top-k — the selection is EXACT, not approximate.
  The scan reads only the selected files (driver-side file pruning,
  the same mechanism as partition pruning) and TakeOrdered cuts k.

At 10^12 docs this turns "sort 100 TB, take 50" into "read the first
range slice(s)"; the manifest is O(files) and lives next to the data.
Ties at file boundaries are handled exactly (see above); nulls sort
last and are excluded like ES's sort-field missing handling.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_sort_manifest.json"


def write_sorted_table(df: DataFrame, path: str, sort_col: str,
                       n_files: int = 8) -> dict:
    """Write ``df`` range-partitioned + sorted DESC by ``sort_col``
    (nulls excluded — a doc without the sort field cannot rank), one
    parquet file per slice, and a per-file (min, max, rows) manifest.
    Returns the manifest."""
    clean = df.where(F.col(sort_col).isNotNull())
    (clean.repartitionByRange(n_files, F.desc(sort_col))
          .sortWithinPartitions(F.desc(sort_col))
          .write.mode("overwrite").parquet(path))
    spark = df.sparkSession
    stats = (spark.read.parquet(path)
             .select(F.col(sort_col).alias("_v"),
                     F.input_file_name().alias("_f"))
             .groupBy("_f")
             .agg(F.min("_v").alias("min"), F.max("_v").alias("max"),
                  F.count(F.lit(1)).alias("rows"))
             .collect())
    # (max desc, min desc) orders equal-max boundary slices correctly
    # (a slice holding only the boundary value must precede the slice
    # whose range continues below it)
    files = sorted(
        ({"file": r["_f"], "min": r["min"], "max": r["max"],
          "rows": r["rows"]} for r in stats),
        key=lambda e: (e["max"], e["min"]), reverse=True)
    manifest = {"sort_col": sort_col, "order": "desc", "files": files}
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(manifest, fh, default=str)
    return manifest


def _select_prefix(files: list[dict], k: int) -> list[dict]:
    """Shortest exact prefix: cover k rows, then absorb boundary
    ties (following files whose max equals the prefix min)."""
    chosen, cum = [], 0
    for e in files:
        if cum < k:
            chosen.append(e)
            cum += e["rows"]
        elif chosen and e["max"] == chosen[-1]["min"]:
            chosen.append(e)
        else:
            break
    return chosen


def topk_sorted(spark: SparkSession, path: str, k: int,
                tie_col: str | None = None,
                select: list[str] | None = None) -> DataFrame:
    """Top-k by the table's index sort, reading only the exact file
    prefix the manifest proves sufficient (early termination).
    ``tie_col`` breaks sort-value ties deterministically (ascending —
    the Lucene doc-order tie-break); boundary ties are included in
    the prefix by construction, so the tie-break never needs rows
    from an unread file."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    sort_col = manifest["sort_col"]
    chosen = _select_prefix(manifest["files"], k)
    if not chosen:
        return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(*[e["file"] for e in chosen])
    if select:
        df = df.select(*select)
    order = [F.desc(sort_col)] + ([F.asc(tie_col)] if tie_col else [])
    return df.orderBy(*order).limit(k)
