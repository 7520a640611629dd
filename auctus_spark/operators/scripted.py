"""ES ``scripted_metric`` aggregation, Spark-first: user-defined
map / combine / reduce over bucketed data.

ES's contract is four scripts: init (per shard), map (per doc),
combine (per shard → one partial state), reduce (all partial states
→ the result).  The honest Spark rendering keeps the SAME two-level
shape — it is exactly a map-side combine:

* **map+combine** runs per PARTITION via ``mapInPandas`` (Arrow
  batches, never per-row Python): the caller's ``map_combine``
  turns a partition's rows into a few partial-state rows keyed by
  the group columns.  This is ES's init+map+combine fused — partial
  states are tiny, so the shuffle moves states, not rows.
* **reduce** runs per GROUP via ``applyInPandas`` over the shuffled
  partial states: the caller's ``reduce_fn`` folds all partials of
  one group into the final metric row(s).

Only the partial states cross the wire — the same reason ES ships
combine output, not map output, from each shard.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def scripted_metric(df: DataFrame,
                    map_combine: Callable[[pd.DataFrame],
                                          pd.DataFrame],
                    reduce_fn: Callable[[pd.DataFrame],
                                        pd.DataFrame],
                    group_cols: list[str],
                    partial_schema: str,
                    result_schema: str) -> DataFrame:
    """Run a scripted metric: ``map_combine(pdf) -> partial states``
    (must include ``group_cols``), then per-group
    ``reduce_fn(partials) -> result rows``.  Both callables receive
    and return pandas DataFrames; both run executor-side.

    The caller's contract (ES's too): partial states must be
    mergeable — ``reduce_fn`` sees an arbitrary partition-order
    concatenation of partials, so the fold must be commutative and
    associative (sums, mins, heaps — not order-sensitive state)."""
    def _map(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield map_combine(pdf)

    partials = df.mapInPandas(_map, schema=partial_schema)
    return (partials.groupBy(*group_cols)
            .applyInPandas(lambda pdf: reduce_fn(pdf),
                           schema=result_schema))
