"""Augmentation dispatcher — the reference's ``augment`` entry point
(``lib_core/datamart_core/augment.py:11-63``; HTTP surface
``apiserver/apiserver/augment.py:54-243``): given a search-result task
(a join or union candidate with its column pairs), execute the
corresponding data-side operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .joins import augment_join, normalize_join_key, temporal_aligned_join
from .union_ops import union_execute


def augment(left: DataFrame, right: DataFrame, task: dict) -> DataFrame:
    """task = {
        "type": "join" | "union",
        "left_columns": [...], "right_columns": [...],   # aligned pairs
        "key_kinds": {col: "text"|"numerical"|"temporal"},  # join only
        "temporal_resolution": (left_res, right_res) | None,
        "agg_columns": {col: [fn,...]} | None,
        "keep_columns": [...] | None,
      }
    """
    kind = task.get("type", "join")
    lcols = list(task.get("left_columns", []))
    rcols = list(task.get("right_columns", []))
    if kind == "union":
        mapping = dict(zip(rcols, lcols))
        return union_execute(left, right, column_mapping=mapping)
    if kind != "join":
        raise ValueError(f"unknown augmentation type: {kind}")

    key_kinds = task.get("key_kinds", {})
    res = task.get("temporal_resolution")
    # temporal single-key join with resolution alignment
    if res and len(lcols) == 1:
        return temporal_aligned_join(
            left, right, lcols[0], rcols[0], res[0], res[1])
    # normalize keys on both sides, rename right keys to match left
    for lc, rc in zip(lcols, rcols):
        kind_ = key_kinds.get(lc, "text")
        left = normalize_join_key(left, lc, kind_)
        right = normalize_join_key(right, rc, kind_)
        if rc != lc:
            right = right.withColumnRenamed(rc, lc)
    return augment_join(left, right, lcols,
                        agg_columns=task.get("agg_columns"),
                        keep_columns=task.get("keep_columns"))
