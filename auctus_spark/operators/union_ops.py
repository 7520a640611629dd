"""Union-search and union-execution operators.

Reference: ``apiserver/apiserver/search/union.py`` (candidate search +
3-gram name similarity + greedy pair matching + union score) and
``lib_augmentation/datamart_augmentation/augmentation.py:627-764``
(union execution: rename right columns, null-fill missing, append).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def name_similarity(str1: str, str2: str) -> float:
    """3-gram multiset Jaccard — EXACT formula of reference
    ``union.py:13-30`` (golden values ``tests/test_search.py:350-370``:
    sim('fridge temperature','temperature') == 0.56)."""
    g1 = (Counter([str1]) if len(str1) < 3 else
          Counter(str1[i:i + 3] for i in range(len(str1) - 2)))
    g2 = (Counter([str2]) if len(str2) < 3 else
          Counter(str2[i:i + 3] for i in range(len(str2) - 2)))
    shared = sum((g1 & g2).values())
    return shared / sum((g1 | g2).values())


def _grams_col(col):
    """array of 3-grams of a string column (whole string when len<3) —
    pure built-ins, stays in codegen."""
    n = F.length(col)
    grams = F.transform(F.sequence(F.lit(1), n - 2),
                        lambda i: F.substring(col, 1, 3).alias("_"))
    # substring with dynamic start: use expr-style transform
    grams = F.transform(F.sequence(F.lit(1), n - 2),
                        lambda i: col.substr(i, F.lit(3)))
    return F.when(n < 3, F.array(col)).otherwise(grams)


def name_similarity_df(pairs: DataFrame, left_col: str = "left_name",
                       right_col: str = "right_name") -> DataFrame:
    """Vectorized multiset-Jaccard over a DataFrame of name pairs.

    Scalable form: explode 3-grams, count per (pair, gram, side),
    multiset intersection = sum(least), union = sum(greatest).  All
    built-ins — no Python in the hot path.
    """
    with_id = pairs.withColumn("_pair_id", F.monotonically_increasing_id())
    g = with_id.select(
        "_pair_id",
        F.explode(F.arrays_zip(
            F.array(F.lit("l"), F.lit("r")),
            F.array(_grams_col(F.col(left_col)),
                    _grams_col(F.col(right_col))))).alias("z"))
    g = g.select("_pair_id", F.col("z")["0"].alias("side"),
                 F.explode(F.col("z")["1"]).alias("gram"))
    counts = (g.groupBy("_pair_id", "gram")
              .agg(F.sum(F.when(F.col("side") == "l", 1).otherwise(0))
                   .alias("cl"),
                   F.sum(F.when(F.col("side") == "r", 1).otherwise(0))
                   .alias("cr")))
    sims = (counts.groupBy("_pair_id")
            .agg((F.sum(F.least("cl", "cr")) /
                  F.sum(F.greatest("cl", "cr"))).alias("similarity")))
    return with_id.join(sims, "_pair_id").drop("_pair_id")


def greedy_best_pairs(sims: pd.DataFrame) -> list[tuple[str, str, float]]:
    """Greedy max-similarity column pairing (reference
    ``union.py:169-189``): sort pairs sim-desc, take pairs whose left
    AND right columns are both unseen; require >= 2 matches upstream.

    Tie order is (similarity desc, left asc, right asc) — the
    reference inherits ES result order for ties, which is
    deployment-dependent; pinning a total order makes the pairing
    deterministic regardless of upstream DataFrame row order (Spark
    ``toPandas`` order is not a contract) and lets an external oracle
    reproduce it."""
    taken_l: set[str] = set()
    taken_r: set[str] = set()
    out = []
    for r in sims.sort_values(["similarity", "left_name", "right_name"],
                              ascending=[False, True, True],
                              kind="stable").itertuples(index=False):
        if r.left_name not in taken_l and r.right_name not in taken_r:
            taken_l.add(r.left_name)
            taken_r.add(r.right_name)
            out.append((r.left_name, r.right_name, float(r.similarity)))
    return out


def union_score(pair_sims: list[float], n_left_columns: int,
                es_score: float = 1.0) -> float:
    """Reference ``union.py:190-198``: (sum of pair sims /
    n_left_columns) * max candidate keyword score."""
    return (sum(pair_sims) / n_left_columns) * es_score


def union_execute(left: DataFrame, right: DataFrame,
                  column_mapping: dict[str, str] | None = None,
                  index_col: str | None = "d3mIndex") -> DataFrame:
    """Union execution (reference ``augmentation.py:627-764``): rename
    right columns per mapping, align by name with null-fill for missing
    columns, append; fresh sequential index column if requested."""
    if column_mapping:
        for r_col, l_col in column_mapping.items():
            right = right.withColumnRenamed(r_col, l_col)
    drop_idx = [c for c in (index_col,) if c and c in left.columns]
    out = left.drop(*drop_idx).unionByName(
        right.drop(*[c for c in drop_idx if c in right.columns]),
        allowMissingColumns=True)
    if index_col:
        # per-partition offset numbering — a bare orderBy window here
        # would serialize the whole union through one task
        from ..ids import sequential_index
        out = sequential_index(out, index_col)
    return out


def interleave_results(results: DataFrame, kind_col: str = "kind",
                       score_col: str = "score", k: int = 50) -> DataFrame:
    """Zip-interleave ranked result sets (reference
    ``search/__init__.py:369-420``: alternate join/union candidates,
    then leftovers, cut to top-k): rank within kind, order by (rank,
    kind), limit k."""
    w = Window.partitionBy(kind_col).orderBy(F.desc(score_col))
    return (results.withColumn("_rank", F.row_number().over(w))
            .orderBy("_rank", kind_col)
            .limit(k)
            .drop("_rank"))
