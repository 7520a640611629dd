"""Join operators: augmentation-join execution and index-side
candidate-scoring joins.

Reference: ``lib_augmentation/datamart_augmentation/augmentation.py``
(equi-join with key normalization :93-131, temporal-resolution
alignment :134-231, post-join fan-in aggregation :250-336, 562-567) and
``apiserver/apiserver/search/join.py`` (range-overlap candidate scoring
:150-252, :361-459; spatial box overlap :255-358).

The reference streams pandas chunks of 10k rows; here each operator is
one declarative join Spark executes broadcast/sort-merge as it sees fit
(AQE handles skew), and the chunk loop disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reference temporal.py:15-33 — aggregation keys year..second; priority
# coarse→fine per augmentation.py:58-61
TEMPORAL_PRIORITY = ["year", "quarter", "month", "week", "day",
                     "hour", "minute", "second"]


def normalize_join_key(df: DataFrame, col: str, kind: str) -> DataFrame:
    """Key normalization before joining (reference set_data_index,
    augmentation.py:93-131): datetime→timestamp, numbers→double,
    text→lowercase."""
    if kind == "temporal":
        return df.withColumn(col, F.to_timestamp(F.col(col)))
    if kind == "numerical":
        return df.withColumn(col, F.col(col).cast("double"))
    return df.withColumn(col, F.lower(F.col(col).cast("string")))


def truncate_to_resolution(col, resolution: str):
    """date_trunc with the reference's week-start mapping
    (temporal.py:24-28 snaps to the previous Sunday... dateutil weeks
    start Monday in pandas; the reference uses ISO weeks via
    ``dt.to_period('W')`` → Monday).  Spark date_trunc('week') is also
    Monday-based — aligned."""
    return F.date_trunc(resolution, col)


def temporal_aligned_join(left: DataFrame, right: DataFrame,
                          left_on: str, right_on: str,
                          left_res: str, right_res: str,
                          how: str = "left") -> DataFrame:
    """Cross-resolution temporal join (reference augmentation.py:
    134-231): truncate the finer side to the coarser side's resolution,
    then equi-join on the truncated key."""
    coarse = min(left_res, right_res, key=TEMPORAL_PRIORITY.index)
    lk = truncate_to_resolution(F.to_timestamp(F.col(left_on)), coarse)
    rk = truncate_to_resolution(F.to_timestamp(F.col(right_on)), coarse)
    lt = left.withColumn("_jk", lk)
    rt = right.withColumn("_jk", rk)
    return lt.join(rt.drop(right_on) if right_on in lt.columns else rt,
                   "_jk", how).drop("_jk")


AGG_FUNCTIONS = {
    "first": F.first,
    "mean": F.avg,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "count": F.count,
}


def _null_preserving_sum(col: str):
    """Reference ``augmentation.py:239-247``: sum of an all-null group
    is null, not 0."""
    return F.when(F.count(F.col(col)) > 0, F.sum(F.col(col)))


def augment_join(left: DataFrame, right: DataFrame, on: list[str],
                 how: str = "left",
                 agg_columns: dict[str, list[str]] | None = None,
                 keep_columns: list[str] | None = None) -> DataFrame:
    """Augmentation join (reference augmentation.py:376-547):

    1. tag every left row with a unique key (reference UNIQUE_INDEX_KEY,
       :463) so fan-out from 1:N matches can be folded back;
    2. equi-join on the normalized keys (how='left' default, :380);
    3. aggregate right-side columns per original left row — numeric
       columns get mean/sum/max/min (or the caller's list from
       first/mean/sum/max/min/count), non-numeric get first (:250-336);
    4. conflict columns renamed with ``_r`` suffix (:536-559).
    """
    uid = "_unique_index_key"
    rord = "_right_order"
    lt = left.withColumn(uid, F.monotonically_increasing_id())
    # rename right-side conflicts (other than join keys)
    for c in right.columns:
        if c in left.columns and c not in on:
            right = right.withColumnRenamed(c, c + "_r")
    # right-side order id makes 'first' deterministic (the reference's
    # pandas join preserves right order; Spark's F.first does not)
    right = right.withColumn(rord, F.monotonically_increasing_id())
    joined = lt.join(right, on, how)

    right_cols = [c for c in joined.columns
                  if c not in lt.columns and c not in on and c != rord]
    if keep_columns is not None:
        right_cols = [c for c in right_cols if c in keep_columns]
    numeric_types = ("int", "bigint", "double", "float", "decimal",
                     "smallint", "tinyint", "long")
    aggs = []
    for c in right_cols:
        dtype = dict(joined.dtypes)[c]
        is_num = any(dtype.startswith(t) for t in numeric_types)
        wanted = (agg_columns or {}).get(
            c, ["mean", "sum", "max", "min"] if is_num else ["first"])
        for a in wanted:
            name = f"{a}_{c}" if len(wanted) > 1 else c
            if a == "sum" and is_num:
                aggs.append(_null_preserving_sum(c).alias(name))
            elif a == "first":
                aggs.append(F.min_by(c, rord).alias(name))
            else:
                aggs.append(AGG_FUNCTIONS[a](c).alias(name))
    left_keep = [c for c in lt.columns if c != uid]
    out = (joined.groupBy(uid)
           .agg(*[F.first(c).alias(c) for c in left_keep], *aggs)
           .drop(uid))
    return out


# ---------------------------------------------------------------------
# index-side candidate scoring joins (search/join.py)
# ---------------------------------------------------------------------

def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """As-of join (Spark has no native one): for each left row, the
    latest right row with ``right_ts <= left_ts`` per key.

    Scalable union+window formulation — NOT a range join: tag sides,
    union, one window sort per key with ``last(value, ignorenulls)``
    running fill, keep left rows.  One shuffle on the key, no
    candidate blowup, works at any key cardinality.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    lt = left.withColumn("_side", F.lit(1)) \
             .withColumn("_ts", F.col(left_ts).cast("timestamp"))
    rt = right.select(
        F.col(on), F.col(right_ts).cast("timestamp").alias("_ts"),
        *[F.col(c) for c in value_cols]).withColumn("_side", F.lit(0))
    for c in value_cols:
        rt = rt.withColumnRenamed(c, c + suffix)
        lt = lt.withColumn(c + suffix, F.lit(None).cast(
            dict(rt.dtypes)[c + suffix]))
    rt = rt.withColumn(right_ts + suffix, F.col("_ts"))
    lt = lt.withColumn(right_ts + suffix,
                       F.lit(None).cast("timestamp"))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy(F.asc("_ts"), F.asc("_side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = [F.last(c + suffix, ignorenulls=True).over(w)
              .alias(c + suffix) for c in value_cols + [right_ts]]
    keep = [c for c in lt.columns
            if c not in ("_side", "_ts")
            and not c.endswith(suffix)]
    return (u.select(*keep, F.col("_side"), *filled)
            .filter(F.col("_side") == 1).drop("_side"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.  lag +
    conditional cumsum — one shuffle on user."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col))
    gap = (F.unix_timestamp(F.col(ts_col))
           - F.unix_timestamp(F.lag(ts_col).over(w)))
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1) \
        .otherwise(0)
    return (events
            .withColumn("_new", new_sess)
            .withColumn("session_id",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("_new"))


SCORE_MODES = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}


def script_score_join(candidates: DataFrame, query_rows: DataFrame,
                      match, script, score_mode: str = "sum",
                      cand_id: str = "cand_id",
                      weight: float | None = None) -> DataFrame:
    """Generic ES ``function_score``/``script_score`` surface — the
    scoring shape every reference join-candidate search instantiates
    (join.py:176-252 numerical, :302-358 spatial, :420-459 temporal):

    - ``query_rows`` are broadcast: each row is one nested query
      clause and supplies the painless script's ``params``;
    - ``match`` (Column predicate) is the ES query clause (e.g. range
      ``relation: intersects``) — only matching pairs are scored;
    - ``script`` (Column expression over candidate + query columns)
      is the painless source with ``boost_mode: replace``: its value
      IS the pair score;
    - ``score_mode`` folds the pair scores per candidate (ES nested
      score_mode: sum/max/min/avg);
    - ``weight`` multiplies the folded score (outer function_score
      ``functions: [{weight}]`` with ``boost_mode: multiply``).

    One broadcast join + one aggregation; candidates never shuffle
    more than once, so a new scoring formula is a pair of expressions,
    not a new operator.
    """
    j = candidates.join(F.broadcast(query_rows), match)
    out = j.groupBy(cand_id).agg(
        SCORE_MODES[score_mode](script).alias("score"))
    if weight is not None:
        out = out.withColumn("score", F.col("score") * F.lit(weight))
    return out.orderBy(F.desc("score"), F.asc(cand_id))


def range_overlap_score(candidates: DataFrame, query_ranges: DataFrame,
                        cand_id: str = "cand_id") -> DataFrame:
    """Numerical/temporal coverage scoring (reference join.py:150-252)
    as a ``script_score_join`` instance: nested range query with
    ``relation: intersects``; painless score
    ``(min(lte) - max(gte) + 1) / total_query_coverage`` summed over
    query ranges, ``boost_mode: replace``.

    candidates: (cand_id, gte, lte);  query_ranges: (q_gte, q_lte).
    """
    total = query_ranges.agg(
        F.sum(F.col("q_lte") - F.col("q_gte") + 1).alias("t")).collect()[0]
    total_q = float(total["t"])
    match = ((F.col("q_gte") <= F.col("lte"))
             & (F.col("q_lte") >= F.col("gte")))
    script = ((F.least(F.col("lte"), F.col("q_lte"))
               - F.greatest(F.col("gte"), F.col("q_gte")) + 1)
              / F.lit(total_q))
    return script_score_join(candidates, query_ranges, match, script,
                             "sum", cand_id)


def spatial_overlap_score(candidates: DataFrame, query_boxes: DataFrame,
                          cand_id: str = "cand_id") -> DataFrame:
    """Spatial intersection scoring (reference join.py:255-358) as a
    ``script_score_join`` instance: geo_shape envelope intersects +
    intersection-area / query-area.

    candidates: (cand_id, min_lon, min_lat, max_lon, max_lat);
    query_boxes: (q_min_lon, q_min_lat, q_max_lon, q_max_lat).
    """
    inter_w = (F.least("max_lon", "q_max_lon")
               - F.greatest("min_lon", "q_min_lon"))
    inter_h = (F.least("max_lat", "q_max_lat")
               - F.greatest("min_lat", "q_min_lat"))
    q_area = ((F.col("q_max_lon") - F.col("q_min_lon"))
              * (F.col("q_max_lat") - F.col("q_min_lat")))
    match = ((F.col("min_lon") < F.col("q_max_lon"))
             & (F.col("max_lon") > F.col("q_min_lon"))
             & (F.col("min_lat") < F.col("q_max_lat"))
             & (F.col("max_lat") > F.col("q_min_lat")))
    return script_score_join(candidates, query_boxes, match,
                             (inter_w * inter_h) / q_area, "sum", cand_id)


def spatial_nearest_join(left: DataFrame, right: DataFrame,
                         l_lat: str, l_lon: str, r_lat: str, r_lon: str,
                         max_dist: float, grid: float | None = None
                         ) -> DataFrame:
    """Spatial nearest-neighbor join (reference augmentation.py:342-370,
    413-447: KD-tree snap to nearest left point within
    2*median_smallest_distance).  Spark-first: grid-bucket both sides
    (cell = max_dist so a point's NN within max_dist lies in the 3x3
    neighborhood), join on neighboring cells, window-min distance per
    right row."""
    grid = grid or max_dist
    lt = left.select(
        F.col(l_lat).alias("_llat"), F.col(l_lon).alias("_llon"),
        *[c for c in left.columns if c not in (l_lat, l_lon)])
    lt = lt.withColumn("_cx", F.floor(F.col("_llon") / grid)) \
           .withColumn("_cy", F.floor(F.col("_llat") / grid))
    # replicate left points into their 3x3 neighborhood
    lt = (lt.withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in
                                                   (-1, 0, 1)])))
            .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in
                                                   (-1, 0, 1)])))
            .withColumn("_cx", F.col("_cx") + F.col("_dx"))
            .withColumn("_cy", F.col("_cy") + F.col("_dy"))
            .drop("_dx", "_dy"))
    rt = right.withColumn("_cx", F.floor(F.col(r_lon) / grid)) \
              .withColumn("_cy", F.floor(F.col(r_lat) / grid)) \
              .withColumn("_rid", F.monotonically_increasing_id())
    j = rt.join(lt, ["_cx", "_cy"])
    dist = F.sqrt((F.col("_llat") - F.col(r_lat)) ** 2
                  + (F.col("_llon") - F.col(r_lon)) ** 2)
    j = j.withColumn("_dist", dist).filter(F.col("_dist") <= max_dist)
    w = Window.partitionBy("_rid").orderBy(F.asc("_dist"), F.asc("_llat"),
                                           F.asc("_llon"))
    return (j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_cx", "_cy", "_rn", "_rid"))
