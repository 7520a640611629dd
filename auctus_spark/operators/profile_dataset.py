"""Dataset profiling: assemble the full metadata document for a table.

Reference: ``datamart_profiler.process_dataset``
(``lib_profiler/datamart_profiler/core.py:524-990``) builds one JSON
document per dataset — column profiles (structural/semantic types,
mean/stddev, coverage ranges), dataset-type counts, attribute
keywords, temporal/spatial coverage, row counts, sample — which the
indexer writes to ES (``common.py:451-467``).

Here: one Spark job per column batch (a single pass computes the
regex-voting ratios, numeric stats and distinct counts for ALL columns
at once via conditional aggregation), plus the coverage sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import expand_identifier
from . import profiling
from .geo import bounding_box_merge, pair_latlong_columns, valid_latlong


def profile_dataset(df: DataFrame, sample_rows: int = 20,
                    max_range_rows: int = 100_000) -> dict:
    """→ metadata document (dict) mirroring the reference's shape:
    {nb_rows, nb_columns, nb_*_columns, types, attribute_keywords,
    columns: [{name, structural_type, semantic_types, ...}],
    spatial_coverage, sample}."""
    nb_rows = df.count()
    cols = df.columns
    dtypes = dict(df.dtypes)

    # one pass: per-column aggregates for every column
    aggs = []
    for c in cols:
        col = F.col(c)
        s = col.cast("string")
        nonempty = F.count(F.when(s.isNotNull() & (s != ""), 1))
        aggs += [
            nonempty.alias(f"{c}__n"),
            F.count_distinct(col).alias(f"{c}__distinct"),
            (F.count(F.when(s.rlike(r"^[+-]?[0-9]+$"), 1)))
            .alias(f"{c}__int"),
            (F.count(F.when(s.rlike(
                r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"),
                1))).alias(f"{c}__float"),
            (F.count(F.when(F.size(F.split(s, r"\s+")) >=
                            profiling.FREE_TEXT_MIN_WORDS, 1)))
            .alias(f"{c}__freetext"),
            # cast the STRING form: always a legal cast (timestamp →
            # double is not), null for non-numeric text, identical
            # values for numeric columns
            F.avg(F.when(s.rlike(
                r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"),
                s.cast("double"))).alias(f"{c}__mean"),
            F.stddev_pop(F.when(s.rlike(
                r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"),
                s.cast("double"))).alias(f"{c}__std"),
        ]
    row = df.agg(*aggs).collect()[0]

    latlong_pairs = pair_latlong_columns(cols)
    latlong_cols = {c for p in latlong_pairs for c in p}

    columns_meta = []
    kinds = []
    for i, c in enumerate(cols):
        n = row[f"{c}__n"] or 0
        tol = (1.0 - profiling.MAX_UNCLEAN) * n
        dtype = dtypes[c]
        if n == 0:
            structural = "MISSING_DATA"
        elif dtype in ("int", "bigint", "smallint", "tinyint") \
                or row[f"{c}__int"] >= tol:
            structural = "INTEGER"
        elif dtype in ("double", "float") or dtype.startswith("decimal") \
                or row[f"{c}__float"] >= tol:
            structural = "FLOAT"
        else:
            structural = "TEXT"
        semantic = []
        if c in latlong_cols and structural == "FLOAT":
            is_lat = any(c == p[0] for p in latlong_pairs)
            semantic.append("LATITUDE" if is_lat else "LONGITUDE")
            kinds.append("spatial")
        elif dtype.startswith("timestamp") or dtype == "date":
            structural = "TEXT"
            semantic.append("DATE_TIME")
            kinds.append("temporal")
        elif structural in ("INTEGER", "FLOAT"):
            kinds.append("numerical")
        elif n and row[f"{c}__freetext"] / n >= 0.5:
            # free text (>=4 words on >=50% rows) wins over the
            # categorical ratio — reference profile_types.py:84-92
            semantic.append("TEXT")
            kinds.append("categorical")
        elif n and (row[f"{c}__distinct"] / n
                    <= profiling.CATEGORICAL_RATIO):
            semantic.append("CATEGORICAL")
            kinds.append("categorical")
        else:
            kinds.append("categorical")
        meta = {
            "name": c,
            "structural_type": structural,
            "semantic_types": semantic,
            "num_distinct_values": int(row[f"{c}__distinct"] or 0),
        }
        if structural in ("INTEGER", "FLOAT") \
                and row[f"{c}__mean"] is not None:
            meta["mean"] = float(row[f"{c}__mean"])
            meta["stddev"] = float(row[f"{c}__std"] or 0.0)
            meta["coverage"] = profiling.range_sketch(
                df, c, sample_cap=max_range_rows,
                # nb_rows already counted this df: same n, same sample
                # fraction, identical sketch, one job saved per column
                n_rows=nb_rows)
        columns_meta.append(meta)

    # temporal coverage + resolution per datetime column
    temporal_coverage = []
    for c in cols:
        if dtypes[c].startswith("timestamp") or dtypes[c] == "date":
            res = profiling.temporal_resolution(df, c)
            mm = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")) \
                .collect()[0]
            temporal_coverage.append({
                "column": c, "temporal_resolution": res,
                "ranges": [{"gte": str(mm["lo"]), "lte": str(mm["hi"])}]})

    spatial_coverage = []
    for lat_c, lon_c in latlong_pairs:
        if df.filter(valid_latlong(F.col(lat_c), F.col(lon_c))).head(1):
            from .geo import spatial_ranges
            spatial_coverage.append(
                {"lat": lat_c, "lon": lon_c,
                 # per-cluster KMeans boxes (reference
                 # spatial.py:49-106), plus the merged bbox the
                 # search-side overlap scorer consumes
                 "ranges": spatial_ranges(df, lat_c, lon_c),
                 "bounding_box": bounding_box_merge(df, lat_c, lon_c)})

    # attribute keywords: expanded column names (reference
    # core.py:965-972)
    keywords = []
    for c in cols:
        keywords.append(c)
        keywords.extend(k for k in expand_identifier(c) if k != c.lower())

    counts = {f"nb_{k}_columns": kinds.count(k)
              for k in ("numerical", "categorical", "spatial", "temporal")}
    types = sorted({k for k in kinds if counts[f"nb_{k}_columns"] > 0})

    sample = df.limit(sample_rows).toPandas().to_csv(index=False)
    return {
        "nb_rows": int(nb_rows),
        "nb_columns": len(cols),
        **counts,
        "types": types,
        "attribute_keywords": keywords,
        "columns": columns_meta,
        "temporal_coverage": temporal_coverage,
        "spatial_coverage": spatial_coverage,
        "sample": sample,
    }
