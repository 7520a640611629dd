"""Offline broadcast-gazetteer admin-area resolver.

The reference resolves address/admin-name columns through external
services plus a bundled admin-area database (datamart_profiler/
spatial.py:211-403 for Nominatim HTTP, profile_types.py:264-275 for
the 70%-resolved admin-column rule, spatial.py:333-403 for
``disambiguate_admin_areas``).  The HTTP part is out of scope here;
this module is the offline path: a gazetteer TABLE (name → area id,
admin level, parent chain, bounding box) broadcast-joined against the
column's distinct values, then the reference's disambiguation rule —
pick one admin level and, when consistent, one common parent area —
applied with the same constants (70% resolution, 10% wrong-level
tolerance, threshold ``max(3, 0.9·n)``, 90-char address cap).

Scale: the gazetteer is a dimension table (real-world admin areas are
~10⁵ rows) — always broadcast; the only wide operation is a distinct
over the input column.  Disambiguation aggregates a tiny
(level, parent) option table; the chosen option is a driver scalar,
matching the reference's own in-memory Counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_ADDRESS_LENGTH = 90     # reference spatial.py:30
MAX_WRONG_LEVEL_ADMIN = 0.10  # reference spatial.py:38
MIN_RESOLVED_FRACTION = 0.70  # reference profile_types.py:267

# Deterministic synthetic bounding boxes (closed-form in the keys so
# external oracles can recompute them): region r spans 24° of latitude
# starting at 10r−60 and 44° of longitude starting at 20r−150; nation
# n (j = n div 5 within its region) gets the j-th 4°×8° sub-box.
_REGION_LAT0, _REGION_LAT_SPAN = -60.0, 24.0
_REGION_LON0, _REGION_LON_SPAN = -150.0, 44.0


def build_gazetteer(nation: DataFrame, region: DataFrame) -> DataFrame:
    """(nation, region) → gazetteer rows:
    ``(name, area_id, level, parent_id, parent_level, min_lat,
    max_lat, min_lon, max_lon)``.

    Regions are level 0 (no parent), nations level 1 under their
    region.  ``area_id``: region r → r, nation n → 100 + n.  Names
    are lowercased — the resolver joins on lowercase trimmed input.
    """
    r = (region.select(
        F.lower(F.trim("r_name")).alias("name"),
        F.col("r_regionkey").cast("long").alias("area_id"),
        F.lit(0).alias("level"),
        F.lit(None).cast("long").alias("parent_id"),
        F.lit(None).cast("int").alias("parent_level"),
        (10.0 * F.col("r_regionkey") + _REGION_LAT0).alias("min_lat"),
        (10.0 * F.col("r_regionkey") + _REGION_LAT0
         + _REGION_LAT_SPAN).alias("max_lat"),
        (20.0 * F.col("r_regionkey") + _REGION_LON0).alias("min_lon"),
        (20.0 * F.col("r_regionkey") + _REGION_LON0
         + _REGION_LON_SPAN).alias("max_lon")))
    j = F.floor(F.col("n_nationkey") / 5)
    lat0 = 10.0 * F.col("n_regionkey") + _REGION_LAT0 + 4.0 * j
    lon0 = 20.0 * F.col("n_regionkey") + _REGION_LON0 + 8.0 * j
    n = (nation.select(
        F.lower(F.trim("n_name")).alias("name"),
        (F.col("n_nationkey") + 100).cast("long").alias("area_id"),
        F.lit(1).alias("level"),
        F.col("n_regionkey").cast("long").alias("parent_id"),
        F.lit(0).cast("int").alias("parent_level"),
        lat0.alias("min_lat"), (lat0 + 4.0).alias("max_lat"),
        lon0.alias("min_lon"), (lon0 + 8.0).alias("max_lon")))
    return r.unionByName(n)


def resolve_admin_areas(df: DataFrame, gazetteer: DataFrame,
                        name_col: str,
                        min_resolved: float = MIN_RESOLVED_FRACTION,
                        max_wrong_level: float = MAX_WRONG_LEVEL_ADMIN
                        ) -> DataFrame | None:
    """Resolve a string column to admin areas, or ``None`` when the
    column does not behave like an admin-area column.

    Steps (reference parity, file:line in the module docstring):

    1. distinct lowercase trimmed values, ≤90 chars, non-empty;
    2. broadcast join against the gazetteer (candidates);
    3. require >70% of distinct values to resolve;
    4. disambiguate: each name votes once per option, where a
       candidate of level L with parent chain P contributes
       ``(L, p) ∀ p ∈ P`` plus ``(L, None)``; options below
       ``max(3, (1−10%)·n_resolved)`` votes are dropped; the winner
       minimizes (level asc, parent level desc with None last,
       count desc);
    5. per name, the candidate at the winning level under the common
       parent (lowest ``area_id`` breaks ties deterministically).

    Output: ``(name, area_id, level, min_lat, max_lat, min_lon,
    max_lon)`` — one row per resolved distinct name.
    """
    from pyspark.sql import Window

    names = (df.select(F.lower(F.trim(F.col(name_col))).alias("name"))
             .filter((F.col("name") != "")
                     & (F.length("name") <= MAX_ADDRESS_LENGTH))
             .distinct())
    n_total = names.count()
    if n_total == 0:
        return None
    cand = names.join(F.broadcast(gazetteer), "name")
    # one vote per (name, option); parent chain here is one level
    # deep (parent_id), generalizing to ancestors via more rows
    opts = (cand.select("name", "level", "parent_id", "parent_level")
            .unionByName(cand.select(
                "name", "level",
                F.lit(None).cast("long").alias("parent_id"),
                F.lit(None).cast("int").alias("parent_level")))
            .distinct())
    n_resolved = opts.select("name").distinct().count()
    if n_resolved <= min_resolved * n_total:
        return None
    threshold = max(3.0, (1.0 - max_wrong_level) * n_resolved)
    counts = (opts.groupBy("level", "parent_id", "parent_level")
              .agg(F.count("*").alias("votes"))
              .filter(F.col("votes") >= threshold))
    best = (counts.orderBy(
        F.col("level").asc(),
        F.when(F.col("parent_id").isNull(), F.lit(1))
        .otherwise(-F.col("parent_level")).asc(),
        F.col("votes").desc()).limit(1).collect())
    if not best:
        return None
    level, parent_id = best[0]["level"], best[0]["parent_id"]
    chosen = cand.filter(F.col("level") == level)
    if parent_id is not None:
        chosen = chosen.filter(F.col("parent_id") == parent_id)
    w = Window.partitionBy("name").orderBy(F.col("area_id").asc())
    return (chosen.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("name", "area_id", "level", "min_lat", "max_lat",
                    "min_lon", "max_lon"))
