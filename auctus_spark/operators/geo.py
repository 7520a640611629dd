"""Geospatial operators: geohash/quadtree encoding, lat-long pairing,
WKT parsing, bounding boxes, nearest-distance statistics.

Reference: ``lib_profiler/datamart_profiler/spatial.py`` — geohash
encode/decode with configurable base (:406-508; base=32 → standard
geohash, base=4 → quadtree), lat/long column pairing by normalized
names (:109-170), WKT point parse (:173-208), median smallest distance
(:634-653), quadtree histogram sketch capped at 100 nodes per level
(``MAX_GEOHASHES``, core.py:48).

Encoding here is numpy-vectorized quantization with the reference's
exact boundary rule (value > mid → upper cell, so cells are half-open
upward): q = clip(ceil((v - lo)/cell) - 1, 0, 2^n - 1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

GEOHASH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_GEOHASHES = 100  # reference core.py:48


def _quantize(v: np.ndarray, lo: float, hi: float, nbits: int) -> np.ndarray:
    cells = 1 << nbits
    q = np.ceil((v - lo) / ((hi - lo) / cells)).astype(np.int64) - 1
    return np.clip(q, 0, cells - 1)


def geohash_encode(lats: np.ndarray, lons: np.ndarray, base: int = 32,
                   precision: int = 16) -> np.ndarray:
    """Vectorized geohash (base=32) / quadtree (base=4) encoding —
    same bit order as the reference (longitude bit first)."""
    base_bits = base.bit_length() - 1
    if 1 << base_bits != base:
        raise ValueError("Base is not a power of 2")
    total_bits = base_bits * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    qlon = _quantize(np.asarray(lons, dtype=np.float64), -180.0, 180.0,
                     lon_bits)
    qlat = _quantize(np.asarray(lats, dtype=np.float64), -90.0, 90.0,
                     lat_bits)
    # interleave: bit 0 (MSB position) is longitude's MSB
    bits = np.zeros((len(qlon), total_bits), dtype=np.int64)
    for i in range(lon_bits):
        bits[:, 2 * i] = (qlon >> (lon_bits - 1 - i)) & 1
    for i in range(lat_bits):
        bits[:, 2 * i + 1] = (qlat >> (lat_bits - 1 - i)) & 1
    chars = np.empty((len(qlon), precision), dtype="U1")
    lut = np.array(list(GEOHASH_CHARS))
    for c in range(precision):
        val = np.zeros(len(qlon), dtype=np.int64)
        for j in range(base_bits):
            val = (val << 1) | bits[:, c * base_bits + j]
        chars[:, c] = lut[val]
    return np.array(["".join(row) for row in chars], dtype=object)


def geohash_decode(h: str, base: int = 32
                   ) -> tuple[float, float, float, float]:
    """hash → (min_lat, max_lat, min_long, max_long), reference
    ``decode_hash`` semantics."""
    base_bits = base.bit_length() - 1
    if 1 << base_bits != base:
        raise ValueError("Base is not a power of 2")
    values = {c: i for i, c in enumerate(GEOHASH_CHARS)}
    lat_range = [-90.0, 90.0]
    long_range = [-180.0, 180.0]
    next_long = True
    for ch in h:
        v = values[ch]
        for i in reversed(range(base_bits)):
            bit = (v >> i) & 1
            rng = long_range if next_long else lat_range
            mid = (rng[0] + rng[1]) / 2.0
            if bit:
                rng[0] = mid
            else:
                rng[1] = mid
            next_long = not next_long
    return lat_range[0], lat_range[1], long_range[0], long_range[1]


def geohash_udf(base: int = 32, precision: int = 16):
    @F.pandas_udf(StringType())
    def gh(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(geohash_encode(lat.to_numpy(), lon.to_numpy(),
                                        base, precision))
    return gh


def geohash_sketch(df: DataFrame, lat_col: str, lon_col: str,
                   base: int = 4, max_precision: int = 8,
                   max_hashes: int = MAX_GEOHASHES) -> DataFrame:
    """Quadtree histogram sketch (reference spatial.py:511-631):
    counts per geohash prefix at the deepest precision that keeps the
    number of distinct cells under ``max_hashes``."""
    valid = df.filter(valid_latlong(F.col(lat_col), F.col(lon_col)))
    hashed = valid.withColumn(
        "gh", geohash_udf(base, max_precision)(
            F.col(lat_col).cast("double"), F.col(lon_col).cast("double")))
    counts = hashed.agg(*[
        F.count_distinct(F.substring("gh", 1, p)).alias(f"p{p}")
        for p in range(1, max_precision + 1)]).collect()[0]
    best = 1
    for p in range(1, max_precision + 1):
        if counts[f"p{p}"] <= max_hashes:
            best = p
        else:
            break
    return (hashed.groupBy(F.substring("gh", 1, best).alias("hash"))
            .agg(F.count("*").alias("number"))
            .orderBy("hash"))


# ---------------------------------------------------------------------

def valid_latlong(lat, lon):
    """lat ∈ [-90, 90], long ∈ [-180, 180], both non-null (reference
    core.py:759-763, profile_types.py:326-344)."""
    return (lat.isNotNull() & lon.isNotNull()
            & (lat >= -90.0) & (lat <= 90.0)
            & (lon >= -180.0) & (lon <= 180.0))


# longest-first so "latitude" strips before "lat" (context matching)
_LAT_NAMES = ("latitude", "ylat", "lat")
_LON_NAMES = ("longitude", "xlong", "xlon", "long", "lng", "lon")


def _norm_name(name: str) -> str:
    return re.sub(r"[^a-z]", "", name.lower())


def pair_latlong_columns(columns: list[str]) -> list[tuple[str, str]]:
    """Pair latitude/longitude columns by normalized name (reference
    spatial.py:109-170): strip non-letters, match lat-ish to long-ish
    with the same prefix/suffix context."""
    lats, lons = {}, {}
    for c in columns:
        n = _norm_name(c)
        for key in _LAT_NAMES:
            if key in n:
                lats[n.replace(key, "", 1)] = c
                break
        else:
            for key in _LON_NAMES:
                if key in n:
                    lons[n.replace(key, "", 1)] = c
                    break
    pairs = []
    for ctx, lat_c in lats.items():
        if ctx in lons:
            pairs.append((lat_c, lons[ctx]))
    return pairs


WKT_POINT_RE = r"^\s*POINT\s*\(\s*(-?[0-9.]+)\s+(-?[0-9.]+)\s*\)\s*$"


def parse_wkt_point(df: DataFrame, col: str, lon_first: bool = True
                    ) -> DataFrame:
    """WKT ``POINT (long lat)`` → (latitude, longitude) columns
    (reference spatial.py:173-208)."""
    # non-matches extract '' → guard before the cast (NULL out)
    def _num(group: int):
        x = F.regexp_extract(F.col(col), WKT_POINT_RE, group)
        return F.when(x != "", x.cast("double"))
    a, b = _num(1), _num(2)
    lon, lat = (a, b) if lon_first else (b, a)
    return df.withColumn("latitude", lat).withColumn("longitude", lon)


def bounding_box_merge(df: DataFrame, lat_col: str, lon_col: str) -> dict:
    """Merged bounding box of valid points (reference core.py:873-905);
    degenerate boxes inflated by 1e-4 like spatial.py:94-106."""
    r = (df.filter(valid_latlong(F.col(lat_col), F.col(lon_col)))
         .agg(F.min(lon_col).alias("min_lon"),
              F.max(lon_col).alias("max_lon"),
              F.min(lat_col).alias("min_lat"),
              F.max(lat_col).alias("max_lat")).collect()[0])
    box = {k: float(r[k]) for k in
           ("min_lon", "min_lat", "max_lon", "max_lat")}
    if box["min_lon"] == box["max_lon"]:
        box["min_lon"] -= 1e-4
        box["max_lon"] += 1e-4
    if box["min_lat"] == box["max_lat"]:
        box["min_lat"] -= 1e-4
        box["max_lat"] += 1e-4
    return box


def spatial_ranges_pdf(points: np.ndarray, n_ranges: int = 3,
                       min_size: float = 0.10,
                       delta: float = 1e-4) -> list[dict]:
    """The reference's per-cluster spatial coverage boxes, exactly
    (``spatial.py:49-106`` get_spatial_ranges): KMeans(k=min(3, n),
    random_state=0) on (lat, long) pairs; clusters under 10% mass
    dropped; per surviving cluster the [5%, 95%] quantile box —
    sort by lat for (min_lat, max_lat), independently by long for
    (min_long, max_long), both at indexes int(.05*len)/int(.95*len);
    envelopes [[min_long, max_lat], [max_long, min_lat]] sorted;
    degenerate (zero-area) boxes inflated by ±1e-4 per axis (Lucene
    tessellation needs area).

    ``points`` is an (n, 2) array of (lat, long)."""
    from .profiling import _kmeans_nd
    X = points[~np.isnan(points).any(axis=1)].astype(np.float64)
    n = X.shape[0]
    if n == 0:
        return []
    k = min(n_ranges, n)
    _, labels = _kmeans_nd(X, k, seed=0)
    ranges = []
    for rg in range(k):
        cluster = X[labels == rg]
        if cluster.shape[0] == 0 or cluster.shape[0] < min_size * n:
            continue
        m = cluster.shape[0]
        min_idx, max_idx = int(0.05 * m), int(0.95 * m)
        by_lat = np.sort(cluster[:, 0])
        by_lon = np.sort(cluster[:, 1])
        min_lat, max_lat = float(by_lat[min_idx]), float(by_lat[max_idx])
        min_lon, max_lon = float(by_lon[min_idx]), float(by_lon[max_idx])
        ranges.append([[min_lon, max_lat], [max_lon, min_lat]])
    ranges.sort()
    for rg in ranges:
        if rg[0][0] == rg[1][0]:
            rg[0][0] -= delta
            rg[1][0] += delta
        if rg[0][1] == rg[1][1]:
            rg[0][1] += delta
            rg[1][1] -= delta
    return [{"range": {"type": "envelope", "coordinates": coords}}
            for coords in ranges]


def spatial_ranges(df: DataFrame, lat_col: str, lon_col: str,
                   sample_cap: int = 100_000, seed: int = 89
                   ) -> list[dict]:
    """Distributed wrapper for the KMeans coverage boxes: valid-point
    filter + sample-bounded collect (the reference profiles a 5 MB
    seed-89 sample, core.py:33-36), then the deterministic sketch.
    The collect is the SKETCH INPUT cap, not a scale limit — at 100 TB
    the sample is what travels."""
    flt = df.filter(valid_latlong(F.col(lat_col), F.col(lon_col))) \
        .select(F.col(lat_col).cast("double").alias("lat"),
                F.col(lon_col).cast("double").alias("lon"))
    n = flt.count()
    if n == 0:
        return []
    frac = min(1.0, sample_cap / max(n, 1))
    pdf = (flt.sample(fraction=frac, seed=seed) if frac < 1.0
           else flt).toPandas()
    pts = pdf[["lat", "lon"]].to_numpy()
    return spatial_ranges_pdf(pts)


def median_smallest_distance(df: DataFrame, lat_col: str, lon_col: str,
                             sample_cap: int = 1000, seed: int = 89
                             ) -> float:
    """Median nearest-neighbor distance over a seeded sample
    (reference spatial.py:634-653 samples then KDTree; here: sampled
    collect + vectorized numpy pairwise NN — the sample is bounded so
    driver-side is fine, exactly like the reference's approach)."""
    pts = df.select(F.col(lat_col).cast("double").alias("lat"),
                    F.col(lon_col).cast("double").alias("lon")) \
        .filter(valid_latlong(F.col("lat"), F.col("lon"))).dropDuplicates()
    n = pts.count()
    if n > sample_cap:
        pts = pts.sample(fraction=sample_cap / n, seed=seed)
    arr = np.array([[r["lat"], r["lon"]] for r in pts.collect()])
    if arr.shape[0] < 2:
        return 0.0
    d2 = ((arr[:, None, :] - arr[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.median(np.sqrt(d2.min(axis=1))))


# ---------------------------------------------------------------------
# AAB (axis-aligned box) geohash rasterization — reference
# lib_profiler/datamart_profiler/spatial.py:511-631 (Geohasher.add_aab):
# spatial coverage given as bounding boxes (admin areas, dataset
# extents) is rasterized into quadtree cells, deepening until a level
# would exceed the cell cap.  Driver-side sketch logic (boxes are
# per-dataset metadata, not per-row data).
# ---------------------------------------------------------------------

def _interleave_chars(long_vals: np.ndarray, lat_vals: np.ndarray,
                      n_long: int, n_lat: int, base_bits: int
                      ) -> list[str]:
    """Cross-product of quantized axis cells → interleaved-bit geohash
    strings (longitude bit first, reference bit order)."""
    nl, na = len(long_vals), len(lat_vals)
    lv = np.repeat(long_vals, na)
    av = np.tile(lat_vals, nl)
    total_bits = n_long + n_lat
    bits = np.zeros((nl * na, total_bits), dtype=np.int64)
    for i in range(n_long):
        bits[:, 2 * i] = (lv >> (n_long - 1 - i)) & 1
    for i in range(n_lat):
        bits[:, 2 * i + 1] = (av >> (n_lat - 1 - i)) & 1
    n_chars = total_bits // base_bits
    out = []
    for r in range(nl * na):
        chars = []
        for c in range(n_chars):
            val = 0
            for j in range(base_bits):
                val = (val << 1) | int(bits[r, c * base_bits + j])
            chars.append(GEOHASH_CHARS[val])
        out.append("".join(chars))
    return out


class GeohashAABSketch:
    """Quadtree sketch over bounding boxes (reference ``Geohasher``
    with ``add_aab``): each box is rasterized into the covering cells
    of every level; when a level's distinct-cell count exceeds
    ``max_hashes`` the sketch's precision drops to the level above.
    ``get_hashes()`` → [(hash, number-of-boxes-covering-it)] at the
    final precision."""

    def __init__(self, max_hashes: int = MAX_GEOHASHES, base: int = 4,
                 precision: int = 16):
        base_bits = base.bit_length() - 1
        if 1 << base_bits != base:
            raise ValueError("Base is not a power of 2")
        self.base = base
        self.base_bits = base_bits
        self.precision = precision
        self.max_hashes = max_hashes
        from collections import Counter
        self._levels: dict[int, "Counter[str]"] = {
            lv: Counter() for lv in range(1, precision + 1)}
        self.total = 0

    def add_aab(self, box: tuple[float, float, float, float]) -> None:
        """box = (min_long, max_long, min_lat, max_lat) — reference
        argument order (spatial.py:556)."""
        import math
        min_long, max_long, min_lat, max_lat = box
        self.total += 1
        for level in range(1, self.precision + 1):
            n_long = math.ceil(level * self.base_bits / 2)
            n_lat = math.floor(level * self.base_bits / 2)
            lmin = int(_quantize(np.array([min_long]), -180.0, 180.0,
                                 n_long)[0])
            lmax = int(_quantize(np.array([max_long]), -180.0, 180.0,
                                 n_long)[0])
            amin = int(_quantize(np.array([min_lat]), -90.0, 90.0,
                                 n_lat)[0]) if n_lat else 0
            amax = int(_quantize(np.array([max_lat]), -90.0, 90.0,
                                 n_lat)[0]) if n_lat else 0
            cells = _interleave_chars(
                np.arange(lmin, lmax + 1), np.arange(amin, amax + 1),
                n_long, n_lat, self.base_bits)
            counter = self._levels[level]
            counter.update(cells)
            if len(counter) > self.max_hashes:
                self.precision = level - 1
                for deeper in list(self._levels):
                    if deeper >= level:
                        del self._levels[deeper]
                break

    def get_hashes(self) -> list[tuple[str, int]]:
        if self.precision < 1:
            return []
        return sorted(self._levels[self.precision].items())

    def get_hashes_json(self) -> list[dict]:
        return [{"hash": h, "number": n} for h, n in self.get_hashes()]


EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius, the ES default


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance (haversine) as a Column expression —
    2R·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2))), all JVM-side
    trig (whole-stage codegen; ±1-ulp vs libm, documented)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(dlmb))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_filter(df: DataFrame, lat_col: str, lon_col: str,
                        origin_lat: float, origin_lon: float,
                        radius_km: float) -> DataFrame:
    """ES ``geo_distance`` query: rows within ``radius_km`` of the
    origin (haversine over the ES-default mean earth radius), with
    the distance added as ``distance_km``.

    Scale shape: a cheap bounding-box PRE-FILTER (always a superset
    of the disc) runs first so the trig only evaluates on candidates
    and the lat/lon range predicates push down to the parquet scan;
    the exact haversine confirms.  The longitudinal half-extent of a
    spherical cap is asin(sin(r/R)/cos(lat)) — NOT r/(R·cos(lat)),
    which under-covers at high latitude — and a cap that reaches a
    pole (sin(r/R) ≥ cos(lat)) spans all longitudes.  A box crossing
    the antimeridian becomes an OR of two sargable ranges."""
    import math
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    coslat = math.cos(math.radians(origin_lat))
    sin_ratio = math.sin(min(math.pi, radius_km / EARTH_RADIUS_KM))
    if coslat <= 1e-12 or sin_ratio >= coslat:
        dlon = 180.0  # cap reaches (or contains) a pole
    else:
        dlon = math.degrees(math.asin(min(1.0, sin_ratio / coslat)))
    box = F.col(lat_col).between(origin_lat - dlat, origin_lat + dlat)
    if dlon < 180.0:
        lo, hi = origin_lon - dlon, origin_lon + dlon
        if lo < -180.0:
            lon_pred = (F.col(lon_col) <= hi) | (F.col(lon_col) >= lo + 360.0)
        elif hi > 180.0:
            lon_pred = (F.col(lon_col) >= lo) | (F.col(lon_col) <= hi - 360.0)
        else:
            lon_pred = F.col(lon_col).between(lo, hi)
        box = box & lon_pred
    dist = haversine_km(F.col(lat_col), F.col(lon_col),
                        F.lit(float(origin_lat)),
                        F.lit(float(origin_lon)))
    return (df.filter(box)
            .withColumn("distance_km", dist)
            .filter(F.col("distance_km") <= float(radius_km)))


def geo_bounds_agg(df: DataFrame, lat_col: str, lon_col: str
                   ) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the bounding box of all points
    — one row (top_left_lat, top_left_lon, bottom_right_lat,
    bottom_right_lon).  Non-wrapping form (ES wrap_longitude=true can
    emit a box crossing the antimeridian when that is tighter;
    documented divergence — the straight min/max box is always a
    correct cover).  One scan, four partial-aggregated extremes."""
    ok = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    return (df.filter(ok)
            .agg(F.max(lat_col).cast("double").alias("top_left_lat"),
                 F.min(lon_col).cast("double").alias("top_left_lon"),
                 F.min(lat_col).cast("double")
                  .alias("bottom_right_lat"),
                 F.max(lon_col).cast("double")
                  .alias("bottom_right_lon")))


def geo_centroid_agg(df: DataFrame, lat_col: str, lon_col: str
                     ) -> DataFrame:
    """ES ``geo_centroid`` aggregation: arithmetic mean of the
    coordinates plus the point count — one row (lat, lon, count),
    exactly ES's accumulating-average centroid (ES averages raw
    lat/lon, not a spherical centroid).  One scan."""
    ok = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    return (df.filter(ok)
            .agg(F.avg(lat_col).cast("double").alias("lat"),
                 F.avg(lon_col).cast("double").alias("lon"),
                 F.count(F.lit(1)).alias("count")))


def geo_distance_rings(df: DataFrame, lat_col: str, lon_col: str,
                       origin_lat: float, origin_lon: float,
                       ranges: list[tuple[float | None, float | None]]
                       ) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION: half-open [from, to) distance
    rings around an origin (None = unbounded), each independently
    counted like the range aggregation — ES ring semantics exactly.

    Returns (bucket, range_from, range_to, doc_count), bucket the
    "from-to" key with ``*`` for unbounded.  ONE scan: the haversine
    distance evaluates once per row (JVM trig, whole-stage codegen)
    and every ring is a conditional sum over it — no per-ring passes,
    unpivot on the 1-row aggregate."""
    d = haversine_km(F.col(lat_col), F.col(lon_col),
                     F.lit(float(origin_lat)),
                     F.lit(float(origin_lon)))
    ok = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    row = df.filter(ok).select(d.alias("_d"))
    aggs, keys = [], []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("_d") >= float(lo))
        if hi is not None:
            cond = cond & (F.col("_d") < float(hi))
        keys.append((f"{'*' if lo is None else lo}-"
                     f"{'*' if hi is None else hi}", lo, hi))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"_b{i}"))
    one = row.agg(*aggs)
    stack = ", ".join(
        f"'{k}', CAST({'NULL' if lo is None else repr(float(lo))} "
        f"AS DOUBLE), "
        f"CAST({'NULL' if hi is None else repr(float(hi))} AS DOUBLE), "
        f"_b{i}"
        for i, (k, lo, hi) in enumerate(keys))
    return (one.selectExpr(
        f"stack({len(keys)}, {stack}) "
        "AS (bucket, range_from, range_to, doc_count)")
        .orderBy("bucket"))


MERCATOR_LAT_MAX = 85.05112878  # web-mercator latitude bound (ES geotile)


def geotile_grid_agg(df: DataFrame, lat_col: str, lon_col: str,
                     zoom: int = 6, size: int = 20) -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket points into OSM/web-
    mercator slippy tiles at ``zoom``, key "z/x/y", top ``size``
    buckets by (doc_count desc, key asc).  The formula is the
    published slippy-tile map projection (identical in ES):

        x = floor(2^z · (lon + 180) / 360)
        y = floor(2^z · (1 − asinh(tan φ)/π) / 2),   φ clamped to
            ±85.05112878° (the mercator square)

    x/y clamp into [0, 2^z−1] so the +180 / pole edges land in the
    last tile.  All JVM expressions (whole-stage codegen) — ONE scan,
    partial-agg groupBy on the tile key, TakeOrdered(size)."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom {zoom} outside [0, 29]")
    n = float(2 ** zoom)
    lat = F.least(F.greatest(F.col(lat_col).cast("double"),
                             F.lit(-MERCATOR_LAT_MAX)),
                  F.lit(MERCATOR_LAT_MAX))
    phi = F.radians(lat)
    x = F.floor(F.lit(n) * (F.col(lon_col) + 180.0) / 360.0)
    y = F.floor(F.lit(n) * (1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi))
                            / F.lit(float(np.pi))) / 2.0)
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)).cast("long"),  # noqa: E731
                              F.lit(int(n) - 1))
    key = F.concat_ws("/", F.lit(str(zoom)), clamp(x).cast("string"),
                      clamp(y).cast("string"))
    ok = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    return (df.filter(ok)
            .groupBy(key.alias("tile"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("tile"))
            .limit(size))


def geohash_grid_agg(df: DataFrame, lat_col: str, lon_col: str,
                     precision: int = 4, size: int = 20) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket points by base-32
    geohash cell at ``precision`` chars, top ``size`` buckets by
    (doc_count desc, hash asc).  Encoding rides the existing
    vectorized :func:`geohash_udf` (Arrow batches, bit-interleave in
    numpy); the rest is ONE partial-agg groupBy + TakeOrdered."""
    ok = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    gh = geohash_udf(base=32, precision=precision)(
        F.col(lat_col).cast("double"), F.col(lon_col).cast("double"))
    return (df.filter(ok)
            .groupBy(gh.alias("geohash"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("geohash"))
            .limit(size))


def geo_bounding_box_filter(df: DataFrame, lat_col: str, lon_col: str,
                            top_left: tuple[float, float],
                            bottom_right: tuple[float, float]
                            ) -> DataFrame:
    """ES ``geo_bounding_box`` query: rows inside the box (edges
    inclusive, ES contract).  A box whose left edge lies east of its
    right edge crosses the antimeridian and becomes an OR of two
    sargable longitude ranges — every predicate pushes to the
    parquet scan."""
    t_lat, l_lon = float(top_left[0]), float(top_left[1])
    b_lat, r_lon = float(bottom_right[0]), float(bottom_right[1])
    lat_pred = F.col(lat_col).between(b_lat, t_lat)
    if l_lon <= r_lon:
        lon_pred = F.col(lon_col).between(l_lon, r_lon)
    else:  # antimeridian crossing
        lon_pred = (F.col(lon_col) >= l_lon) | (F.col(lon_col) <= r_lon)
    return df.filter(lat_pred & lon_pred)


def geo_polygon_filter(df: DataFrame, lat_col: str, lon_col: str,
                       polygon: list[tuple[float, float]]
                       ) -> DataFrame:
    """ES ``geo_polygon`` query: rows strictly inside the polygon by
    the even-odd (ray casting) rule — a horizontal ray east from the
    point; boundary behavior follows the standard half-open edge
    convention ((yi > y) != (yj > y)), the same published algorithm
    ES/Lucene use for point-in-polygon tests.

    The crossing test unrolls the (literal, tiny) vertex list into a
    chain of JVM boolean expressions — ONE scan, whole-stage codegen,
    no UDF; a bounding-box pre-filter (always a superset) pushes
    down to the scan so the crossing arithmetic only runs on
    candidates.  Not for polygons with thousands of vertices (use a
    rasterized geohash cover then); documented."""
    if len(polygon) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    lats = [float(p[0]) for p in polygon]
    lons = [float(p[1]) for p in polygon]
    box = (F.col(lat_col).between(min(lats), max(lats))
           & F.col(lon_col).between(min(lons), max(lons)))
    y, x = F.col(lat_col), F.col(lon_col)
    inside = F.lit(False)
    n = len(polygon)
    for i in range(n):
        j = (i - 1) % n
        yi, xi = F.lit(lats[i]), F.lit(lons[i])
        yj, xj = F.lit(lats[j]), F.lit(lons[j])
        crosses = (((yi > y) != (yj > y))
                   & (x < (xj - xi) * (y - yi) / (yj - yi) + xi))
        inside = F.when(crosses, ~inside).otherwise(inside)
    return df.filter(box & inside)


def geo_line_agg(df: DataFrame, group_col: str, lat_col: str,
                 lon_col: str, sort_col: str,
                 size: int = 10) -> DataFrame:
    """ES ``geo_line`` aggregation: per group, the LineString
    connecting the group's points in ``sort_col`` order, truncated
    to the ``size`` points with the SMALLEST sort values (the ES
    truncation rule); ``complete`` is false when points were
    dropped.  Sort ties break (sort, lon, lat) ascending —
    documented (ES leaves ties unspecified).

    Returns (group, line, point_count, complete) ordered by group,
    where ``line`` is ``"lon lat,lon lat,..."`` (the WKT coordinate
    list) and ``point_count`` counts ALL points pre-truncation.

    Plan: ONE shuffle — a window rank per group caps state to
    ``size`` rows BEFORE the collect (the groupBy reuses the
    window's hash partitioning, so capping costs no extra
    exchange), then sort_array over ≤ size structs rebuilds the
    ordered line JVM-side.  No per-row Python."""
    from pyspark.sql import Window
    wall = Window.partitionBy(group_col)
    pts = (df.select(group_col,
                     F.col(sort_col).alias("_s"),
                     F.col(lon_col).cast("double").alias("_lon"),
                     F.col(lat_col).cast("double").alias("_lat"))
           .withColumn("_rn", F.row_number().over(
               Window.partitionBy(group_col).orderBy(
                   F.asc("_s"), F.asc("_lon"), F.asc("_lat"))))
           .withColumn("_n", F.count(F.lit(1)).over(wall))
           .filter(F.col("_rn") <= size))
    line = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("_s"), F.col("_lon"), F.col("_lat")))),
            lambda p: F.concat(p["_lon"].cast("string"), F.lit(" "),
                               p["_lat"].cast("string"))), ",")
    return (pts.groupBy(group_col)
            .agg(line.alias("line"),
                 F.max("_n").alias("point_count"),
                 (F.max("_n") <= size).alias("complete"))
            .orderBy(group_col))


_SHAPE_RELATIONS = ("intersects", "within", "contains", "disjoint")


def geo_shape_envelope_filter(df: DataFrame, envelope,
                              relation: str = "intersects",
                              min_lat: str = "min_lat",
                              min_lon: str = "min_lon",
                              max_lat: str = "max_lat",
                              max_lon: str = "max_lon") -> DataFrame:
    """ES ``geo_shape`` query with an ``envelope`` shape: rows whose
    indexed bounding box stands in ``relation`` to the query envelope
    ``((top_left_lat, top_left_lon), (bottom_right_lat,
    bottom_right_lon))`` — ES envelope corner convention.

    Relations (ES spatial_relation):

    - ``intersects`` (default): boxes share any point;
    - ``within``: the document box lies entirely inside the envelope;
    - ``contains``: the document box contains the whole envelope;
    - ``disjoint``: no shared point.

    All four are pure interval algebra on the four box columns —
    sargable conjunctions pushed to the scan (``disjoint`` is the
    negation of intersects, still a scan predicate; like ES it must
    examine non-matching docs, so it is the one relation that cannot
    prune).  Antimeridian-crossing envelopes are not supported here
    (documented; split the envelope like geo_bounding_box_filter)."""
    if relation not in _SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {_SHAPE_RELATIONS}")
    (q_top, q_left), (q_bot, q_right) = envelope
    if q_left > q_right:
        raise ValueError("antimeridian-crossing envelope unsupported; "
                         "split into two queries")
    lo_lat, lo_lon = F.col(min_lat), F.col(min_lon)
    hi_lat, hi_lon = F.col(max_lat), F.col(max_lon)
    intersects = ((lo_lat <= F.lit(q_top)) & (hi_lat >= F.lit(q_bot))
                  & (lo_lon <= F.lit(q_right))
                  & (hi_lon >= F.lit(q_left)))
    within = ((lo_lat >= F.lit(q_bot)) & (hi_lat <= F.lit(q_top))
              & (lo_lon >= F.lit(q_left)) & (hi_lon <= F.lit(q_right)))
    contains = ((lo_lat <= F.lit(q_bot)) & (hi_lat >= F.lit(q_top))
                & (lo_lon <= F.lit(q_left))
                & (hi_lon >= F.lit(q_right)))
    pred = {"intersects": intersects, "within": within,
            "contains": contains, "disjoint": ~intersects}[relation]
    return df.filter(pred)


def hex_grid_agg(df: DataFrame, lat_col: str, lon_col: str,
                 size_deg: float = 5.0) -> DataFrame:
    """Hexagonal grid bucket aggregation — the ES ``geohex_grid``
    analog with a documented divergence: ES bins into Uber H3 cells
    (icosahedral spherical hexagons); this bins into a PLANAR
    pointy-top axial hex lattice over (lon, lat) degrees with cell
    size ``size_deg`` — the standard hex-binning construction, a pure
    closed-form function of the coordinates, so an external SQL
    oracle replays it exactly (H3's tables cannot be re-derived in
    SQL).

    Axial coords q = (√3/3·x − 1/3·y)/s, r = (2/3·y)/s, then cube
    rounding (round each of x=q, z=r, y=−x−z to the nearest integer
    and re-derive the component with the largest rounding error) —
    the exact nearest-hex-center rule.  Rounding is floor(v+0.5) so
    every engine agrees on ties.  One scan + one partial-aggregated
    shuffle on the (hex_q, hex_r) key, like the geotile/geohash
    grids."""
    s = float(size_deg)
    x = F.col(lon_col).cast("double")
    y = F.col(lat_col).cast("double")
    sqrt3_3 = 0.5773502691896257  # sqrt(3)/3
    q = (F.lit(sqrt3_3) * x - F.lit(1.0 / 3.0) * y) / F.lit(s)
    r = (F.lit(2.0 / 3.0) * y) / F.lit(s)

    def _round(c):
        return F.floor(c + F.lit(0.5))

    cx, cz = q, r
    cy = -cx - cz
    rx, ry, rz = _round(cx), _round(cy), _round(cz)
    dx = F.abs(rx - cx)
    dy = F.abs(ry - cy)
    dz = F.abs(rz - cz)
    hq = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    hr = F.when((dx > dy) & (dx > dz), rz) \
        .when(dy > dz, rz).otherwise(-rx - ry)
    # hy would be -hq-hr; only (q, r) identify the cell
    return (df.groupBy(hq.cast("long").alias("hex_q"),
                       hr.cast("long").alias("hex_r"))
            .agg(F.count(F.lit(1)).alias("doc_count")))
