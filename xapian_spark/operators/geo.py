"""Geospatial search — xapian-core/geospatial/ re-expressed as Column math.

- great-circle (haversine) distance: GreatCircleMetric::pointwise_distance
  (latlong_metrics.cc:108-126), quadratic-mean Earth radius 6372797.6 m
  (latlong_metrics.cc:35), h>1 clamp → radius·π.
- LatLongDistancePostingSource (latlong_posting_source.cc): a (doc_id,
  weight) DataFrame with weight = k1/(dist+k1) for k2=1 else
  k1·(dist+k1)^-k2 (weight_from_distance, :39-46), max weight at dist 0,
  optional max_range filter; defaults k1=1000, k2=1 (geospatial.h:497-500).
- LatLongDistanceKeyMaker (latlong_distance_keymaker.cc): per-doc distance
  as a sort key.

The reference stores coordinates serialized in a value slot; our value
slots are typed columns, so coordinates are plain double lat/lon columns
on the docs table — Parquet min/max pruning gives bounding-box style
skipping for free when a max_range filter is rewritten as a lat/lon range
(done below: the great-circle range is contained in the bounding box
range, so the box filter is a sound pre-filter the optimizer can push to
the scan before the exact haversine runs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quadratic mean radius of the Earth in metres (latlong_metrics.cc:35)
QUAD_EARTH_RADIUS_METRES = 6372797.6


def great_circle_distance(
    a: tuple[float, float], b: tuple[float, float],
    radius: float = QUAD_EARTH_RADIUS_METRES,
) -> float:
    """Pointwise haversine, float64 op order per latlong_metrics.cc:108-126."""
    lata = a[0] * (math.pi / 180.0)
    latb = b[0] * (math.pi / 180.0)
    latdiff = lata - latb
    longdiff = (a[1] - b[1]) * (math.pi / 180.0)
    sin_half_lat = math.sin(latdiff / 2)
    sin_half_long = math.sin(longdiff / 2)
    h = sin_half_lat * sin_half_lat + sin_half_long * sin_half_long * math.cos(
        lata
    ) * math.cos(latb)
    if h > 1.0:
        return radius * math.pi
    return 2 * radius * math.asin(math.sqrt(h))


def great_circle_distance_col(
    lat_col: Column,
    lon_col: Column,
    centre: tuple[float, float],
    radius: float = QUAD_EARTH_RADIUS_METRES,
) -> Column:
    """Same formula as a JVM Column expression (no Python per row)."""
    deg = math.pi / 180.0
    lata = lat_col.cast("double") * F.lit(deg)
    latb = math.radians(centre[0])
    latdiff = lata - F.lit(latb)
    longdiff = (lon_col.cast("double") - F.lit(centre[1])) * F.lit(deg)
    shl = F.sin(latdiff / 2)
    shg = F.sin(longdiff / 2)
    h = shl * shl + shg * shg * F.cos(lata) * F.lit(math.cos(latb))
    return F.when(h > 1.0, F.lit(radius * math.pi)).otherwise(
        F.lit(2 * radius) * F.asin(F.sqrt(h))
    )


def _bounding_box_prefilter(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    centre: tuple[float, float],
    max_range: float,
    radius: float,
) -> DataFrame:
    """Sound pre-filter: the great-circle disc of radius max_range lies
    inside this lat/lon box, so filtering to the box never drops a match —
    and the simple range predicates push down to the parquet scan
    (min/max row-group pruning: the geospatial analog of ValueStats
    bounds)."""
    dlat = math.degrees(max_range / radius)
    lo_lat, hi_lat = centre[0] - dlat, centre[0] + dlat
    df = df.filter(F.col(lat_col).between(lo_lat, hi_lat))
    coslat = math.cos(math.radians(min(abs(lo_lat), 90.0)))
    if coslat > 1e-9 and abs(lo_lat) < 90 and abs(hi_lat) < 90:
        dlon = math.degrees(max_range / (radius * coslat))
        if dlon < 180:
            df = df.filter(
                F.col(lon_col).between(centre[1] - dlon, centre[1] + dlon)
            )
    return df


def latlong_distance_source(
    docs: DataFrame,
    centre: tuple[float, float],
    lat_col: str = "lat",
    lon_col: str = "lon",
    k1: float = 1000.0,
    k2: float = 1.0,
    max_range: float = 0.0,
    id_col: str = "doc_id",
    radius: float = QUAD_EARTH_RADIUS_METRES,
) -> DataFrame:
    """LatLongDistancePostingSource → (doc_id, weight) DataFrame.

    weight = k1/(dist+k1) when k2 == 1, else k1·(dist+k1)^-k2
    (weight_from_distance); rows beyond max_range (when > 0) are dropped.
    Plugs into the matcher as an external posting-source leaf or joins
    AND_MAYBE-style onto a text query for distance boosting.
    """
    if k1 <= 0 or k2 <= 0:
        raise ValueError("k1 and k2 must be > 0")
    d = docs.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    if max_range > 0:
        d = _bounding_box_prefilter(d, lat_col, lon_col, centre, max_range, radius)
    dist = great_circle_distance_col(F.col(lat_col), F.col(lon_col), centre, radius)
    d = d.withColumn("_dist", dist)
    if max_range > 0:
        d = d.filter(F.col("_dist") <= F.lit(max_range))
    if k2 == 1.0:
        w = F.lit(k1) / (F.col("_dist") + F.lit(k1))
    else:
        w = F.lit(k1) * F.pow(F.col("_dist") + F.lit(k1), F.lit(-k2))
    return d.select(F.col(id_col).alias("doc_id"), w.alias("weight"))


def latlong_distance_keys(
    docs: DataFrame,
    centre: tuple[float, float],
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "doc_id",
    radius: float = QUAD_EARTH_RADIUS_METRES,
) -> DataFrame:
    """LatLongDistanceKeyMaker → (doc_id, distance) for distance sorting
    (join onto matches, orderBy distance ASC, doc_id ASC)."""
    dist = great_circle_distance_col(F.col(lat_col), F.col(lon_col), centre, radius)
    return docs.select(F.col(id_col).alias("doc_id"), dist.alias("distance"))
