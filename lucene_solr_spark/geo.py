"""Geo functions: LatLonPoint analog.

Reference surface (lucene/core/.../document/LatLonPoint.java:
newDistanceQuery:236, newBoxQuery:214; haversine in
util/SloppyMath.java:haversinMeters with the IUGG mean earth radius;
Solr's `geodist()` function query and geofilt):

  distance query  -> haversine expr filter (predicate pushes to scan)
  box query       -> two BETWEENs on (lat, lon) — parquet min/max
                     prunable once the table is laid out by location
  geodist sort    -> ORDER BY the same expression

Spark-first: one closed-form column expression, entirely inside
WholeStageCodegen — no UDF, no index structure needed; at 100 TB the
box pre-filter plus Z-order/Hilbert table layout (Iceberg sort order)
is the BKD-tree analog that makes the scan prune.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# IUGG mean earth radius in meters (SloppyMath.haversinMeters)
EARTH_MEAN_RADIUS_M = 6371008.7714


def haversine_meters(lat: Column, lon: Column,
                     lat0: float, lon0: float) -> Column:
    """Great-circle distance in meters from (lat0, lon0), float64,
    fixed op order (oracle-replicable):
    2R * asin(sqrt(sin^2(dphi/2) + cos(phi0) cos(phi) sin^2(dlmb/2)))."""
    dphi = F.radians(lat - F.lit(lat0)) / F.lit(2.0)
    dlmb = F.radians(lon - F.lit(lon0)) / F.lit(2.0)
    h = (
        F.pow(F.sin(dphi), 2)
        + F.cos(F.radians(F.lit(lat0))) * F.cos(F.radians(lat)) * F.pow(F.sin(dlmb), 2)
    )
    return F.lit(2.0 * EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(h))


def bbox_filter(lat: Column, lon: Column,
                min_lat: float, max_lat: float,
                min_lon: float, max_lon: float) -> Column:
    """LatLonPoint.newBoxQuery: two range predicates (Catalyst pushes
    both to the scan)."""
    return (
        (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
        & (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    )
