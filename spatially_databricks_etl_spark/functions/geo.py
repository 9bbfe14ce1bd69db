"""Geo scalar functions (haversine distance, bounding-box predicate).

The reference's data model carries a geolocation struct
(lat/lon built at `Spatially ETL test.py:156-163`) but never computes
with it; these are the computations a spatial ETL actually runs.
Pure `pyspark.sql.functions` trig — codegen'd, map-only, no UDF —
so distance filters/joins stay a single scan at 100 TB. For true
spatial joins at scale, pair `in_bbox` with a geohash-style grid key
(equi-join on cell, verify with `haversine_km`) — same
block-then-verify shape as the dedup/fuzzy operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) points."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(
    lat: Column, lon: Column, *, south: float, west: float, north: float, east: float
) -> Column:
    """Bounding-box containment (inclusive). The cheap prefilter
    before exact distance math — at scale it is the partition/file
    pruner when data is laid out by region."""
    return (
        (lat >= F.lit(south))
        & (lat <= F.lit(north))
        & (lon >= F.lit(west))
        & (lon <= F.lit(east))
    )
