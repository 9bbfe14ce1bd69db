"""Spatial radius join via grid-cell blocking.

Same block-then-verify shape as the dedup/fuzzy operators: bucket
points into square(ish) lat/lon grid cells sized so that any pair
within ``radius_km`` lands in the same or an adjacent cell, equi-join
probe cells (each probe emits its 3x3 neighborhood), then verify with
exact haversine. Lossless for |lat| <= ``max_abs_lat`` (cell width in
longitude degrees is computed at the worst-case latitude, where
degrees are narrowest); rows beyond that latitude are excluded and
counted out loud rather than silently mis-joined.

At 100 TB this is the spatial join: the only shuffle is the
(cell -> points) hash join keyed by small integer pairs, candidate
lists stay local to a neighborhood, and the exact trig runs only on
survivors. A production variant swaps the square grid for geohash/S2
cells — the plan shape is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatially_databricks_etl_spark.functions.geo import EARTH_RADIUS_KM, haversine_km

# Width of one degree of latitude on the SAME sphere haversine_km uses
# (R = 6371.0088). Historical note: the old WGS84 ellipsoid LONGITUDE
# constant (111.320 > pi*R/180) under-sized longitude cells and could
# drop near-radius pairs; the old latitude constant (110.574 <
# pi*R/180) merely over-widened latitude cells — inconsistent but
# conservative (safe). Both now derive from the verify sphere.
_KM_PER_DEG_LAT = math.pi * EARTH_RADIUS_KM / 180.0


def radius_join(
    points: DataFrame,
    probes: DataFrame,
    *,
    radius_km: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    probe_cols: tuple[str, str] = ("q_lat", "q_lon"),
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """All (probe, point) pairs with haversine <= ``radius_km``.
    Column names must be pre-disambiguated. Rows with |lat| beyond
    ``max_abs_lat`` on either side are dropped (the grid's losslessness
    bound); returned pairs carry ``dist_km``.
    """
    plat, plon = point_cols
    qlat, qlon = probe_cols
    cell_lat_deg = radius_km / _KM_PER_DEG_LAT
    # longitude cells are MODULAR (antimeridian wrap: lon 179 and -179
    # are 2 degrees apart) and uniform: n_x = floor(360/needed_width)
    # makes every cell AT LEAST the needed width, preserving the
    # same-or-adjacent-cell guarantee that a trailing narrow cell
    # would break
    # Exact haversine-consistent longitude span: solve the haversine
    # formula for dlon at fixed latitude max_abs_lat (worst case — where
    # degrees of longitude are narrowest within the allowed band) and
    # distance = radius_km. This inverts the same R-sphere formula the
    # verify step evaluates, so the 3x3 neighborhood provably contains
    # every true pair (losslessness holds exactly, not just to ~0.1%).
    lon_span_deg = math.degrees(
        2.0
        * math.asin(
            min(
                1.0,
                math.sin(radius_km / (2.0 * EARTH_RADIUS_KM))
                / math.cos(math.radians(max_abs_lat)),
            )
        )
    )
    n_x = max(1, int(360.0 // lon_span_deg))

    def lon_cell(lon: str):
        raw = F.floor((F.col(lon) + 180.0) / 360.0 * n_x)
        return F.least(raw, F.lit(n_x - 1)).cast("long")  # lon=180 edge

    def cells(df: DataFrame, lat: str, lon: str, explode_neighbors: bool) -> DataFrame:
        df = df.filter(F.abs(F.col(lat)) <= max_abs_lat)
        cy = F.floor(F.col(lat) / cell_lat_deg)
        cx = lon_cell(lon)
        if not explode_neighbors:
            return df.withColumn("__cy", cy).withColumn("__cx", cx)
        wrap = F.array_distinct(
            F.array(
                F.pmod(cx - 1, F.lit(n_x)), cx, F.pmod(cx + 1, F.lit(n_x))
            )
        )
        return (
            df.withColumn("__cy", F.explode(F.sequence(cy - 1, cy + 1)))
            .withColumn("__cx", F.explode(wrap))
        )

    p = cells(points, plat, plon, explode_neighbors=False)
    q = cells(probes, qlat, qlon, explode_neighbors=True)
    cand = q.join(p, on=["__cy", "__cx"]).drop("__cy", "__cx")
    return cand.withColumn(
        "dist_km",
        haversine_km(F.col(qlat), F.col(qlon), F.col(plat), F.col(plon)),
    ).filter(F.col("dist_km") <= radius_km)
