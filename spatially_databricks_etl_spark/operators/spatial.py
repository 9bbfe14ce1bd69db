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


def dbscan_2d(
    points: DataFrame,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    eps: int = 100,
    min_pts: int = 4,
    max_iterations: int = 20,
) -> DataFrame:
    """DBSCAN (Ester et al. 1996) over integer 2-D points — the
    density-based member the clustering family lacks (k-means assumes
    convex, count-known clusters; DBSCAN finds arbitrary-shape dense
    regions and labels sparse points noise). Coordinates and ``eps``
    are INTEGERS (callers quantize floats with the repo's
    floor(x·scale + 0.5) idiom) so every distance compare is exact
    (squared L2 ≤ eps², no float) and the whole run — roles AND
    cluster labels — is deterministic and SQL-replayable.

    Semantics (textbook): |N_eps(p)| counts p itself; ``core`` iff
    that count ≥ ``min_pts``; clusters = connected components of the
    core-core eps-graph, labeled by the SMALLEST core id (the
    :func:`~spatially_databricks_etl_spark.operators.curate.connected_components`
    contract); a non-core point within eps of ≥1 core is ``border``
    and takes the smallest cluster label among its core neighbors
    (the deterministic resolution of DBSCAN's classic border
    ambiguity); everything else is ``noise`` (cluster null).

    Returns (id_col, role, cluster).

    Scale shape (100 TB): the ONLY candidate generator is grid-cell
    blocking — each point hashes to an eps-sized cell, one side
    explodes its 3x3 neighborhood (a 9x map-side fan-out of the
    point's cell key, the :func:`radius_join` pattern), and the
    cell equi-join is the single data-sized shuffle. Every pair
    within eps provably lands in adjacent cells, so the block is
    LOSSLESS; the exact distance filter runs only on neighborhood
    candidates. Neighbor counts are one hash aggregate; the CC runs
    on the core-core edge list (cluster-diameter iterations, graph
    orders of magnitude smaller than the corpus). Dense-cell skew is
    the known hazard (a cell with k points emits k² candidates):
    eps should be chosen so cells stay bounded — the same contract
    as every blocked join in this repo."""
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    from spatially_databricks_etl_spark.operators.curate import (
        connected_components,
    )

    eps2 = int(eps) * int(eps)

    # exact integer floor division (toward -inf): pmod gives the
    # non-negative remainder, so (x - pmod(x, eps)) is the largest
    # multiple of eps <= x and integer `div` on it is exact for the
    # FULL long range — a double-arithmetic floor(x/eps) can round a
    # point near 2^53 into the wrong cell and break the lossless 3x3
    # blocking guarantee.
    def _cell(col: str):
        e = int(eps)
        return F.expr(
            f"(CAST(`{col}` AS BIGINT) - pmod(CAST(`{col}` AS BIGINT), "
            f"CAST({e} AS BIGINT))) div CAST({e} AS BIGINT)"
        )

    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
        _cell(x_col).alias("__cx"),
        _cell(y_col).alias("__cy"),
    )
    # probe side fans out to its 3x3 cell neighborhood (map-side)
    off = F.expr("explode(array(-1, 0, 1))")
    probe = (
        pts.withColumn("__dx", off)
        .withColumn("__dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            F.col("__id").alias("__pid"),
            F.col("__x").alias("__px"),
            F.col("__y").alias("__py"),
            (F.col("__cx") + F.col("__dx")).alias("__cx"),
            (F.col("__cy") + F.col("__dy")).alias("__cy"),
        )
    )
    dx = F.col("__px") - F.col("__x")
    dy = F.col("__py") - F.col("__y")
    pairs = (
        probe.join(pts, ["__cx", "__cy"])
        .filter(dx * dx + dy * dy <= F.lit(eps2))
        .select(F.col("__pid").alias("__a"), F.col("__id").alias("__b"))
    )
    counts = pairs.groupBy("__a").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    core = counts.filter(F.col("__n") >= min_pts).select(F.col("__a").alias("__cid"))
    core_edges = (
        pairs.filter(F.col("__a") != F.col("__b"))
        .join(core.select(F.col("__cid").alias("__a")), "__a")
        .join(core.select(F.col("__cid").alias("__b")), "__b")
        .select(F.col("__a").alias("id_a"), F.col("__b").alias("id_b"))
    )
    comp = connected_components(core_edges, max_iterations=max_iterations)
    # isolated cores (no core neighbor) form their own singleton cluster
    core_labels = (
        core.join(comp.withColumnRenamed("id", "__cid"), "__cid", "left")
        .select(
            F.col("__cid"),
            F.coalesce(F.col("component"), F.col("__cid")).alias("__cluster"),
        )
    )
    border_labels = (
        pairs.filter(F.col("__a") != F.col("__b"))
        .join(core_labels.withColumnRenamed("__cid", "__b"), "__b")
        .groupBy("__a")
        .agg(F.min("__cluster").alias("__bcluster"))
    )
    out = (
        pts.select("__id")
        .join(core_labels.withColumnRenamed("__cid", "__id"), "__id", "left")
        .join(border_labels.withColumnRenamed("__a", "__id"), "__id", "left")
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.when(F.col("__cluster").isNotNull(), F.lit("core"))
        .when(F.col("__bcluster").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("role"),
        F.coalesce(F.col("__cluster"), F.col("__bcluster")).alias("cluster"),
    )
