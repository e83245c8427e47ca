"""Bounded-radius kNN via k-ring cell expansion.

north_rule: "kNN via k-ring cell expansion". For each query point:
expand its cell's k-ring at a resolution matched to ``radius_km``
(ring cells jointly cover the radius), equi-join candidate points on
cell, haversine, keep top-k by (distance, point id) with a window.

Contract: neighbors are found within ``radius_km`` (cell-index kNN is
radius-bounded — same as an H3 k-ring search). Choose radius to the
application's recall needs; the join is an equi-join on int64 cells,
so it shuffles only by cell and broadcast-joins when the query side
is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyway_spark.functions import cells
from skyway_spark.functions.geo import haversine_km


def radius_candidates(
    points: DataFrame,
    queries: DataFrame,
    radius_km: float,
    ring: int = 1,
    point_id: str = "id",
    query_id: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Shared cell-cover candidate stage for kNN and range joins.

    Returns (query_id, __pid, __plat, __plon, dist_km) for every
    point falling in a ring cell of the query; ``dist_km`` is exact
    haversine but NOT yet filtered to ``radius_km`` (callers apply
    their own bound). The join is an int64 cell equi-join: shuffle by
    cell only, or shuffle-free when the query side broadcasts.
    """
    res = cells.res_for_radius_km(radius_km)
    # latitude rows are radius-safe by res choice (cell height >=
    # radius); longitude columns shrink by cos(lat), so the x-extent
    # of the ring grows adaptively (clamped to the full band near the
    # poles). Without this, kNN silently misses neighbors above ~16°
    # latitude.
    radius_deg = radius_km / 111.32
    width = cells.cell_width_deg(res)
    kx = F.ceil(
        F.lit(radius_deg / width)
        / F.greatest(F.cos(F.radians(F.col("lat"))), F.lit(1e-9))
    )
    q = queries.select(
        F.col(query_id),
        F.col("lat").alias("__qlat"),
        F.col("lon").alias("__qlon"),
        F.explode(
            cells.k_ring_xy(
                cells.cell_encode(F.col("lat"), F.col("lon"), res),
                res,
                F.greatest(kx, F.lit(ring)),
                F.lit(ring),
            )
        ).alias("__cell"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    p = points.select(
        F.col(point_id).alias("__pid"),
        F.col("lat").alias("__plat"),
        F.col("lon").alias("__plon"),
        cells.cell_encode(F.col("lat"), F.col("lon"), res).alias("__cell"),
    )
    return p.join(q, "__cell").withColumn(
        "dist_km",
        haversine_km(F.col("__plat"), F.col("__plon"), F.col("__qlat"), F.col("__qlon")),
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    radius_km: float = 50.0,
    ring: int = 1,
    point_id: str = "id",
    query_id: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, point id, dist_km, rank<=k) for neighbors within the
    ring-covered radius.

    points needs (point_id, lat, lon); queries needs (query_id, lat,
    lon). ``ring=1`` with res_for_radius guarantees full coverage of
    ``radius_km`` around the query (cell height >= radius, so the 3x3
    ring covers it).
    """
    cand = radius_candidates(
        points, queries, radius_km, ring, point_id, query_id, broadcast_queries
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__pid").asc())
    return (
        cand.where(F.col("dist_km") <= radius_km)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(query_id),
            F.col("__pid").alias(point_id),
            F.col("dist_km"),
            F.col("rank"),
        )
    )


def snap_to_sites(
    points: DataFrame,
    sites: DataFrame,
    res: int,
    ring: int = 1,
    point_id: str = "point_id",
    site_id: str = "site_id",
) -> DataFrame:
    """Map-matching primitive: snap every point to its nearest SITE
    (way node / POI / road vertex) among the candidates in the point's
    (2*ring+1)^2 cell neighborhood at resolution ``res``.

    Both inputs carry integer CENTIDEGREE coordinates (lat_c, lon_c)
    alongside the double lat/lon used for cell assignment, so the
    distance is exact int64 planar math — d2 = dlat_c^2 + dlon_c^2 —
    and the argmin (ties to the lowest site id) is engine-exact.
    Points whose neighborhood holds no site produce no row (bounded-
    radius contract, same as the kNN operator).

    Scale shape: sites keyed by their cell once; each point explodes
    to its ring cells (row-local array op) and candidates come from an
    int64 cell EQUI-join — shuffle by cell only (or broadcast when the
    site side is dimension-sized, the typical road-network case).  The
    argmin is one map-side-combined min(struct) groupBy on the point
    id; coordinates are ints end-to-end, no text/geometry payload.
    """
    p = points.select(
        F.col(point_id).alias("__pid"),
        F.col("lat_c").alias("__plat"),
        F.col("lon_c").alias("__plon"),
        F.explode(
            cells.k_ring(
                cells.cell_encode(F.col("lat"), F.col("lon"), res), res, ring
            )
        ).alias("__cell"),
    )
    s = sites.select(
        F.col(site_id).alias("__sid"),
        F.col("lat_c").alias("__slat"),
        F.col("lon_c").alias("__slon"),
        cells.cell_encode(F.col("lat"), F.col("lon"), res).alias("__cell"),
    )
    d2 = (F.col("__plat") - F.col("__slat")) * (
        F.col("__plat") - F.col("__slat")
    ) + (F.col("__plon") - F.col("__slon")) * (F.col("__plon") - F.col("__slon"))
    best = (
        p.join(s, "__cell")
        .select(
            "__pid",
            F.struct(d2.alias("d2"), F.col("__sid").alias("sid")).alias("__c"),
        )
        .groupBy("__pid")
        .agg(F.min("__c").alias("__b"))
    )
    return best.select(
        F.col("__pid").alias(point_id),
        F.col("__b.sid").alias(site_id),
        F.col("__b.d2").alias("d2"),
    )
