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
