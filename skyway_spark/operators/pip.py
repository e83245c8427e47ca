"""Point-in-polygon spatial join.

Strategy (north_rule: "point-in-polygon via ray-casting over
cell-bucketed polygon partitions"):

1. each polygon ring -> its covering cells at ``res`` (bbox cover,
   computed in a vectorized Arrow UDF — polygons stay distributed);
2. points -> cell at the same res (pure Column math);
3. equi-join on cell. The polygon-cells side is typically small
   (dimension-like) and is broadcast — NO shuffle of the point side;
4. exact even-odd ray-cast refine in a vectorized numpy UDF;
5. hole handling: a point is in the polygon iff inside an ``outer``
   ring and not inside any ``hole`` ring of the same polygon_id.

Geometry is planar in (lat, lon) — documented approximation, fine for
city-scale polygons away from the antimeridian (the generator
guarantees this; a production build would split rings at the
antimeridian first).

At 100 TB the point side never moves: the join is broadcast, the
refine is a narrow Arrow batch op, and skew from hot cells is handled
by the salting module (operators/salt.py) plus AQE skew-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from skyway_spark.functions import cells


@F.pandas_udf(ArrayType(LongType(), False))
def _covering_cells_udf(rings: pd.Series, res_s: pd.Series) -> pd.Series:
    """ring (array<struct<lat,lon>>) -> covering cell ids (bbox cover)."""

    def cover(args):
        ring, res = args
        lats = np.array([p["lat"] for p in ring])
        lons = np.array([p["lon"] for p in ring])
        return cells.cells_covering_bbox(
            float(lats.min()), float(lats.max()), float(lons.min()), float(lons.max()), int(res)
        ).tolist()

    return pd.Series([cover(a) for a in zip(rings, res_s)])


@F.pandas_udf(BooleanType())
def _ray_cast_udf(lat_s: pd.Series, lon_s: pd.Series, rings: pd.Series) -> pd.Series:
    """Even-odd ray cast (horizontal ray in +lon direction), numpy
    per (point, ring) pair; edges on the vertex list order."""
    out = np.empty(len(lat_s), dtype=bool)
    for i, (py, px, ring) in enumerate(zip(lat_s, lon_s, rings)):
        ys = np.array([p["lat"] for p in ring])
        xs = np.array([p["lon"] for p in ring])
        y1, y2 = ys[:-1], ys[1:]
        x1, x2 = xs[:-1], xs[1:]
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        out[i] = bool((crosses & (px < xint)).sum() % 2)
    return pd.Series(out)


def polygon_cells(polygons: DataFrame, res: int) -> DataFrame:
    """polygon rings -> (cell, polygon_id, ring_role, ring): one row
    per covering cell, bucketed for the equi-join."""
    return polygons.select(
        "polygon_id",
        "ring_role",
        "ring",
        F.explode(_covering_cells_udf(F.col("ring"), F.lit(res))).alias("cell"),
    )


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    point_id: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    broadcast_polygons: bool = True,
) -> DataFrame:
    """Rows of ``points`` paired with every polygon containing them.

    Returns points columns + ``polygon_id``. Cell-bucket equi-join
    (broadcast polygon side) then exact refine; hole rings subtract.
    """
    pts = points.withColumn("__cell", cells.cell_encode(F.col(lat), F.col(lon), res))
    pcells = polygon_cells(polygons, res)
    if broadcast_polygons:
        pcells = F.broadcast(pcells)
    cand = pts.join(pcells, pts["__cell"] == pcells["cell"], "inner")
    refined = cand.withColumn(
        "__inside", _ray_cast_udf(F.col(lat), F.col(lon), F.col("ring"))
    )
    # a candidate pair may appear once per ring role; aggregate:
    # inside outer AND NOT inside any hole
    verdict = (
        refined.groupBy(point_id, "polygon_id")
        .agg(
            F.max(F.when(F.col("ring_role") == "outer", F.col("__inside")).otherwise(False)).alias(
                "__in_outer"
            ),
            F.max(F.when(F.col("ring_role") == "hole", F.col("__inside")).otherwise(False)).alias(
                "__in_hole"
            ),
        )
        .where(F.col("__in_outer") & ~F.col("__in_hole"))
        .select(point_id, "polygon_id")
    )
    return points.join(verdict, on=point_id, how="inner")


# ------------------------- plain-python oracle -------------------------


def ray_cast_py(lat: float, lon: float, ring: list[tuple[float, float]]) -> bool:
    """Reference ray-cast for tests (ring as [(lat, lon), ...])."""
    inside = False
    for (y1, x1), (y2, x2) in zip(ring[:-1], ring[1:]):
        if (y1 > lat) != (y2 > lat):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xint:
                inside = not inside
    return inside
