"""Grid-density spatial clustering (cell-based DBSCAN).

The classic cell-grid approximation of DBSCAN (grid side = eps, a
cell is DENSE when it holds >= min_pts points, clusters are the
8-connected components of dense cells) — the standard way to make
density clustering shuffle-friendly at scale.  No reference
counterpart (skyway has no spatial analytics; SURVEY.md §2.4) — a
north-rule spatial operator over the same int64 cell index the PIP /
kNN / tiling operators share (functions/cells.py).

Scale shape — the whole point of the grid formulation:
  * points collapse to (cell, count) FIRST, with map-side combine —
    at 100 TB the clustering graph is over ~10^6 dense cells, never
    the 10^11 points;
  * adjacency is an 8-way JVM array explode on the cell-sized table
    followed by one int64 equi-join (dense x dense) — no distance
    computation, no cross join;
  * the component step is the contraction CC of operators/graph.py
    (O(log) small self-joins, not O(diameter) edge re-shuffles);
  * cluster_id = min cell id of the component — deterministic and
    engine-independent, so the result is exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyway_spark.functions import cells
from skyway_spark.operators.graph import connected_components

# 8-neighborhood offsets (dx, dy), excluding (0, 0)
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def grid_dbscan(
    points: DataFrame,
    res: int,
    min_pts: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cell, cluster_id, n_points) for every dense cell.

    A dense cell is one holding >= ``min_pts`` points at resolution
    ``res``; ``cluster_id`` is the minimum cell id of the cell's
    8-connected dense component (an isolated dense cell is its own
    cluster).  Grid edges do not wrap at the antimeridian — the cell
    index is a plain lat/lon grid (functions/cells.py), matching the
    oracle's closed-form adjacency.
    """
    nx, ny = 1 << (res + 1), 1 << res
    dense = (
        points.groupBy(
            cells.cell_encode(F.col(lat_col), F.col(lon_col), res).alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .where(F.col("n_points") >= min_pts)
        .localCheckpoint(eager=True)  # reused 3x: both edge sides + final join
    )

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS
        ]
    )
    nbr = (
        dense.select(
            "cell",
            cells.cell_x(F.col("cell")).alias("x"),
            cells.cell_y(F.col("cell")).alias("y"),
        )
        .select("cell", "x", "y", F.explode(offs).alias("o"))
        .select(
            "cell",
            (F.col("x") + F.col("o.dx")).alias("nx_"),
            (F.col("y") + F.col("o.dy")).alias("ny_"),
        )
        .where(
            (F.col("nx_") >= 0)
            & (F.col("nx_") < nx)
            & (F.col("ny_") >= 0)
            & (F.col("ny_") < ny)
        )
        .select("cell", cells.pack_cell(F.col("nx_"), F.col("ny_"), res).alias("ncell"))
    )
    # keep each undirected edge once (cell < ncell); the int64 join
    # against the dense set prunes neighbors that aren't dense
    edges = (
        nbr.where(F.col("cell") < F.col("ncell"))
        .join(dense.select(F.col("cell").alias("ncell")), "ncell")
        .select(F.col("cell").alias("src"), F.col("ncell").alias("dst"))
    )
    labels = connected_components(edges, "src", "dst")
    return dense.join(
        labels.select(F.col("node").alias("cell"), "component"), "cell", "left"
    ).select(
        "cell",
        F.coalesce("component", F.col("cell")).alias("cluster_id"),
        "n_points",
    )
