"""Way-geometry assembly: the spatial engine's "join the refs back to
coordinates" operator.

The reference streams ways as bare node-id lists and never resolves
them (`src/elements.rs:25` — `nodes: Vec<i64>`); a spatial engine
must: polyline length, bbox, rendering all need coordinates. At
OSM-planet scale this is the canonical big shuffle (billions of way
refs equi-joined against billions of nodes), so the operator is built
as: posexplode(refs) -> shuffle equi-join on node id -> per-way
ordered re-assembly. The segment-length fold runs left-to-right over
the position-sorted array (deterministic — a plain SUM over doubles
would be partition-order-dependent and could never match an exact
oracle).

Scale notes: the refs->nodes join is shuffle-on-key and benefits from
bucketing both sides by id on a real deployment; AQE handles ref skew
(mega-ways). The per-way collect_list is bounded by OSM's 2,000-node
way limit, so group state stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyway_spark.functions.geo import haversine_km


def relation_way_rollup(
    relations: DataFrame,
    way_geoms: DataFrame,
    rel_id: str = "rel_id",
    members: str = "members",
) -> DataFrame:
    """Second level of geometry assembly: explode relation members,
    keep way members, equi-join the assembled way geometries, roll up
    per relation. The perimeter is folded left-to-right in member
    order (array_sort by pos) — deterministic under any partitioning,
    unlike a bare SUM over doubles.

    members: array<struct<type:string, ref:long, role:string>> (the
    canonical elements schema). Non-way members are ignored here, as a
    rendering/multipolygon pass would route them elsewhere."""
    m = relations.select(F.col(rel_id), F.posexplode(F.col(members)).alias("pos", "m"))
    wm = m.where(F.col("m.type") == "way").select(
        F.col(rel_id),
        "pos",
        F.col("m.ref").alias("way_id"),
        F.col("m.role").alias("role"),
    )
    j = wm.join(way_geoms, "way_id")
    g = j.groupBy(rel_id).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "length_km", "n_points", "role"))
        ).alias("__ms")
    )
    perimeter = F.aggregate(
        F.transform("__ms", lambda x: x["length_km"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n_outer = F.size(F.filter("__ms", lambda x: x["role"] == "outer"))
    total_points = F.aggregate(
        F.transform("__ms", lambda x: x["n_points"]),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return g.select(
        F.col(rel_id),
        F.size("__ms").alias("n_ways"),
        n_outer.alias("n_outer"),
        total_points.alias("total_points"),
        F.round(perimeter, 6).alias("perimeter_km"),
    )


def assemble_way_geometry(
    ways: DataFrame,
    nodes: DataFrame,
    way_id: str = "way_id",
    refs: str = "refs",
    node_id: str = "id",
) -> DataFrame:
    """(way_id, n_points, length_km): resolve each way's ordered node
    refs to coordinates and fold the haversine length over consecutive
    vertices. Missing refs simply drop out of the join (count visible
    via n_points)."""
    exploded = ways.select(F.col(way_id), F.posexplode(F.col(refs)).alias("pos", "__ref"))
    joined = exploded.join(
        nodes.select(F.col(node_id).alias("__ref"), "lat", "lon"), "__ref"
    )
    pts = joined.groupBy(way_id).agg(
        F.array_sort(F.collect_list(F.struct("pos", "lat", "lon"))).alias("__pts")
    )
    n = F.size("__pts")
    seg = F.zip_with(
        F.slice("__pts", 1, n - 1),
        F.slice("__pts", 2, n - 1),
        lambda a, b: haversine_km(a["lat"], a["lon"], b["lat"], b["lon"]),
    )
    length = F.aggregate(seg, F.lit(0.0), lambda acc, s: acc + s)
    return pts.select(
        F.col(way_id),
        n.alias("n_points"),
        F.round(F.when(n > 1, length).otherwise(F.lit(0.0)), 6).alias("length_km"),
    )
