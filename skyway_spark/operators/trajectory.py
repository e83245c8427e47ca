"""Trajectory segmentation: split per-entity point streams into trips.

The classic GPS/mobility primitive (stay-point & trip detection, e.g.
Zheng et al., GeoLife): within each entity's time-ordered point
stream, a new segment starts when the great-circle jump from the
previous point exceeds ``jump_km`` OR the time gap exceeds
``gap_us``.  Segment ids are the running count of break flags — the
standard sessionize-by-cumsum pattern, here keyed by geodesic
distance instead of inactivity alone.

Scale shape: ONE keyed window shuffle (partitionBy entity) computes
lag + break + cumulative segment id in a single window stage; the
per-segment rollup groups on (entity, seg) — a second shuffle over
already-narrow rows (ids + ints only; lat/lon are dropped before the
agg).  No self-joins, no explosion; state per window partition is one
row of lookback (lag 1), so skewed entities stream rather than
buffer.

Exactness: the output is all-integer.  Step distances enter as
floor(haversine_km * 1e5) (centimeter-ish quantization) summed as
int64 — integer addition is order-independent, so the per-segment
path length is bit-exact on any engine; the float threshold compares
use the same pinned haversine op order as functions/geo.py, mirrored
by the SQL oracle.

No reference counterpart (skyway has no windowing; SURVEY.md §2.4) —
north-rule trajectory operator over the event-point fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyway_spark.functions.geo import haversine_km


def segment_trips(
    points: DataFrame,
    jump_km: float,
    gap_us: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(entity, seg_id, n_points, first_id, last_id, path_cm) per trip.

    ``path_cm`` sums floor(step_km * 1e5) over within-segment steps
    (the step INTO each point, excluding the segment-opening jump).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    # parquet timestamps may load as TIMESTAMP_NTZ; unix_micros requires
    # TIMESTAMP — the cast is identity under the session's UTC timezone
    pts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(pts_us).over(w)
    step = haversine_km(plat, plon, F.col(lat_col), F.col(lon_col))
    brk = (
        plat.isNull()
        | (step > F.lit(float(jump_km)))
        | ((pts_us - prev_us) > F.lit(int(gap_us)))
    )
    flagged = points.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("pid"),
        brk.cast("int").alias("brk"),
        F.when(brk, F.lit(0)).otherwise(F.floor(step * 1e5)).alias("step_cm"),
    ).withColumn(
        "seg_id",
        # same (ts, id) ordering as the lag window -- both windows share
        # one partitioning, so Catalyst plans a single sort + window stage
        F.sum("brk").over(
            Window.partitionBy("entity")
            .orderBy("__ts", "pid")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("entity", "seg_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pid").alias("first_id"),
            F.max("pid").alias("last_id"),
            F.sum("step_cm").alias("path_cm"),
        )
    )
