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


def stay_points(
    points: DataFrame,
    res: int,
    min_pts: int = 2,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Stay-point (dwell) detection, the companion primitive to
    segment_trips: within each entity's time-ordered stream, a STAY is
    a maximal run of >= ``min_pts`` consecutive points falling in the
    SAME grid cell at resolution ``res`` (the cell-grid form of the
    classic distance-threshold stay-point definition — grid side plays
    the role of the dwell radius, so detection is pure integer math
    and engine-exact).

    Output: (entity, stay_seq, cell, n_points, first_id, last_id)
    with ``stay_seq`` the 1-based index of the run among the entity's
    ALL runs (ordered by time) — deterministic, oracle-checkable.

    Scale shape: identical to segment_trips — ONE keyed window
    shuffle (lag + cumulative run id share a partitioning/ordering, so
    Catalyst plans a single sort+window stage), then a narrow
    (entity, run) rollup filtered to dense runs.  Lookback state is
    one row; lat/lon drop before the agg.
    """
    from skyway_spark.functions import cells

    w = Window.partitionBy("entity").orderBy("__ts", "pid")
    flagged = points.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("pid"),
        cells.cell_encode(F.col(lat_col), F.col(lon_col), res).alias("cell"),
    ).withColumn(
        "brk",
        (
            F.lag("cell").over(w).isNull()
            | (F.lag("cell").over(w) != F.col("cell"))
        ).cast("int"),
    ).withColumn(
        "stay_seq",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("entity", "stay_seq", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pid").alias("first_id"),
            F.max("pid").alias("last_id"),
        )
        .where(F.col("n_points") >= min_pts)
    )


def geofence_transitions(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 5,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Geofence ENTER/EXIT/SWITCH event stream — the alerting primitive
    on top of the spatial join: per entity, time-ordered, emit a row
    whenever the containing region changes.  Region per point is the
    MINIMUM polygon_id containing it (deterministic under overlaps),
    -1 when outside every fence; pre-history counts as outside, so the
    first in-fence point emits an ENTER.

    Output: (entity, ts, point_id, from_region, to_region, kind) with
    kind in {'enter','exit','switch'}.

    Scale shape: the containment test is the broadcast cell-bucketed
    PIP join (operators/pip.py — polygons are dimension-sized by the
    same contract); region-per-point is a map-side-combined min-groupBy
    on the point id; the ONLY data-sized shuffle is the per-entity
    window (one sort, lag-1 state).  Emitted transitions are a
    vanishing fraction of input rows.
    """
    from pyspark.sql import Window

    from skyway_spark.operators.pip import point_in_polygon

    hits = (
        point_in_polygon(points, polygons, res=res, point_id=id_col)
        .groupBy(id_col)
        .agg(F.min("polygon_id").alias("__r"))
    )
    regioned = points.join(hits, id_col, "left").withColumn(
        "region", F.coalesce(F.col("__r"), F.lit(-1)).cast("long")
    )
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col), F.col(id_col))
    out = regioned.withColumn(
        "from_region", F.coalesce(F.lag("region").over(w), F.lit(-1)).cast("long")
    ).where(F.col("from_region") != F.col("region"))
    return out.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("point_id"),
        "from_region",
        F.col("region").alias("to_region"),
        F.when(F.col("region") == -1, "exit")
        .when(F.col("from_region") == -1, "enter")
        .otherwise("switch")
        .alias("kind"),
    )


def event_paths(
    events: DataFrame,
    k: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top clickstream paths: each user's first ``k`` events (ordered
    by (ts, id) — a total order, so the path string is deterministic)
    joined into a ``>``-separated path, counted across users.  The
    session-path analytics staple over web event logs.

    Output: (path, n_users, path_len) — every observed path, exact.

    Scale shape: ONE window partitioned by user (parallel, bounded
    state) to take the first k events, then the per-user path builds
    via sort_array over a <=k-element collect_list (group state is
    k structs, never the full history), then a map-side-combined
    count by path.  The path-space is |event_type|^k — aggregate-
    sized output."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    first_k = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    per_user = first_k.groupBy(user_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rn", type_col))),
                lambda s: s[type_col],
            ),
        ).alias("path"),
        F.count(F.lit(1)).alias("__len"),
    )
    return per_user.groupBy("path", F.col("__len").alias("path_len")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


def track_hausdorff(
    points: DataFrame,
    entity: str = "entity",
    track: str = "track",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Discrete Hausdorff distance between an entity's CONSECUTIVE
    tracks (track id k vs k+1) — the route-regularity primitive: a
    small H means the entity retraced the same path next
    hour/day, a large H means a detour. North-rule addition (no
    reference counterpart).

    H(A, B) = max( h(A,B), h(B,A) ),  h(A,B) = max_{a} min_{b} d(a,b)

    with d = planar squared-degree distance. Every d² is two exact
    double products + one add of fixture-derived doubles; min/max are
    SELECTIONS (no accumulation), so the result is bit-exact on any
    engine — the SQL mirror reproduces it without tolerance.

    Scale shape: never a spatial cross join — candidate pairs come
    from the (entity, track)=(entity, track+1) EQUI-join, so the
    fan-out is per-entity-local (bounded by points-per-track²,
    a user-behavior constant, not corpus size). Two keyed shuffles:
    the pair join and the (entity, track, point) min-groupBy; the
    directed maxes ride the same grouping. AQE handles entities with
    fat tracks.

    Output: (entity, track, h2) — h2 the SQUARED Hausdorff distance
    between track and track+1 (squared to stay in exact-product land;
    callers sqrt at the edge if they want degrees).
    """
    a = points.select(
        F.col(entity).alias("e"), F.col(track).alias("k"),
        F.col(lat).alias("alat"), F.col(lon).alias("alon"),
    )
    b = points.select(
        F.col(entity).alias("e"), (F.col(track) - 1).alias("k"),
        F.col(lat).alias("blat"), F.col(lon).alias("blon"),
    )
    d2 = (
        (F.col("alat") - F.col("blat")) * (F.col("alat") - F.col("blat"))
        + (F.col("alon") - F.col("blon")) * (F.col("alon") - F.col("blon"))
    )
    pairs = a.join(b, ["e", "k"]).select(
        "e", "k", "alat", "alon", "blat", "blon", d2.alias("d2")
    )
    # point identity = its coordinates (Hausdorff is a SET distance, so
    # duplicate points collapse without changing the result — and the
    # grouping key is deterministic, unlike a synthetic row id)
    h_ab = (
        pairs.groupBy("e", "k", "alat", "alon").agg(F.min("d2").alias("dmin"))
        .groupBy("e", "k").agg(F.max("dmin").alias("h"))
    )
    h_ba = (
        pairs.groupBy("e", "k", "blat", "blon").agg(F.min("d2").alias("dmin"))
        .groupBy("e", "k").agg(F.max("dmin").alias("h"))
    )
    return (
        h_ab.unionByName(h_ba)
        .groupBy("e", "k")
        .agg(F.max("h").alias("h2"))
        .select(F.col("e").alias(entity), F.col("k").alias(track), "h2")
    )


def lcss_tracks(
    points: DataFrame,
    eps_x: int,
    eps_y: int,
    entity: str = "entity",
    track: str = "track",
    x: str = "x",
    y: str = "y",
    order_cols: tuple[str, ...] = ("ts",),
    max_pts: int = 8,
) -> DataFrame:
    """LCSS (Longest Common SubSequence) similarity between an
    entity's CONSECUTIVE tracks — the noise-robust trajectory
    similarity of Vlachos/Kollios/Gunopulos (ICDE'02): two points
    match when both integer coordinate deltas are within (eps_x,
    eps_y); LCSS is the longest order-preserving chain of matches, so
    outlier points cost nothing (unlike Hausdorff, which they
    dominate; track_hausdorff is the companion).

    All-integer (coords, eps, DP table), so bit-exact on any engine.
    The DP recurrence L[i][j] = max(L[i-1][j], L[i][j-1],
    match ? L[i-1][j-1]+1 : 0) is the standard one (when a cell
    matches, diag+1 dominates up/left because adjacent LCSS cells
    differ by at most 1 — the max form and the textbook form agree).

    Scale shape: candidate pairs come from the (entity, track)=
    (entity, track+1) EQUI-join pattern — never a track cross join;
    each track is clipped to its first ``max_pts`` points (one keyed
    window) and collapsed to ONE row of coordinate arrays, so a pair
    is a single row.  The DP runs in mapInPandas, VECTORIZED ACROSS
    THE BATCH: tracks pad to max_pts with a no-match sentinel and the
    fixed max_pts^2 cell updates run as numpy ops over every pair in
    the Arrow batch at once — constant 64 vectorized steps per batch,
    no per-group Python (the per-group applyInPandas form measured
    ~1 ms/group = 59 s on 40k pairs; this form is bulk).

    Output: (entity, track, n_a, n_b, lcss) comparing track with
    track+1.
    """
    import numpy as np
    import pandas as pd

    clipped = (
        points.select(
            F.col(entity).alias("e"),
            F.col(track).alias("k"),
            F.col(x).alias("px"),
            F.col(y).alias("py"),
            *[F.col(c) for c in order_cols],
        )
        .withColumn("i", F.row_number().over(
            Window.partitionBy("e", "k").orderBy(*[F.col(c) for c in order_cols])
        ))
        .where(F.col("i") <= max_pts)
        .select("e", "k", "i", "px", "py")
    )
    arrs = clipped.groupBy("e", "k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "px", "py"))),
            lambda s: s["px"],
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "px", "py"))),
            lambda s: s["py"],
        ).alias("ys"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    b_side = arrs.select(
        F.col("e"), (F.col("k") - 1).alias("k"),
        F.col("xs").alias("bxs"), F.col("ys").alias("bys"),
        F.col("n").alias("n_b"),
    )
    pairs = arrs.join(b_side, ["e", "k"]).select(
        "e", "k", "xs", "ys", F.col("n").alias("n_a"), "bxs", "bys", "n_b"
    )

    ex, ey, K = int(eps_x), int(eps_y), int(max_pts)
    SENT = 1 << 60  # padding sentinel: can never match within eps

    def dp(batches):
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue

            def pad(col):
                out = np.full((B, K), SENT, dtype=np.int64)
                for r, lst in enumerate(pdf[col]):
                    v = np.asarray(lst, dtype=np.int64)
                    out[r, : len(v)] = v
                return out

            ax, ay, bx, by = pad("xs"), pad("ys"), pad("bxs"), pad("bys")
            # match[b, i, j] without per-pair loops
            mt = (
                np.abs(ax[:, :, None] - bx[:, None, :]) <= ex
            ) & (np.abs(ay[:, :, None] - by[:, None, :]) <= ey)
            L = np.zeros((B, K + 1, K + 1), dtype=np.int64)
            for i in range(1, K + 1):
                for j in range(1, K + 1):
                    d = np.where(mt[:, i - 1, j - 1], L[:, i - 1, j - 1] + 1, 0)
                    L[:, i, j] = np.maximum(
                        np.maximum(L[:, i - 1, j], L[:, i, j - 1]), d
                    )
            na = pdf["n_a"].to_numpy(np.int64)
            nb = pdf["n_b"].to_numpy(np.int64)
            lcss = L[np.arange(B), na, nb]
            yield pd.DataFrame(
                {
                    "e": pdf["e"].to_numpy(np.int64),
                    "k": pdf["k"].to_numpy(np.int64),
                    "n_a": pdf["n_a"].astype("int32"),
                    "n_b": pdf["n_b"].astype("int32"),
                    "lcss": lcss,
                }
            )

    out = pairs.mapInPandas(dp, "e long, k long, n_a int, n_b int, lcss long")
    return out.select(
        F.col("e").alias(entity), F.col("k").alias(track), "n_a", "n_b", "lcss"
    )


def frechet_tracks(
    points: DataFrame,
    entity: str = "entity",
    track: str = "track",
    x: str = "x",
    y: str = "y",
    order_cols: tuple[str, ...] = ("ts",),
    max_pts: int = 8,
) -> DataFrame:
    """Discrete Fréchet distance between an entity's CONSECUTIVE
    tracks — the order-preserving "dog-leash" similarity (Eiter &
    Mannila '94): the smallest max pointwise distance over all
    monotone couplings of the two sequences.  Complements
    lcss_tracks (noise-robust count) and track_hausdorff (orderless
    extreme): Fréchet is the orderED extreme, so a track that doubles
    back reads far even when its point SET is close.

    All-integer: pointwise distance is Chebyshev max(|dx|, |dy|) on
    the integer grid, and the DP F[i][j] = max(d_ij, min(F[i-1][j],
    F[i][j-1], F[i-1][j-1])) (boundary F[0][0] = 0, other borders
    +inf) only takes max/min of those integers — bit-exact on any
    engine.

    Scale shape: identical to lcss_tracks — candidate pairs are the
    (entity, track)=(entity, track+1) EQUI-join (never a cross join),
    tracks clip to ``max_pts`` points (one keyed window) and collapse
    to single array rows, and the fixed max_pts^2-cell DP runs in
    mapInPandas VECTORIZED ACROSS THE ARROW BATCH (numpy ops over
    every pair at once; no per-group Python).

    Output: (entity, track, n_a, n_b, frechet) comparing track with
    track+1.
    """
    import numpy as np
    import pandas as pd

    clipped = (
        points.select(
            F.col(entity).alias("e"),
            F.col(track).alias("k"),
            F.col(x).alias("px"),
            F.col(y).alias("py"),
            *[F.col(c) for c in order_cols],
        )
        .withColumn("i", F.row_number().over(
            Window.partitionBy("e", "k").orderBy(*[F.col(c) for c in order_cols])
        ))
        .where(F.col("i") <= max_pts)
        .select("e", "k", "i", "px", "py")
    )
    arrs = clipped.groupBy("e", "k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "px", "py"))),
            lambda s: s["px"],
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "px", "py"))),
            lambda s: s["py"],
        ).alias("ys"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    b_side = arrs.select(
        F.col("e"), (F.col("k") - 1).alias("k"),
        F.col("xs").alias("bxs"), F.col("ys").alias("bys"),
        F.col("n").alias("n_b"),
    )
    pairs = arrs.join(b_side, ["e", "k"]).select(
        "e", "k", "xs", "ys", F.col("n").alias("n_a"), "bxs", "bys", "n_b"
    )

    K = int(max_pts)
    BIG = 1 << 60  # +inf stand-in: border cells and padded points

    def dp(batches):
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue

            def pad(col):
                # padded coords sit at 0: harmless, because the DP is
                # only read at (n_a, n_b), inside the real region
                out = np.zeros((B, K), dtype=np.int64)
                for r, lst in enumerate(pdf[col]):
                    v = np.asarray(lst, dtype=np.int64)
                    out[r, : len(v)] = v
                return out

            ax, ay, bx, by = pad("xs"), pad("ys"), pad("bxs"), pad("bys")
            d = np.maximum(
                np.abs(ax[:, :, None] - bx[:, None, :]),
                np.abs(ay[:, :, None] - by[:, None, :]),
            )
            Fm = np.full((B, K + 1, K + 1), BIG, dtype=np.int64)
            Fm[:, 0, 0] = 0
            for i in range(1, K + 1):
                for j in range(1, K + 1):
                    prev = np.minimum(
                        np.minimum(Fm[:, i - 1, j], Fm[:, i, j - 1]),
                        Fm[:, i - 1, j - 1],
                    )
                    Fm[:, i, j] = np.maximum(d[:, i - 1, j - 1], prev)
            na = pdf["n_a"].to_numpy(np.int64)
            nb = pdf["n_b"].to_numpy(np.int64)
            fr = Fm[np.arange(B), na, nb]
            yield pd.DataFrame(
                {
                    "e": pdf["e"].to_numpy(np.int64),
                    "k": pdf["k"].to_numpy(np.int64),
                    "n_a": pdf["n_a"].astype("int32"),
                    "n_b": pdf["n_b"].astype("int32"),
                    "frechet": fr,
                }
            )

    out = pairs.mapInPandas(dp, "e long, k long, n_a int, n_b int, frechet long")
    return out.select(
        F.col("e").alias(entity), F.col("k").alias(track), "n_a", "n_b", "frechet"
    )


def heading_octants(
    points: DataFrame,
    entity_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-entity movement-heading histogram over the 8 compass
    octants — the direction-of-travel fingerprint (commute corridors
    read E/W, delivery loops read flat) used for trajectory profiling
    and map-matching priors.

    Headings are classified on INTEGER coordinate deltas with the
    classic branch-free octant reduction (fold into the first octant
    by two conditional reflections, then one diagonal compare — the
    same reduction Bresenham rasterizers use), so the result is exact
    on any engine: no atan2, no floats, boundaries deterministically
    assigned (each 45-degree ray belongs to the lower octant; octant 0
    starts at due East, counter-clockwise).  Zero-displacement steps
    carry no heading and are dropped.

    Scale shape: one per-entity sort-shuffle for the lag window, then
    a map-side-combined groupBy on (entity, octant) — output is
    8 rows/entity max.  The window state is lag-1, so skewed entities
    stream through a single pass.

    Output: (entity, octant, heading, n_moves) with octant in 0..7 and
    heading in E NE N NW W SW S SE.
    """
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    dx = (F.col(x_col) - F.lag(x_col).over(w)).alias("dx")
    dy = (F.col(y_col) - F.lag(y_col).over(w)).alias("dy")
    moves = (
        points.select(F.col(entity_col).alias("entity"), dx, dy)
        .where(F.col("dx").isNotNull())
        .where((F.col("dx") != 0) | (F.col("dy") != 0))
    )
    # fold 1: reflect through origin when dy < 0 (octants 4-7 -> 0-3)
    s1 = moves.select(
        "entity",
        F.when(F.col("dy") < 0, -F.col("dx")).otherwise(F.col("dx")).alias("x1"),
        F.when(F.col("dy") < 0, -F.col("dy")).otherwise(F.col("dy")).alias("y1"),
        F.when(F.col("dy") < 0, F.lit(4)).otherwise(F.lit(0)).alias("o1"),
    )
    # fold 2: rotate -90 deg when x < 0 (octants 2-3 -> 0-1)
    s2 = s1.select(
        "entity",
        F.when(F.col("x1") < 0, F.col("y1")).otherwise(F.col("x1")).alias("x2"),
        F.when(F.col("x1") < 0, -F.col("x1")).otherwise(F.col("y1")).alias("y2"),
        (F.col("o1") + F.when(F.col("x1") < 0, F.lit(2)).otherwise(F.lit(0))).alias(
            "o2"
        ),
    )
    names = F.array(*[F.lit(s) for s in ("E", "NE", "N", "NW", "W", "SW", "S", "SE")])
    oct_ = (
        F.col("o2") + F.when(F.col("x2") < F.col("y2"), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        s2.select("entity", oct_.alias("octant"))
        .groupBy("entity", "octant")
        .agg(F.count(F.lit(1)).alias("n_moves"))
        .select(
            "entity",
            "octant",
            F.element_at(names, F.col("octant") + 1).alias("heading"),
            "n_moves",
        )
    )


def resample_tracks(
    pts,
    step: int,
    user: str = "user_id",
    t: str = "t",
    x: str = "x",
    y: str = "y",
):
    """Resample irregular integer tracks onto a fixed time grid by
    linear interpolation — the align-before-compare primitive behind
    track distance measures, OD matrices and map matching.

    ``pts`` is one row per (user, t) with integer position (x, y) and
    strictly increasing t per user; output is (user, g, xi, yi) for
    every grid instant g (multiple of ``step``) strictly inside the
    track's [t_min, t_max).

    Exactness: xi = x0 + floor((x1-x0)*(g-t0) / (t1-t0)) computed with
    the pmod floor-division identity, so the interpolated position is
    engine-exact int64 even when the segment slope is negative (Spark
    ``div`` and DuckDB ``//`` truncate toward zero; floor differs on
    negative numerators — VERDICT r1's floor-div trap, handled in the
    operator, mirrored in the oracle).

    Scale shape: the union-then-ONE-sort-shuffle as-of pattern
    (operators/asof.py): grid instants and track points union into one
    relation partitioned by user, a single window pass annotates every
    grid row with its bracketing points (last/first ignoreNulls), and
    interpolation is scan-stage Column math.  No per-user loops, no
    grid x track join blowup."""
    from pyspark.sql import Window

    b = pts.groupBy(user).agg(F.min(t).alias("ta"), F.max(t).alias("tb"))
    gs = F.expr(f"((ta + {step - 1}) div {step}) * {step}")
    grid = (
        b.select(F.col(user), gs.alias("gs"), "tb")
        .where(F.col("gs") < F.col("tb"))
        .select(
            user,
            F.explode(
                F.sequence(
                    F.col("gs"), F.col("tb") - 1, F.lit(step).cast("long")
                )
            ).alias("tt"),
        )
    )
    p = pts.select(
        user, F.col(t).alias("tt"), F.col(x).alias("_x"), F.col(y).alias("_y"),
        F.lit(1).alias("is_pt"),
    )
    g = grid.select(
        user, "tt", F.lit(None).cast("long").alias("_x"),
        F.lit(None).cast("long").alias("_y"), F.lit(0).alias("is_pt"),
    )
    u = p.unionByName(g)
    w = Window.partitionBy(user).orderBy("tt", F.col("is_pt").desc())
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    pt = F.when(
        F.col("is_pt") == 1,
        F.struct(F.col("tt").alias("t"), F.col("_x").alias("x"), F.col("_y").alias("y")),
    )
    ann = u.select(
        user, "tt", "is_pt",
        F.last(pt, ignorenulls=True).over(wb).alias("p0"),
        F.first(pt, ignorenulls=True).over(wf).alias("p1"),
    ).where(
        (F.col("is_pt") == 0) & F.col("p0").isNotNull() & F.col("p1").isNotNull()
    )
    staged = ann.select(
        F.col(user).alias("u"),
        F.col("tt").alias("g"),
        (F.col("p1.t") - F.col("p0.t")).alias("dt"),
        F.col("p0.x").alias("x0"),
        F.col("p0.y").alias("y0"),
        ((F.col("p1.x") - F.col("p0.x")) * (F.col("tt") - F.col("p0.t"))).alias("nx"),
        ((F.col("p1.y") - F.col("p0.y")) * (F.col("tt") - F.col("p0.t"))).alias("ny"),
    )
    return staged.select(
        F.col("u").alias(user),
        "g",
        (F.col("x0") + F.expr("(nx - pmod(nx, dt)) div dt")).alias("xi"),
        (F.col("y0") + F.expr("(ny - pmod(ny, dt)) div dt")).alias("yi"),
    )
