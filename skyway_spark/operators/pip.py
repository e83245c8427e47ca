"""Point-in-polygon spatial join.

Strategy (north_rule: "point-in-polygon via ray-casting over
cell-bucketed polygon partitions"):

1. each polygon ring -> its covering cells at ``res`` (bbox cover);
2. points -> cell at the same res (pure Column math);
3. equi-join on cell — polygon side broadcast, so the point side
   never shuffles;
4. exact even-odd ray-cast refine, fully numpy-vectorized;
5. hole handling: inside an ``outer`` ring and not inside any
   ``hole`` ring of the same polygon_id.

Two physical paths:

- **broadcast path (default)**: the polygon table is dimension-sized
  (same assumption a broadcast join makes). Ring geometry is
  collected ONCE on the driver and compiled into the plan. Two refine
  engines:
  - ``refine='jvm'`` (default): ring edges become literal
    array<struct> columns and the even-odd ray cast is a pure
    higher-order-function expression (``exists``/``aggregate``) —
    zero Python processes in the hot path, no Arrow transfer, stable
    latency, and the whole pipeline stays narrow.
  - ``refine='pandas'``: ships rings to Python workers inside a
    pandas UDF closure and ray-casts each Arrow batch as one numpy
    (points x edges) broadcast — useful when rings have thousands of
    vertices, where numpy's vectorized matrix beats the per-edge
    interpreted HOF lambda.
- **distributed path** (``broadcast_polygons=False``): rings stay in
  the DataFrame and ship per candidate row — for polygon sets too
  large to hold on the driver; the cell equi-join then shuffles on
  cell, where hot-cell salting (operators/salt.py) + AQE apply.

Geometry is planar in (lat, lon) — fine for city-scale polygons away
from the antimeridian (the generator guarantees this; a production
build would split rings at the antimeridian first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from skyway_spark.functions import cells


def _ring_arrays(ring) -> tuple[np.ndarray, np.ndarray]:
    ys = np.array([p["lat"] for p in ring], dtype=np.float64)
    xs = np.array([p["lon"] for p in ring], dtype=np.float64)
    return ys, xs


def _ray_cast_batch(py: np.ndarray, px: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of P points against one ring: (P, E) numpy
    broadcast, no Python loop."""
    y1, y2 = ys[:-1][None, :], ys[1:][None, :]
    x1, x2 = xs[:-1][None, :], xs[1:][None, :]
    pyc = py[:, None]
    pxc = px[:, None]
    crosses = (y1 > pyc) != (y2 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (pyc - y1) / (y2 - y1) + x1
    return ((crosses & (pxc < xint)).sum(axis=1) % 2).astype(bool)


# ---------------------------------------------------------------------------
# broadcast path
# ---------------------------------------------------------------------------


def _edge_struct(y1: float, x1: float, y2: float, x2: float):
    return F.struct(
        F.lit(float(y1)).alias("y1"),
        F.lit(float(x1)).alias("x1"),
        F.lit(float(y2)).alias("y2"),
        F.lit(float(x2)).alias("x2"),
    )


_EDGES_T = "array<array<struct<y1:double,x1:double,y2:double,x2:double>>>"


def _rings_lit(ring_list):
    """[(ys, xs), ...] -> literal array<array<edge struct>> Column."""
    if not ring_list:
        return F.array().cast(_EDGES_T)
    return F.array(
        *[
            F.array(
                *[
                    _edge_struct(ys[k], xs[k], ys[k + 1], xs[k + 1])
                    for k in range(len(ys) - 1)
                ]
            )
            for ys, xs in ring_list
        ]
    )


def _odd_crossings(ring, lat_c, lon_c):
    """Even-odd ray cast as a pure HOF expression over one ring's
    edge array; identical arithmetic (same op order) to
    _ray_cast_batch so jvm and pandas refines agree bit-for-bit."""

    def crossing(e):
        return F.when(
            ((e["y1"] > lat_c) != (e["y2"] > lat_c))
            & (
                lon_c
                < (e["x2"] - e["x1"]) * (lat_c - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            1,
        ).otherwise(0)

    return F.aggregate(ring, F.lit(0), lambda acc, e: acc + crossing(e)) % 2 == 1


# jvm-refine compiles every polygon edge into literal Column arrays:
# plan size grows with polygons x vertices, and past a few tens of
# thousands of literals Catalyst planning slows and whole-stage
# codegen falls back to interpreted expressions (64KB method limit).
# Above this edge budget the auto mode switches to the pandas refine,
# whose cost is O(1) in plan size (geometry ships in the UDF closure).
JVM_REFINE_MAX_EDGES = 10_000

# Adaptive interior covering (round 4): per polygon, the finest cell
# resolution whose bbox cover stays under this budget.  Rows per
# polygon in the broadcast candidate table are bounded by it; 64 cells
# per axis keeps the driver-side classification (cells x edges numpy)
# trivially cheap while making each cell ~1/60 of the polygon extent,
# so the boundary band is a small fraction of the cover.
INTERIOR_CELL_BUDGET = 4096
INTERIOR_MAX_RES = 18


def _corner_verdict(geom: dict, py: np.ndarray, px: np.ndarray) -> np.ndarray:
    """Exact polygon verdict (inside any outer, not inside any hole)
    for driver-side sample points — the same even-odd arithmetic as
    the runtime refine engines."""
    in_outer = np.zeros(len(py), dtype=bool)
    for ys, xs in geom["outer"]:
        in_outer |= _ray_cast_batch(py, px, ys, xs)
    in_hole = np.zeros(len(py), dtype=bool)
    for ys, xs in geom["hole"]:
        in_hole |= _ray_cast_batch(py, px, ys, xs)
    return in_outer & ~in_hole


def _pick_cover_res(ylo, yhi, xlo, xhi, coarse_res: int) -> int:
    """Finest LADDER resolution (coarse_res + 4k steps, capped at
    INTERIOR_MAX_RES) whose bbox cover stays within
    INTERIOR_CELL_BUDGET cells.  The ladder quantization matters: the
    point side computes one cell key per DISTINCT level in the polygon
    set, so free-form levels would multiply the probe stream — with
    the ladder a mixed city/region polygon table uses 2 levels."""
    f = coarse_res
    cand = coarse_res
    while cand <= INTERIOR_MAX_RES:
        x0, y1 = cells.cell_xy_np(np.array([ylo]), np.array([xlo]), cand)
        x1, y0 = cells.cell_xy_np(np.array([yhi]), np.array([xhi]), cand)
        n = (int(x1[0]) - int(x0[0]) + 1) * (int(y1[0]) - int(y0[0]) + 1)
        if n > INTERIOR_CELL_BUDGET:
            break
        f = cand
        cand += 4
    return f


def _classify_cover(geom: dict, f: int) -> tuple[np.ndarray, np.ndarray]:
    """Classify every cell of the polygon's bbox cover at resolution
    ``f`` as interior / boundary / exterior, EXACTLY:

    the runtime verdict (even-odd over all rings) changes only across
    ring edges, so a cell rectangle touched by NO edge has a constant
    verdict equal to its corners' verdict.  Edge-vs-rectangle uses the
    exact separating test (bbox overlap AND the 4 rect corners not
    strictly on one side of the edge line; a corner exactly on the
    line counts as touching — conservative toward 'boundary').

    Returns (cell_ids, interior_flags) with exterior cells DROPPED —
    a point in an exterior cell cannot be inside the polygon, so it
    need not even become a join candidate.
    """
    rings = geom["outer"] + geom["hole"]
    ys_all = np.concatenate([r[0] for r in rings])
    xs_all = np.concatenate([r[1] for r in rings])
    cell_ids = cells.cells_covering_bbox(
        float(ys_all.min()), float(ys_all.max()),
        float(xs_all.min()), float(xs_all.max()), f,
    )
    _r, x, y = cells.cell_decode_np(cell_ids)
    nx, ny = 1 << (f + 1), 1 << f
    xlo = x * 360.0 / nx - 180.0
    xhi = (x + 1) * 360.0 / nx - 180.0
    yhi = 90.0 - y * 180.0 / ny
    ylo = 90.0 - (y + 1) * 180.0 / ny

    has_edge = np.zeros(len(cell_ids), dtype=bool)
    for ys, xs in rings:
        y1, y2 = ys[:-1][None, :], ys[1:][None, :]
        x1, x2 = xs[:-1][None, :], xs[1:][None, :]
        ov = (
            (np.minimum(x1, x2) <= xhi[:, None])
            & (np.maximum(x1, x2) >= xlo[:, None])
            & (np.minimum(y1, y2) <= yhi[:, None])
            & (np.maximum(y1, y2) >= ylo[:, None])
        )
        dx, dy = x2 - x1, y2 - y1
        allpos = np.ones_like(ov)
        allneg = np.ones_like(ov)
        for cx, cy in ((xlo, ylo), (xlo, yhi), (xhi, ylo), (xhi, yhi)):
            cr = dx * (cy[:, None] - y1) - dy * (cx[:, None] - x1)
            allpos &= cr > 0
            allneg &= cr < 0
        has_edge |= (ov & ~allpos & ~allneg).any(axis=1)

    cx = np.concatenate([xlo, xlo, xhi, xhi])
    cy = np.concatenate([ylo, yhi, ylo, yhi])
    v = _corner_verdict(geom, cy, cx).reshape(4, -1)
    interior = v.all(axis=0) & ~has_edge
    exterior = (~v).all(axis=0) & ~has_edge
    keep = ~exterior
    return cell_ids[keep], interior[keep]


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    point_id: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    broadcast_polygons: bool = True,
    refine: str = "auto",
    interior_shortcut: bool = True,
) -> DataFrame:
    """Rows of ``points`` (all columns preserved) paired with every
    ``polygon_id`` containing them.

    ``refine='auto'`` (default) picks the jvm HOF refine while the
    total edge count fits JVM_REFINE_MAX_EDGES and the Arrow pandas
    refine beyond it — both produce bit-identical verdicts (same op
    order, pinned by the 3-path tests). Pass 'jvm'/'pandas' to force.
    """
    if not broadcast_polygons:
        return _point_in_polygon_distributed(points, polygons, res, point_id, lat, lon)

    # driver-side: geometry grouped per POLYGON (all its outer + hole
    # rings together) so one UDF verdict = outer-minus-holes in a
    # single pass. The polygon table is dimension-sized by contract —
    # identical assumption to broadcasting it.
    rows = polygons.select("polygon_id", "ring_role", "ring").collect()
    by_pid: dict[int, dict[str, list]] = {}
    for r in rows:
        by_pid.setdefault(r["polygon_id"], {"outer": [], "hole": []})[
            r["ring_role"]
        ].append(_ring_arrays(r["ring"]))
    pids = sorted(by_pid)
    geoms = [by_pid[p] for p in pids]  # indexed by __geom

    # Adaptive fine covering with interior/exterior classification
    # (round 4): each polygon's candidate cells live at the finest
    # per-polygon resolution within INTERIOR_CELL_BUDGET.  Cells
    # provably inside the polygon short-circuit the refine entirely
    # (verdict true, no ray cast — the bulk of truly-contained
    # points); provably-outside cells never become candidates at all
    # (at the old coarse cover a 2.8-degree cell made every point
    # near a city a candidate for its 0.3-degree polygon).  Only the
    # thin boundary band pays the per-edge refine.
    cell_rows: list[tuple[int, int, int, bool]] = []  # (res, cell, geom, interior)
    used_res: set[int] = set()
    for gi, p in enumerate(pids):
        rings = by_pid[p]["outer"] + by_pid[p]["hole"]
        ys_all = np.concatenate([r[0] for r in rings])
        xs_all = np.concatenate([r[1] for r in rings])
        if interior_shortcut:
            f = _pick_cover_res(
                float(ys_all.min()), float(ys_all.max()),
                float(xs_all.min()), float(xs_all.max()), res,
            )
            ids, inter = _classify_cover(by_pid[p], f)
        else:  # plain coarse bbox cover (pre-round-4 behavior, for A/B)
            f = res
            ids = np.unique(
                np.concatenate(
                    [
                        cells.cells_covering_bbox(
                            float(ys.min()), float(ys.max()),
                            float(xs.min()), float(xs.max()), res,
                        )
                        for ys, xs in rings
                    ]
                )
            )
            inter = np.zeros(len(ids), dtype=bool)
        used_res.add(f)
        cell_rows.extend(
            (f, int(c), gi, bool(i)) for c, i in zip(ids.tolist(), inter.tolist())
        )

    spark = points.sparkSession
    pcells = F.broadcast(
        spark.createDataFrame(
            cell_rows, "res int, cell long, __geom int, __interior boolean"
        )
    )

    lat_c, lon_c = F.col(lat), F.col(lon)
    if refine == "auto":
        total_edges = sum(
            len(ys) - 1 for g in geoms for ys, _xs in g["outer"] + g["hole"]
        )
        refine = "jvm" if total_edges <= JVM_REFINE_MAX_EDGES else "pandas"
    if refine == "jvm":
        outer_by_geom = F.array(*[_rings_lit(g["outer"]) for g in geoms])
        hole_by_geom = F.array(*[_rings_lit(g["hole"]) for g in geoms])
        # bbox short-circuit: covering cells are coarser than the
        # polygon, so most candidates fail four double compares and
        # never reach the per-edge ray cast (And short-circuits)
        bboxes = []
        for g in geoms:
            ys = np.concatenate([r[0] for r in g["outer"]])
            xs = np.concatenate([r[1] for r in g["outer"]])
            bboxes.append(
                F.struct(
                    F.lit(float(ys.min())).alias("ymin"),
                    F.lit(float(ys.max())).alias("ymax"),
                    F.lit(float(xs.min())).alias("xmin"),
                    F.lit(float(xs.max())).alias("xmax"),
                )
            )
        bb = F.element_at(F.array(*bboxes), F.col("__geom") + 1)
        in_bbox = (
            (lat_c >= bb["ymin"])
            & (lat_c <= bb["ymax"])
            & (lon_c >= bb["xmin"])
            & (lon_c <= bb["xmax"])
        )
        # The exists() conjuncts reference lat/lon ONLY inside lambda
        # bodies; under certain exprId alignments Catalyst's predicate
        # pushdown mis-computes their references as right-side-only and
        # pushes them below the broadcast exchange, yielding an invalid
        # `!Filter` plan that fails attribute binding at runtime
        # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; pinned by
        # tests/test_spatial.py::test_pip_after_foreign_latlon_df).
        # Anchor the element_at index with a null-safe term that
        # references lat/lon as plain attributes so every conjunct
        # visibly spans both join sides. Semantics unchanged: null
        # lat/lon -> null index -> null exists -> row dropped, exactly
        # as the original predicate behaved.
        anchor = F.when(
            lat_c.isNull() | lon_c.isNull(), F.lit(None).cast("int")
        ).otherwise(F.lit(0))
        # interior cells short-circuit: the whole refine runs only on
        # boundary-band candidates (Or short-circuits; __interior is a
        # codegen'd broadcast column, the HOF casts are interpreted)
        inside_pred = F.col("__interior") | (
            in_bbox
            & F.exists(
                F.element_at(outer_by_geom, F.col("__geom") + 1 + anchor),
                lambda r: _odd_crossings(r, lat_c, lon_c),
            )
            & ~F.exists(
                F.element_at(hole_by_geom, F.col("__geom") + 1 + anchor),
                lambda r: _odd_crossings(r, lat_c, lon_c),
            )
        )
    elif refine == "pandas":

        @F.pandas_udf(BooleanType())
        def inside_udf(lat_s: pd.Series, lon_s: pd.Series, geom_s: pd.Series) -> pd.Series:
            out = np.zeros(len(lat_s), dtype=bool)
            py = lat_s.to_numpy(dtype=np.float64)
            px = lon_s.to_numpy(dtype=np.float64)
            gi = geom_s.to_numpy()
            for g in np.unique(gi):
                m = gi == g
                rings = geoms[int(g)]
                in_outer = np.zeros(int(m.sum()), dtype=bool)
                for ys, xs in rings["outer"]:
                    in_outer |= _ray_cast_batch(py[m], px[m], ys, xs)
                for ys, xs in rings["hole"]:
                    in_outer &= ~_ray_cast_batch(py[m], px[m], ys, xs)
                out[m] = in_outer
            return pd.Series(out)

        inside_pred = F.col("__interior") | inside_udf(lat_c, lon_c, F.col("__geom"))
    else:
        raise ValueError(f"unknown refine engine: {refine!r}")

    # one cell per point per USED resolution (usually 1-2 distinct
    # levels across the polygon set); a polygon's cells all live at
    # its single resolution and are distinct, so each (point, polygon)
    # candidate appears exactly once: the filtered join IS the result
    # — fully narrow, zero shuffles.
    levels = sorted(used_res)
    if len(levels) == 1:
        pts = points.withColumn("__cell", cells.cell_encode(lat_c, lon_c, levels[0]))
        join_cond = pts["__cell"] == pcells["cell"]
    else:
        pts = points.withColumn(
            "__rc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("r"),
                            cells.cell_encode(lat_c, lon_c, r).alias("c"),
                        )
                        for r in levels
                    ]
                )
            ),
        )
        join_cond = (pts["__rc"]["r"] == pcells["res"]) & (
            pts["__rc"]["c"] == pcells["cell"]
        )
    pid_arr = F.array(*[F.lit(p) for p in pids])
    passthrough = [c for c in points.columns if c != point_id]
    return (
        pts.join(pcells, join_cond, "inner")
        .where(inside_pred)
        .select(
            point_id, *passthrough, F.element_at(pid_arr, F.col("__geom") + 1).alias("polygon_id")
        )
    )


# ---------------------------------------------------------------------------
# distributed path (very large polygon tables)
# ---------------------------------------------------------------------------


@F.pandas_udf(ArrayType(LongType(), False))
def _covering_cells_udf(rings: pd.Series, res_s: pd.Series) -> pd.Series:
    """ring (array<struct<lat,lon>>) -> covering cell ids (bbox cover)."""

    def cover(args):
        ring, res = args
        ys, xs = _ring_arrays(ring)
        return cells.cells_covering_bbox(
            float(ys.min()), float(ys.max()), float(xs.min()), float(xs.max()), int(res)
        ).tolist()

    return pd.Series([cover(a) for a in zip(rings, res_s)])


@F.pandas_udf(BooleanType())
def _ray_cast_udf(lat_s: pd.Series, lon_s: pd.Series, rings: pd.Series) -> pd.Series:
    """Ray cast with per-row rings (distributed path). Rows sharing a
    ring object within the batch are grouped to keep numpy batching."""
    py = lat_s.to_numpy(dtype=np.float64)
    px = lon_s.to_numpy(dtype=np.float64)
    out = np.zeros(len(py), dtype=bool)
    # group rows by ring identity (first-vertex + length fingerprint)
    groups: dict[tuple, list[int]] = {}
    ring_of: dict[tuple, object] = {}
    for i, ring in enumerate(rings):
        mid = ring[len(ring) // 2]
        k = (len(ring), ring[0]["lat"], ring[0]["lon"], mid["lat"], mid["lon"],
             ring[1]["lat"], ring[1]["lon"])
        groups.setdefault(k, []).append(i)
        ring_of[k] = ring
    for k, idxs in groups.items():
        ys, xs = _ring_arrays(ring_of[k])
        ii = np.array(idxs)
        out[ii] = _ray_cast_batch(py[ii], px[ii], ys, xs)
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


def _point_in_polygon_distributed(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    point_id: str,
    lat: str,
    lon: str,
) -> DataFrame:
    pts = points.withColumn("__cell", cells.cell_encode(F.col(lat), F.col(lon), res))
    pcells = polygon_cells(polygons, res)
    cand = pts.join(pcells, pts["__cell"] == pcells["cell"], "inner")
    refined = cand.withColumn(
        "__inside", _ray_cast_udf(F.col(lat), F.col(lon), F.col("ring"))
    )
    passthrough = [c for c in points.columns if c != point_id]
    return (
        refined.groupBy(point_id, "polygon_id")
        .agg(
            F.max(F.when(F.col("ring_role") == "outer", F.col("__inside")).otherwise(False)).alias(
                "__in_outer"
            ),
            F.max(F.when(F.col("ring_role") == "hole", F.col("__inside")).otherwise(False)).alias(
                "__in_hole"
            ),
            *[F.first(c).alias(c) for c in passthrough],
        )
        .where(F.col("__in_outer") & ~F.col("__in_hole"))
        .select(point_id, *passthrough, "polygon_id")
    )


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
