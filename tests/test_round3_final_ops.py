"""Unit pins for the last round-3 operator batch: nearest-centroid
confusion, marker thinning, viewshed blocking, mixture arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from skyway_spark.operators.similarity import nearest_centroid_confusion
from skyway_spark.operators.spatialstats import line_of_sight
from skyway_spark.operators.tiles import marker_thinning


def test_nearest_centroid_separable(spark):
    # two well-separated clusters classify perfectly
    rows = [(i, [0.3, 0.3], 0) for i in range(10)]
    rows += [(100 + i, [-0.3, -0.3], 1) for i in range(10)]
    rows += [(200, [0.29, 0.31], 0), (201, [-0.31, -0.29], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r.label, r.pred): r.n for r in nearest_centroid_confusion(df).collect()}
    assert got == {(0, 0): 11, (1, 1): 11}


def test_marker_thinning_representative(spark):
    # two points in the same z=3 tile: heavier one wins; ties by id
    pts = spark.createDataFrame(
        [(1, 5, 10.0, 20.0), (2, 9, 10.1, 20.1), (3, 9, 10.2, 20.05)],
        "id long, w long, lat double, lon double",
    )
    out = marker_thinning(pts, zooms=(3,)).collect()
    (r,) = out
    assert (r.n_points, r.rep_id, r.rep_w) == (3, 3, 9)  # max (w, id)


def test_line_of_sight_blocking(spark):
    # flat terrain except one wall cell on the straight line
    pairs = spark.createDataFrame(
        [(0, 0, 10, 0), (0, 0, 0, 8), (0, 0, 1, 0)],
        "ax long, ay long, bx long, by long",
    )

    def h(x, y):
        return F.when((x == 5) & (y == 0), F.lit(1000)).otherwise(F.lit(0))

    got = {
        (r.ax, r.ay, r.bx, r.by): (r.steps, r.n_blockers, r.visible)
        for r in line_of_sight(pairs, h, tower=50).collect()
    }
    assert got[(0, 0, 10, 0)] == (10, 1, False)  # wall at (5,0) blocks
    assert got[(0, 0, 0, 8)] == (8, 0, True)     # clear column
    assert got[(0, 0, 1, 0)] == (1, 0, True)     # adjacent: no interior


def test_line_of_sight_grazing_exact(spark):
    # sightline from h=100(+0 tower) to h=0 over 10 steps; obstacle at
    # k=5 of height exactly the interpolated 50 does NOT block (strict >)
    pairs = spark.createDataFrame([(0, 0, 10, 0)], "ax long, ay long, bx long, by long")

    def h_eq(x, y):
        return (
            F.when((x == 0) & (y == 0), F.lit(100))
            .when((x == 5) & (y == 0), F.lit(50))
            .otherwise(F.lit(0))
        )

    (r,) = line_of_sight(pairs, h_eq, tower=0).collect()
    assert r.visible

    def h_gt(x, y):
        return (
            F.when((x == 0) & (y == 0), F.lit(100))
            .when((x == 5) & (y == 0), F.lit(51))
            .otherwise(F.lit(0))
        )

    (r2,) = line_of_sight(pairs, h_gt, tower=0).collect()
    assert not r2.visible and r2.n_blockers == 1
