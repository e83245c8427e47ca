"""Polygon validity audit, join-count statistics, Gini concentration:
hand cases + reference interpreters."""

from __future__ import annotations

from skyway_spark.operators.geometry import polygon_validity
from skyway_spark.operators.spatialstats import gini_concentration, join_counts


def _verts(spark, rings):
    rows = [
        (pid, role, i, x, y)
        for pid, role, ring in rings
        for i, (x, y) in enumerate(ring)
    ]
    return spark.createDataFrame(
        rows, "polygon_id long, role string, i int, x long, y long"
    )


def test_validity_square_ccw_cw_and_bowtie(spark):
    rings = [
        (1, "outer", [(0, 0), (10, 0), (10, 10), (0, 10)]),        # CCW
        (2, "outer", [(0, 0), (0, 10), (10, 10), (10, 0)]),        # CW
        (3, "outer", [(0, 0), (10, 10), (10, 0), (0, 10)]),        # bowtie
        (4, "outer", [(0, 0), (30, 0), (15, 20)]),                 # triangle
    ]
    out = {r.polygon_id: r for r in polygon_validity(_verts(spark, rings)).collect()}
    assert (out[1].area2, out[1].is_ccw, out[1].n_crossings) == (200, True, 0)
    assert (out[2].area2, out[2].is_ccw, out[2].n_crossings) == (-200, False, 0)
    assert out[3].n_crossings == 1
    assert (out[4].area2, out[4].n_vertices) == (600, 3)


def test_validity_shared_endpoint_not_proper(spark):
    # "hourglass touching at a vertex": rings that merely touch have
    # no PROPER crossing
    rings = [(9, "outer", [(0, 0), (10, 10), (20, 0), (10, 10), (0, 20)])]
    out = polygon_validity(_verts(spark, rings)).collect()[0]
    assert out.n_crossings == 0


def test_join_counts_checkerboard_vs_blocks(spark):
    # 4x4 checkerboard of counts 5/1 with thr 4: every rook join is BW
    rows = [(x, y, 5 if (x + y) % 2 == 0 else 1)
            for x in range(4) for y in range(4)]
    cells = spark.createDataFrame(rows, "cx long, cy long, x long")
    r = join_counts(cells, hot_threshold=4).collect()[0]
    assert (r.n_cells, r.n_hot, r.w_pairs) == (16, 8, 24)
    assert (r.n_bb, r.n_bw, r.n_ww) == (0, 24, 0)
    assert r.expected_bb == 24 * 8 * 7 / (16 * 15)
    # two solid 2x4 blocks: BB and WW high, BW only on the seam
    rows = [(x, y, 5 if x < 2 else 1) for x in range(4) for y in range(4)]
    cells = spark.createDataFrame(rows, "cx long, cy long, x long")
    r = join_counts(cells, hot_threshold=4).collect()[0]
    assert (r.n_bb, r.n_bw, r.n_ww) == (10, 4, 10)


def test_gini_uniform_zero_and_extreme(spark):
    uni = spark.createDataFrame(
        [(i, 0, 7) for i in range(10)], "cx long, cy long, x long"
    )
    r = gini_concentration(uni).collect()[0]
    assert r.gini_num == 0 and r.gini == 0.0
    # all mass in one of n cells: gini = (n-1)/n
    ext = spark.createDataFrame(
        [(0, 0, 100)] + [(i, 0, 0) for i in range(1, 5)],
        "cx long, cy long, x long",
    )
    r = gini_concentration(ext).collect()[0]
    assert r.gini == (5 - 1) / 5


def test_gini_hand_case(spark):
    # x = [1, 3]: gini = sum((2i-n-1)x)/(n*sum) = (-1*1 + 1*3)/(2*4) = 0.25
    cells = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 3)], "cx long, cy long, x long"
    )
    r = gini_concentration(cells).collect()[0]
    assert (r.gini_num, r.gini_den, r.gini) == (2, 8, 0.25)
