"""Operator-level tests for the round-3g batch: focal raster stats,
discrete Voronoi assignment, and bounded BFS hop distances."""

from __future__ import annotations

from pyspark.sql import functions as F

from skyway_spark.operators.graph import bfs_hops
from skyway_spark.operators.spatialstats import discrete_voronoi, focal_stats


def test_focal_stats_queen_window(spark):
    # 2x2 block plus an isolated far cell
    cells = spark.createDataFrame(
        [(0, 0, 5), (0, 1, 2), (1, 0, 3), (1, 1, 4), (10, 10, 7)],
        "cx long, cy long, x long",
    )
    out = {(r.cx, r.cy): r for r in focal_stats(cells).collect()}
    assert len(out) == 5
    # every cell of the block sees all four values
    for key in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        r = out[key]
        assert (r.f_sum, r.f_max, r.f_min, r.f_n) == (14, 5, 2, 4)
    r = out[(10, 10)]
    assert (r.f_sum, r.f_max, r.f_min, r.f_n) == (7, 7, 7, 1)


def test_focal_stats_excludes_diagonal_beyond_one(spark):
    cells = spark.createDataFrame(
        [(0, 0, 1), (2, 2, 1)], "cx long, cy long, x long"
    )
    out = {(r.cx, r.cy): r for r in focal_stats(cells).collect()}
    # (2,2) is outside the 3x3 window of (0,0)
    assert out[(0, 0)].f_n == 1 and out[(2, 2)].f_n == 1


def test_discrete_voronoi_assignment_and_ties(spark):
    cells = spark.createDataFrame(
        [(0, 0, 1), (4, 0, 1), (2, 0, 1), (0, 3, 1)],
        "cx long, cy long, x long",
    )
    seeds = spark.createDataFrame(
        [(0, 0, 1), (4, 0, 2)], "sx long, sy long, seed_rk int"
    )
    out = {(r.cx, r.cy): r for r in discrete_voronoi(cells, seeds).collect()}
    assert out[(0, 0)].seed_rk == 1 and out[(0, 0)].d2 == 0
    assert out[(4, 0)].seed_rk == 2 and out[(4, 0)].d2 == 0
    # (2,0) is equidistant (d2=4) -> lower seed rank wins
    assert out[(2, 0)].seed_rk == 1 and out[(2, 0)].d2 == 4
    assert out[(0, 3)].seed_rk == 1 and out[(0, 3)].d2 == 9


def test_bfs_hops_levels_and_fanin(spark):
    # a -> b -> d, a -> c -> d, d -> e; f isolated from a
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("f", "a")],
        "src string, dst string",
    )
    roots = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r for r in bfs_hops(edges, roots).collect()}
    assert set(out) == {"a", "b", "c", "d", "e"}
    assert (out["a"].hop, out["a"].n_parents) == (0, 0)
    assert out["b"].hop == 1 and out["c"].hop == 1
    # d is reached at hop 2 through BOTH b and c
    assert (out["d"].hop, out["d"].n_parents) == (2, 2)
    assert (out["e"].hop, out["e"].n_parents) == (3, 1)


def test_bfs_hops_respects_bound(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    roots = spark.createDataFrame([(0,)], "node long")
    out = bfs_hops(edges, roots, max_hops=3)
    assert out.agg(F.max("hop")).first()[0] == 3
    assert out.count() == 4
