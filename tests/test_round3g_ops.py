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


def test_concordance_contexts(spark):
    from skyway_spark.operators.textstats import concordance

    docs = spark.createDataFrame(
        [(1, "table a b table c"), (2, "x table"), (3, "no hits here")],
        "doc_id long, text string",
    )
    out = {(r.id, r.pos): r for r in concordance(docs, "table").collect()}
    assert set(out) == {(1, 1), (1, 4), (2, 2)}
    assert (out[(1, 1)].left_ctx, out[(1, 1)].right_ctx) == ("", "a b")
    assert (out[(1, 4)].left_ctx, out[(1, 4)].right_ctx) == ("a b", "c")
    assert (out[(2, 2)].left_ctx, out[(2, 2)].right_ctx) == ("x", "")


def test_rle_rows_runs(spark):
    from skyway_spark.operators.spatialstats import rle_rows

    cells = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (7, 0), (5, 1)], "cx long, cy long"
    )
    out = {r.cy: r for r in rle_rows(cells).collect()}
    assert (out[0].n_cells, out[0].n_runs, out[0].max_run) == (4, 2, 3)
    assert (out[1].n_cells, out[1].n_runs, out[1].max_run) == (1, 1, 1)


def test_acf_counts_lag_alignment(spark):
    from skyway_spark.operators.timeseries import acf_counts

    counts = spark.createDataFrame(
        [(0, 2), (1, 3), (2, 5), (4, 7)], "h long, x long"
    )
    out = {r.lag: r for r in acf_counts(counts, max_lag=2).collect()}
    # lag 1: (0,1) (1,2) pairs -> 2*3 + 3*5 = 21; (3,4) missing, (2,3) missing
    assert (out[1].n_pairs, out[1].sum_xy) == (2, 21)
    # lag 2: (0,2) and (2,4) -> 2*5 + 5*7 = 45
    assert (out[2].n_pairs, out[2].sum_xy, out[2].sum_x, out[2].sum_y) == (
        2, 45, 7, 12,
    )


def test_kmv_distinct_small_group_falls_back(spark):
    from skyway_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 2, 1]] + [("b", v) for v in range(200)],
        "g string, v long",
    )
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    # group a has 3 distinct values < k -> exact fallback
    assert out["a"].kth_min is None and out["a"].kmv_est == 3
    r = out["b"]
    assert r.n_hashes == 200 and r.kth_min is not None
    # estimate within a loose multiplicative band of the truth
    assert 200 / 3 <= r.kmv_est <= 200 * 3


def test_resample_tracks_interpolation(spark):
    from skyway_spark.operators.trajectory import resample_tracks

    # one user: points at t=5,25 moving x 0->10, y 100->90 (negative slope)
    pts = spark.createDataFrame(
        [(1, 5, 0, 100), (1, 25, 10, 90), (2, 3, 7, 7)],
        "user_id long, t long, x long, y long",
    )
    out = {(r.user_id, r.g): r for r in resample_tracks(pts, 10).collect()}
    # grid for user 1: 10, 20 (both < 25); user 2 has a single point -> none
    assert set(out) == {(1, 10), (1, 20)}
    # t=10: x = 0 + floor(10*5/20) = 2; y = 100 + floor(-10*5/20) = 100 + (-3) = 97
    assert (out[(1, 10)].xi, out[(1, 10)].yi) == (2, 97)
    # t=20: x = floor(10*15/20) = 7; y = 100 + floor(-10*15/20) = 100 - 8 = 92
    assert (out[(1, 20)].xi, out[(1, 20)].yi) == (7, 92)


def test_resample_tracks_on_grid_point_is_exact(spark):
    from skyway_spark.operators.trajectory import resample_tracks

    pts = spark.createDataFrame(
        [(1, 0, 3, 4), (1, 10, 13, 14), (1, 20, 23, 24)],
        "user_id long, t long, x long, y long",
    )
    out = {r.g: r for r in resample_tracks(pts, 10).collect()}
    # g=0 and g=10 coincide with points -> exact positions; g=20 excluded (== t_max)
    assert set(out) == {0, 10}
    assert (out[0].xi, out[0].yi) == (3, 4)
    assert (out[10].xi, out[10].yi) == (13, 14)


def test_dilate_cells_distances(spark):
    from skyway_spark.operators.spatialstats import dilate_cells

    src = spark.createDataFrame([(0, 0), (4, 0)], "cx long, cy long")
    out = {(r.cx, r.cy): r for r in dilate_cells(src, radius=2).collect()}
    # 2 sources x 25 cells with overlap at x=2 band
    assert out[(0, 0)].d_cheb == 0 and out[(0, 0)].n_sources == 1
    assert out[(2, 0)].d_cheb == 2 and out[(2, 0)].n_sources == 2
    assert out[(6, 0)].d_cheb == 2 and out[(6, 0)].n_sources == 1
    assert (3, 0) in out and out[(3, 0)].d_cheb == 1
    assert (7, 0) not in out  # beyond radius of both


def test_mann_kendall_monotone_and_flat(spark):
    from skyway_spark.operators.spatialstats import mann_kendall

    daily = spark.createDataFrame(
        # cell A strictly rising, cell B constant
        [(0, 0, d, d + 1) for d in range(4)] + [(1, 1, d, 5) for d in range(4)],
        "cx long, cy long, d long, y long",
    )
    out = {(r.cx, r.cy): r for r in mann_kendall(daily).collect()}
    a = out[(0, 0)]
    assert (a.n_days, a.n_pairs, a.n_pos, a.n_neg, a.s) == (4, 6, 6, 0, 6)
    b = out[(1, 1)]
    assert (b.n_pairs, b.s) == (6, 0)
