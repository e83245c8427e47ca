"""Discrete Fréchet distance (operators/trajectory.frechet_tracks):
hand-computed DP cases, the doubling-back asymmetry vs Hausdorff,
agreement with a reference max-min DP, clipping and pair exclusion."""

from __future__ import annotations

from skyway_spark.operators.trajectory import frechet_tracks


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "entity long, track long, ts long, x long, y long"
    )


def _ref_frechet(a, b):
    BIG = 1 << 60
    n, m = len(a), len(b)
    Fm = [[BIG] * (m + 1) for _ in range(n + 1)]
    Fm[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d = max(abs(a[i - 1][0] - b[j - 1][0]), abs(a[i - 1][1] - b[j - 1][1]))
            Fm[i][j] = max(d, min(Fm[i - 1][j], Fm[i][j - 1], Fm[i - 1][j - 1]))
    return Fm[n][m]


def test_frechet_hand_case(spark):
    # identical tracks shifted by (3, 4): Chebyshev 4 everywhere
    a = [(0, 0), (10, 0), (20, 0)]
    b = [(x + 3, y + 4) for x, y in a]
    rows = [(1, 0, t, x, y) for t, (x, y) in enumerate(a)]
    rows += [(1, 1, t, x, y) for t, (x, y) in enumerate(b)]
    out = frechet_tracks(_pts(spark, rows), order_cols=("ts",)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity, r.track, r.n_a, r.n_b, r.frechet) == (1, 0, 3, 3, 4)
    assert r.frechet == _ref_frechet(a, b)


def test_frechet_doubling_back_vs_hausdorff(spark):
    # b walks the same points but doubles back: point SETS are equal
    # (Hausdorff 0) yet any monotone coupling must pair some far
    # points — Fréchet sees the reversal
    a = [(0, 0), (10, 0), (20, 0), (30, 0)]
    b = [(0, 0), (20, 0), (10, 0), (30, 0)]
    rows = [(9, 3, t, x, y) for t, (x, y) in enumerate(a)]
    rows += [(9, 4, t, x, y) for t, (x, y) in enumerate(b)]
    out = frechet_tracks(_pts(spark, rows), order_cols=("ts",)).collect()
    (r,) = out
    assert r.frechet == _ref_frechet(a, b)
    assert r.frechet == 10  # the backtrack forces a 10-off pairing


def test_frechet_matches_reference_dp(spark):
    a = [(i * 7 % 50, i * 13 % 40) for i in range(8)]
    b = [(i * 11 % 50, i * 5 % 40) for i in range(6)]
    rows = [(2, 0, t, x, y) for t, (x, y) in enumerate(a)]
    rows += [(2, 1, t, x, y) for t, (x, y) in enumerate(b)]
    out = frechet_tracks(_pts(spark, rows), order_cols=("ts",)).collect()
    (r,) = out
    assert (r.n_a, r.n_b) == (8, 6)
    assert r.frechet == _ref_frechet(a, b)


def test_frechet_clip_and_missing_side(spark):
    rows = [(1, 0, t, t, t) for t in range(12)]  # clipped to 8
    rows += [(1, 1, t, t, t) for t in range(12)]
    rows += [(2, 0, 0, 0, 0)]  # no track 1 -> no pair row
    out = frechet_tracks(_pts(spark, rows), max_pts=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity, r.n_a, r.n_b, r.frechet) == (1, 8, 8, 0)
