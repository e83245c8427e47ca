"""LCSS trajectory similarity (operators/trajectory.lcss_tracks):
hand-computed DP cases, the lcss <= min(n_a, n_b) bound, clipping, and
single-sided pair exclusion."""

from __future__ import annotations

from skyway_spark.operators.trajectory import lcss_tracks


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "entity long, track long, ts long, x long, y long"
    )


def _ref_lcss(a, b, ex, ey):
    n, m = len(a), len(b)
    L = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(a[i - 1][0] - b[j - 1][0]) <= ex and abs(a[i - 1][1] - b[j - 1][1]) <= ey:
                L[i][j] = L[i - 1][j - 1] + 1
            else:
                L[i][j] = max(L[i - 1][j], L[i][j - 1])
    return L[n][m]


def test_lcss_hand_case(spark):
    # track 0: A B C D ; track 1: A X C D (X far) -> LCSS 3
    a = [(0, 0), (10, 0), (20, 0), (30, 0)]
    b = [(0, 1), (500, 500), (20, 1), (30, 1)]
    rows = [(1, 0, t, x, y) for t, (x, y) in enumerate(a)]
    rows += [(1, 1, t, x, y) for t, (x, y) in enumerate(b)]
    out = lcss_tracks(
        _pts(spark, rows), eps_x=5, eps_y=5, order_cols=("ts",)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity, r.track, r.n_a, r.n_b, r.lcss) == (1, 0, 4, 4, 3)
    assert r.lcss == _ref_lcss(a, b, 5, 5)


def test_lcss_reordered_noise_robust(spark):
    # outlier point in the middle costs exactly one (vs Hausdorff blowup)
    a = [(i * 10, 0) for i in range(6)]
    b = a[:3] + [(9999, 9999)] + a[3:]
    rows = [(7, 4, t, x, y) for t, (x, y) in enumerate(a)]
    rows += [(7, 5, t, x, y) for t, (x, y) in enumerate(b)]
    out = lcss_tracks(_pts(spark, rows), eps_x=1, eps_y=1).collect()
    (r,) = [x for x in out if x.track == 4]
    assert r.lcss == 6 and r.n_b == 7


def test_lcss_clip_and_missing_side(spark):
    rows = [(1, 0, t, t, t) for t in range(12)]  # clipped to 8
    rows += [(1, 1, t, t, t) for t in range(12)]
    rows += [(2, 0, 0, 0, 0)]  # no track 1 -> no pair row
    out = lcss_tracks(_pts(spark, rows), eps_x=0, eps_y=0, max_pts=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity, r.n_a, r.n_b, r.lcss) == (1, 8, 8, 8)
