"""hull_diameter (operators/geometry): equals the brute-force point-set
diameter (hulling must not change the answer), witness determinism."""

from __future__ import annotations

from itertools import combinations

from skyway_spark.operators.geometry import convex_hulls, hull_diameter


def test_matches_bruteforce_set_diameter(spark):
    pts = []
    for e in range(4):
        pts += [
            (e, (7 * i * (e + 1) + 13) % 50, (11 * i + 5 * e) % 37)
            for i in range(25)
        ]
    df = spark.createDataFrame(pts, "entity long, x long, y long")
    got = {
        r.entity: (r.d2, (r.ax, r.ay), (r.bx, r.by))
        for r in hull_diameter(convex_hulls(df)).collect()
    }
    for e in range(4):
        ps = {(x, y) for ee, x, y in pts if ee == e}
        brute = max(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for a, b in combinations(ps, 2)
        )
        assert got[e][0] == brute, e
        # witness pair realizes the diameter and is ordered
        (ax, ay), (bx, by) = got[e][1], got[e][2]
        assert (ax - bx) ** 2 + (ay - by) ** 2 == brute
        assert (ax, ay) <= (bx, by)


def test_single_and_two_point_entities(spark):
    df = spark.createDataFrame(
        [(1, 5, 5), (2, 0, 0), (2, 3, 4)], "entity long, x long, y long"
    )
    got = {r.entity: (r.d2, r.ax, r.ay, r.bx, r.by)
           for r in hull_diameter(convex_hulls(df)).collect()}
    assert got[1] == (0, 5, 5, 5, 5)
    assert got[2] == (25, 0, 0, 3, 4)
