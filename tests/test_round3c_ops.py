"""Round-3 late batch: STR spatial partitioning, Geary's C, skyline,
ring centroid, exact AUC, robots longest-match, readability, session
paths."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from skyway_spark.operators import partitioner, spatialstats
from skyway_spark.operators.geometry import ring_centroid
from skyway_spark.operators.stats import auc_exact
from skyway_spark.operators.textstats import readability
from skyway_spark.operators.trajectory import event_paths
from skyway_spark.operators.urls import robots_apply


# ---------------------------------------------------------------------------
# STR partitioning
# ---------------------------------------------------------------------------


def _pts(spark, n, parts=1):
    # deterministic scatter with duplicate coordinates to exercise ties
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 104729) % 997).alias("x"),
        ((F.col("id") * 7919) % 491).alias("y"),
    )


def _ntile_ref(ranks: int, n: int) -> list[int]:
    q, rem = divmod(ranks, n)
    out = []
    for b in range(n):
        out.extend([b] * (q + 1 if b < rem else q))
    return out


def test_global_rank_is_partition_independent(spark):
    for parts in (1, 7):
        df = _pts(spark, 500, parts)
        got = (
            partitioner.global_rank(
                df, ["x", "event_id"], F.expr("x div 64"), rank_name="r"
            )
            .select("event_id", "r")
            .collect()
        )
        ref = sorted(
            ((r["x"], r["event_id"]) for r in df.collect())
        )
        want = {eid: i + 1 for i, (_, eid) in enumerate(ref)}
        assert {r["event_id"]: r["r"] for r in got} == want


@pytest.mark.parametrize("n,sx,sy", [(500, 8, 4), (5, 8, 4), (37, 3, 5)])
def test_str_pack_matches_ntile_reference(spark, n, sx, sy):
    df = _pts(spark, n)
    got = partitioner.str_pack(
        df, sx=sx, sy=sy, x_col="x", y_col="y", id_col="event_id",
        x_block=64, y_block=64,
    ).collect()
    rows = [(r["x"], r["y"], r["event_id"]) for r in df.collect()]
    order_x = sorted(rows, key=lambda t: (t[0], t[2]))
    tx_ref = dict(zip([t[2] for t in order_x], _ntile_ref(len(rows), sx)))
    ty_ref = {}
    for tx, grp in itertools.groupby(
        sorted(rows, key=lambda t: (tx_ref[t[2]], t[1], t[2])),
        key=lambda t: tx_ref[t[2]],
    ):
        g = list(grp)
        for t, b in zip(g, _ntile_ref(len(g), sy)):
            ty_ref[t[2]] = b
    for r in got:
        assert (r["tx"], r["ty"]) == (tx_ref[r["event_id"]], ty_ref[r["event_id"]])


def test_str_tiles_are_balanced(spark):
    stats = partitioner.str_tile_stats(
        partitioner.str_pack(
            _pts(spark, 1000, 5), sx=8, sy=4, id_col="event_id",
            x_block=64, y_block=64,
        )
    ).collect()
    counts = [r["n_points"] for r in stats]
    assert len(stats) == 32 and sum(counts) == 1000
    # STR guarantee: equal-count tiles regardless of skew
    assert max(counts) - min(counts) <= 2  # +-1 per level


# ---------------------------------------------------------------------------
# Geary's C
# ---------------------------------------------------------------------------


def _gearys_brute(cells):
    n = len(cells)
    s = sum(x for _, _, x in cells)
    z = {(cx, cy): n * x - s for cx, cy, x in cells}
    num = w = 0
    for (cx, cy), zi in z.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (cx + dx, cy + dy) in z:
                num += (zi - z[(cx + dx, cy + dy)]) ** 2
                w += 1
    den = sum(v * v for v in z.values())
    return n, w, num, den


@pytest.mark.parametrize(
    "grid,expect_lt_1",
    [
        # smooth gradient: neighbors similar -> C < 1
        ([(0, 0, 1), (0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 5)], True),
        # checkerboard: neighbors dissimilar -> C > 1
        ([(0, 0, 9), (0, 1, 1), (1, 0, 1), (1, 1, 9), (0, 2, 9), (1, 2, 1)], False),
    ],
)
def test_gearys_c_matches_bruteforce(spark, grid, expect_lt_1):
    df = spark.createDataFrame([Row(cx=a, cy=b, x=c) for a, b, c in grid])
    got = spatialstats.gearys_c(df).collect()[0]
    n, w, num, den = _gearys_brute(grid)
    assert (got["n_cells"], got["w_pairs"], got["num_c"], got["den_z"]) == (
        n, w, num, den,
    )
    assert got["gearys_c"] == pytest.approx((n - 1) * num / (2 * w * den))
    assert (got["gearys_c"] < 1.0) == expect_lt_1


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def test_skyline_matches_bruteforce(spark):
    pts = [(5, 3), (5, 9), (2, 7), (2, 4), (8, 1), (8, 3), (1, 9), (3, 4), (3, 3)]
    df = spark.createDataFrame([Row(cx=a, cy=b) for a, b in pts])
    got = {(r["x"], r["y"]) for r in spatialstats.skyline_min(df).collect()}
    dominated = lambda p: any(  # noqa: E731
        q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
    )
    want = {p for p in set(pts) if not dominated(p)}
    assert got == want


# ---------------------------------------------------------------------------
# ring centroid
# ---------------------------------------------------------------------------


def test_ring_centroid_square(spark):
    ring = [(0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 0.0), (0.0, 0.0)]
    df = spark.createDataFrame(
        [Row(polygon_id=1, ring=[{"lat": a, "lon": b} for a, b in ring])]
    )
    got = ring_centroid(df).collect()[0]
    assert abs(got["area2"]) == pytest.approx(16.0)  # 2 * (4 x 2)
    assert got["centroid_lon"] == pytest.approx(2.0)
    assert got["centroid_lat"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# exact AUC
# ---------------------------------------------------------------------------


def test_auc_exact_with_ties(spark):
    # scores: pos {3, 2, 2}, neg {2, 1}; pairwise (pos vs neg):
    # 3>2, 3>1, 2=2 (x2 ties), 2>1 (x2) -> num = 2+2+1+1+2+2 = 10 of 12
    rows = [(3, True), (2, True), (2, True), (2, False), (1, False)]
    df = spark.createDataFrame([Row(score=s, label=b) for s, b in rows])
    got = auc_exact(df).collect()[0]
    assert (got["n_pos"], got["n_neg"], got["auc_num"]) == (3, 2, 10)
    assert got["auc"] == pytest.approx(10 / 12)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [Row(score=s, label=s >= 10) for s in (1, 2, 3, 10, 11)]
    )
    assert auc_exact(df).collect()[0]["auc"] == 1.0
    inv = df.select((-F.col("score")).alias("score"), "label")
    assert auc_exact(inv).collect()[0]["auc"] == 0.0


# ---------------------------------------------------------------------------
# robots longest-match
# ---------------------------------------------------------------------------


def test_robots_longest_match_precedence(spark):
    pages = spark.createDataFrame(
        [Row(url=u) for u in (
            "https://a.example/p/15",   # /p/1 disallow wins over ""
            "https://a.example/p/12",   # /p/12 allow wins (longest)
            "https://a.example/q",      # only default
            "https://b.example/p/1",    # no rules at all -> allowed
        )]
    )
    rules = spark.createDataFrame(
        [("a.example", "", True), ("a.example", "/p/1", False),
         ("a.example", "/p/12", True)],
        "host string, prefix string, allow boolean",
    )
    got = {r["url"]: (r["allowed"], r["rule_len"]) for r in
           robots_apply(pages, rules).collect()}
    assert got["https://a.example/p/15"] == (False, 4)
    assert got["https://a.example/p/12"] == (True, 5)
    assert got["https://a.example/q"] == (True, 0)
    assert got["https://b.example/p/1"] == (True, -1)


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_punctuated_vs_fallback(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="The cat sat. The dog ran! Did it?"),
         Row(doc_id=2, text=" ".join(["word"] * 60))]  # no punctuation
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    assert got[1]["n_sents"] == 3 and got[1]["n_words"] == 8
    # 60 words, no punctuation -> ceil(60/25) = 3 segment-sentences
    assert got[2]["n_sents"] == 3
    for r in got.values():
        assert r["readable"] == (r["fk_num"] <= 1200 * r["fk_den"])


# ---------------------------------------------------------------------------
# session paths
# ---------------------------------------------------------------------------


def test_event_paths_first_k_in_ts_order(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u, types in ((1, "abcde"), (2, "abc"), (3, "ab")):
        for i, ty in enumerate(types):
            rows.append(Row(user_id=u, ts=t0 + dt.timedelta(minutes=i),
                            event_id=u * 100 + i, event_type=ty))
    df = spark.createDataFrame(rows)
    got = {(r["path"], r["path_len"]): r["n_users"]
           for r in event_paths(df, k=3).collect()}
    assert got == {("a>b>c", 3): 2, ("a>b", 2): 1}


# ---------------------------------------------------------------------------
# NN self-join + Voronoi assignment
# ---------------------------------------------------------------------------


def test_nn_self_join_matches_bruteforce(spark):
    from skyway_spark.operators.knn import nn_self_join

    pts = [(1, 0, 0), (2, 3, 4), (3, 10, 10), (4, 10, 11), (5, 300, 300)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    # cell_size 64: ids 1-4 share the 3x3 ring; id 5 is isolated
    got = {r["id"]: (r["nn_id"], r["d2"]) for r in
           nn_self_join(df, cell_size=64).collect()}
    assert got == {1: (2, 25), 2: (1, 25), 3: (4, 1), 4: (3, 1)}
    # big cells: everyone reachable -> true global NN for id 5 too
    got_all = {r["id"]: r["nn_id"] for r in
               nn_self_join(df, cell_size=1024).collect()}
    assert got_all[5] == 4 and len(got_all) == 5


def test_nn_self_join_tie_breaks_to_lowest_id(spark):
    from skyway_spark.operators.knn import nn_self_join

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 2), (3, 2, 0)], "id long, x long, y long"
    )
    got = {r["id"]: r["nn_id"] for r in nn_self_join(df, cell_size=16).collect()}
    assert got[1] == 2  # d2=4 to both 2 and 3 -> lowest id


def test_voronoi_assign_nearest_and_ties(spark):
    from skyway_spark.operators.knn import voronoi_assign

    sites = [(0, 0.0, 0.0), (1, 0.0, 10.0)]
    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (2, 0.0, 9.0), (3, 0.0, 5.0)],
        "pid long, lat double, lon double",
    )
    got = {r["pid"]: r["site"] for r in voronoi_assign(df, sites).collect()}
    assert got == {1: 0, 2: 1, 3: 0}  # equidistant -> lowest site id


# ---------------------------------------------------------------------------
# URL templates, Simpson diversity, string-id components
# ---------------------------------------------------------------------------


def test_url_templates_digits_only_in_path(spark):
    from skyway_spark.operators.urls import url_templates

    df = spark.createDataFrame(
        [Row(url=u) for u in (
            "https://s7.example/items/123",
            "https://s7.example/items/99?page=2#x",   # query/fragment stripped
            "https://s7.example/items/123/reviews/4",
            "https://other.example/about",
        )]
    )
    got = {(r["host"], r["template"]): (r["n_urls"], r["n_distinct_urls"])
           for r in url_templates(df).collect()}
    # host digits survive (s7), path digits template away
    assert got[("s7.example", "/items/{d}")] == (2, 2)
    assert got[("s7.example", "/items/{d}/reviews/{d}")] == (1, 1)
    assert got[("other.example", "/about")] == (1, 1)


def test_simpson_diversity_bot_vs_plaza(spark):
    from skyway_spark.operators.spatialstats import simpson_diversity

    rows = [Row(user_id=1, cx=0, cy=0)] * 4 + [
        Row(user_id=u, cx=1, cy=1) for u in (1, 2, 3, 4)
    ]
    got = {(r["cx"], r["cy"]): r for r in
           simpson_diversity(spark.createDataFrame(rows)).collect()}
    bot, plaza = got[(0, 0)], got[(1, 1)]
    assert (bot["n_events"], bot["n_entities"], bot["div_num"]) == (4, 1, 0)
    assert (plaza["n_events"], plaza["n_entities"], plaza["div_num"]) == (4, 4, 12)
    assert plaza["div_den"] == 16


def test_connected_components_string_ids(spark):
    from skyway_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("x.com", "y.com"),
         ("z.com", "z.com")],  # self-loop-only node stays its own component
        "src string, dst string",
    )
    got = {r["node"]: r["component"] for r in
           connected_components(edges).collect()}
    assert got == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
                   "x.com": "x.com", "y.com": "x.com", "z.com": "z.com"}


# ---------------------------------------------------------------------------
# Sutherland-Hodgman clipping
# ---------------------------------------------------------------------------

_RING_SCHEMA = "pid long, ring array<struct<lat:double,lon:double>>"


def _closed(pts):
    return [{"lat": a, "lon": b} for a, b in pts + [pts[0]]]


def _clip_brute(pts, lat0, lat1, lon0, lon1):
    """Reference Sutherland-Hodgman on an open ring."""
    def clip(poly, inside, inter):
        out = []
        for i in range(len(poly)):
            v1, v2 = poly[i], poly[(i + 1) % len(poly)]
            if inside(v2):
                if not inside(v1):
                    out.append(inter(v1, v2))
                out.append(v2)
            elif inside(v1):
                out.append(inter(v1, v2))
        return out

    def ix_lon(c):
        return lambda v1, v2: (
            v1[0] + (v2[0] - v1[0]) * ((c - v1[1]) / (v2[1] - v1[1])), c)

    def ix_lat(c):
        return lambda v1, v2: (
            c, v1[1] + (v2[1] - v1[1]) * ((c - v1[0]) / (v2[0] - v1[0])))

    p = pts
    for inside, inter in (
        (lambda v: v[1] >= lon0, ix_lon(lon0)),
        (lambda v: v[1] <= lon1, ix_lon(lon1)),
        (lambda v: v[0] >= lat0, ix_lat(lat0)),
        (lambda v: v[0] <= lat1, ix_lat(lat1)),
    ):
        if len(p) < 2:
            return []
        p = clip(p, inside, inter)
    return p


@pytest.mark.parametrize(
    "ring,bbox",
    [
        # square half-in
        ([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
         (0.0, 20.0, 5.0, 20.0)),
        # diamond cut by every edge
        ([(0.0, 5.0), (5.0, 10.0), (10.0, 5.0), (5.0, 0.0)],
         (2.0, 8.0, 2.0, 8.0)),
        # fully inside
        ([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)],
         (0.0, 10.0, 0.0, 10.0)),
        # fully outside
        ([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0)], (50.0, 60.0, 50.0, 60.0)),
    ],
)
def test_clip_rings_matches_reference(spark, ring, bbox):
    from skyway_spark.operators.geometry import clip_rings_to_bbox

    df = spark.createDataFrame([(1, _closed(ring))], _RING_SCHEMA)
    got = clip_rings_to_bbox(df, *bbox).collect()[0]["clipped"]
    want = _clip_brute(ring, *bbox)
    assert [(v["lat"], v["lon"]) for v in got] == want
