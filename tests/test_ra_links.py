"""RA link prediction (operators/graph.ra_link_prediction): hand graph
with known scores, existing-edge exclusion, hub discounting."""

from __future__ import annotations

from skyway_spark.operators.graph import ra_link_prediction

SCALE = 1 << 20


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_hand_graph_scores(spark):
    # star around z (deg 4) plus a private bridge w (deg 2) between a, b
    pairs = [("z", "a"), ("z", "b"), ("z", "c"), ("z", "d"), ("w", "a"), ("w", "b")]
    got = {
        (r.a, r.b): (r.n_common, r.ra_score)
        for r in ra_link_prediction(_edges(spark, pairs), scale=SCALE).collect()
    }
    # (a,b): common z (deg 4) + w (deg 2) -> scale/4 + scale/2
    assert got[("a", "b")] == (2, SCALE // 4 + SCALE // 2)
    # (c,d): common z only
    assert got[("c", "d")] == (1, SCALE // 4)
    # the low-degree bridge dominates the hub: (a,b) outranks (c,d)
    assert got[("a", "b")][1] > got[("c", "d")][1]


def test_existing_edges_excluded_and_direction_ignored(spark):
    pairs = [("z", "a"), ("b", "z"), ("a", "b")]  # a-b already linked
    got = ra_link_prediction(_edges(spark, pairs)).collect()
    assert all((r.a, r.b) != ("a", "b") for r in got)
