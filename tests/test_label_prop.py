"""Synchronous label propagation (operators/graph.label_propagation):
two-clique barbell splits into two communities, tie determinism,
isolated-pair behavior, and agreement with a reference interpreter."""

from __future__ import annotations

from collections import Counter

from skyway_spark.operators.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ref_lpa(pairs, iters):
    und = set()
    for a, b in pairs:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nodes = {a for a, _ in und}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            votes = Counter(lab[b] for a, b in und if a == n)
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[n] = best[0]
            else:
                nxt[n] = lab[n]
        lab = nxt
    return lab


def test_barbell_two_communities(spark):
    # two 4-cliques joined by one bridge edge -> two communities
    cl1 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
           ("a2", "a4"), ("a3", "a4")]
    cl2 = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"),
           ("b2", "b4"), ("b3", "b4")]
    pairs = cl1 + cl2 + [("a1", "b1")]
    out = {r.node: r.label for r in label_propagation(_edges(spark, pairs)).collect()}
    assert out == _ref_lpa(pairs, 3)
    # the two cliques end under different labels
    assert len({out[n] for n in ("a2", "a3", "a4")}) == 1
    assert len({out[n] for n in ("b2", "b3", "b4")}) == 1
    assert out["a2"] != out["b2"]


def test_tie_breaks_to_smallest_label(spark):
    # path x - m - y: m's neighbors vote x and y once each -> m takes min
    pairs = [("x", "m"), ("m", "y")]
    out = {r.node: r.label for r in
           label_propagation(_edges(spark, pairs), iters=1).collect()}
    assert out["m"] == "x"
    assert out == _ref_lpa(pairs, 1)


def test_self_loops_ignored_and_pair(spark):
    pairs = [("p", "p"), ("p", "q")]
    out = {r.node: r.label for r in
           label_propagation(_edges(spark, pairs), iters=2).collect()}
    # a lone pair oscillates synchronously: after 2 rounds back to self
    assert out == _ref_lpa(pairs, 2)


def test_random_graph_matches_reference(spark):
    pairs = [
        (f"h{(i * 7) % 13}", f"h{(i * 11 + 3) % 13}") for i in range(40)
    ]
    for iters in (1, 2, 3):
        out = {r.node: r.label for r in
               label_propagation(_edges(spark, pairs), iters=iters).collect()}
        assert out == _ref_lpa(pairs, iters)
