"""Rank-biased overlap (operators/retrieval.rank_biased_overlap):
identical / disjoint / partial rankings vs the direct depth-sum
definition computed in exact Fractions."""

from __future__ import annotations

from fractions import Fraction

from skyway_spark.operators.retrieval import rank_biased_overlap


def _ref_rbo(a, b, k, p=Fraction(9, 10)):
    tot = Fraction(0)
    for d in range(1, k + 1):
        x = len(set(a[:d]) & set(b[:d]))
        tot += (1 - p) * p ** (d - 1) * Fraction(x, d)
    return tot


def _rank_df(spark, items):
    # higher score = earlier rank
    return spark.createDataFrame(
        [(it, float(len(items) - i)) for i, it in enumerate(items)],
        "host string, score double",
    )


def _run(spark, a, b, k):
    row = rank_biased_overlap(
        _rank_df(spark, a), _rank_df(spark, b),
        key="host", score_a="score", score_b="score", k=k,
    ).collect()[0]
    return Fraction(row.rbo_num, row.scale_den), row.n_shared


def test_identical_rankings(spark):
    items = [f"h{i}" for i in range(12)]
    got, n = _run(spark, items, items, 10)
    assert got == _ref_rbo(items, items, 10) == 1 - Fraction(9, 10) ** 10
    assert n == 10


def test_disjoint_rankings(spark):
    got, n = _run(spark, ["a", "b", "c"], ["x", "y", "z"], 10)
    assert got == 0 and n == 0


def test_partial_overlap_and_order_sensitivity(spark):
    a = ["a", "b", "c", "d", "e"]
    b = ["b", "a", "c", "x", "y"]
    got, _ = _run(spark, a, b, 5)
    assert got == _ref_rbo(a, b, 5)
    # reversing the tail of one ranking must change the score
    c = ["a", "b", "c", "e", "d"]
    got2, _ = _run(spark, a, c, 5)
    assert got2 == _ref_rbo(a, c, 5) != got
