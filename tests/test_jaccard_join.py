"""jaccard_prefix_join (operators/dedup): prefix-filter completeness vs
brute force, threshold exactness at the boundary."""

from __future__ import annotations

from skyway_spark.operators.dedup import jaccard_prefix_join


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, t_pct):
    sets = [set(x.split()) for x in texts]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if inter * 100 >= t_pct * uni:
                out[(i, j)] = (inter, uni)
    return out


def test_completeness_vs_bruteforce(spark):
    texts = [
        "a b c d e", "a b c d f", "a b c d e", "x y z", "x y w",
        "a b c g h i", "p q", "p q r s t u v",
    ]
    for t in (50, 66, 80, 100):
        got = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in jaccard_prefix_join(_docs(spark, texts), threshold_pct=t).collect()
        }
        assert got == _brute(texts, t), t


def test_boundary_exactness(spark):
    # J = 3/5 exactly: must pass at 60, fail at 61
    texts = ["a b c d", "a b c e"]
    assert jaccard_prefix_join(_docs(spark, texts), threshold_pct=60).count() == 1
    assert jaccard_prefix_join(_docs(spark, texts), threshold_pct=61).count() == 0
