"""Term drift, bitext blocking, assortativity: reference interpreters
and structural invariants."""

from __future__ import annotations

from skyway_spark.operators.graph import assortativity
from skyway_spark.operators.textstats import bitext_candidates, term_drift


def test_term_drift_signs_and_order(spark):
    docs = spark.createDataFrame(
        [
            (True, "alpha alpha beta"),
            (True, "alpha gamma"),
            (False, "beta beta gamma"),
            (False, "beta delta"),
        ],
        "split_a boolean, text string",
    )
    out = term_drift(docs, top_k=10).collect()
    rows = {r.term: (r.c1, r.c2, r.skew) for r in out}
    # n1 = 5, n2 = 5 -> skew = 5*(c1 - c2)
    assert rows["alpha"] == (3, 0, 15)
    assert rows["beta"] == (1, 3, -10)
    assert rows["delta"] == (0, 1, -5)
    assert rows["gamma"] == (1, 1, 0)
    # ordered by |skew| desc then term
    assert [r.term for r in out] == ["alpha", "beta", "delta", "gamma"]


def test_bitext_blocking_and_tolerance(spark):
    mk = lambda n: " ".join(["w"] * n)
    docs = spark.createDataFrame(
        [
            (1, mk(40), "en", "s1"),
            (2, mk(44), "de", "s1"),   # same bucket (32): |4|*10 <= 84 ok
            (3, mk(70), "de", "s1"),   # adjacent bucket but 30*10 > 110 -> out
            (4, mk(40), "en", "s2"),   # different source -> never pairs
            (5, mk(41), "en", "s1"),   # same lang as 1 -> no (1,5); pairs w/ 2
            (6, mk(63), "fr", "s1"),   # bucket 1 vs 1 for doc 3: pairs w/ 3
            (7, mk(320), "en", "s1"),  # long pair 2 buckets apart:
            (8, mk(384), "de", "s1"),  # |64|*10 <= 704 — must be found
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = bitext_candidates(docs, bucket_tokens=32).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (1, 2) in pairs or (2, 1) in pairs
    got = {tuple(sorted(p)) for p in pairs}
    assert got == {(1, 2), (2, 5), (3, 6), (7, 8)}
    for r in out:
        assert r.lang_a < r.lang_b
        assert abs(r.len_a - r.len_b) * 10 <= r.len_a + r.len_b


def test_assortativity_star_is_degenerate_and_path(spark):
    # star K1,3: every edge joins deg-3 hub with deg-1 leaf -> r = -1
    star = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "src string, dst string"
    )
    r = assortativity(star).collect()[0]
    # j*k identical on all edges -> num = den (negative): r = 1? No:
    # hand-check: M=3, s_jk=9, s_sum=12, s_sq=30
    assert (r.m_edges, r.s_jk, r.s_sum, r.s_sq) == (3, 9, 12, 30)
    assert r.num == 4 * 3 * 9 - 144 and r.den == 2 * 3 * 30 - 144
    assert r.assortativity == r.num / r.den  # = -1.0
    assert r.assortativity == -1.0


def test_assortativity_dedup_and_selfloops(spark):
    # duplicate + reversed + self-loop edges collapse to one undirected edge
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")],
        "src string, dst string",
    )
    r = assortativity(e).collect()[0]
    assert (r.m_edges, r.s_jk, r.s_sum, r.s_sq) == (1, 1, 2, 2)
