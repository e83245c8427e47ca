"""Spatial colocation participation index + greedy set cover:
reference interpreters and invariants."""

from __future__ import annotations

from skyway_spark.operators.sampling import greedy_set_cover
from skyway_spark.operators.spatialstats import colocation_pairs


def test_colocation_hand_case(spark):
    # cafe in cells {1,2,3}; stop in {2,3,4,5}; park in {9}
    rows = (
        [("cafe", c, 0) for c in (1, 2, 3)]
        + [("stop", c, 0) for c in (2, 3, 4, 5)]
        + [("park", 9, 0)]
        + [("cafe", 2, 0)]  # duplicate presence must not double-count
    )
    df = spark.createDataFrame(rows, "t string, cx long, cy long")
    out = {(r.type_a, r.type_b): r for r in colocation_pairs(df).collect()}
    r = out[("cafe", "stop")]
    assert (r.n_both, r.n_a, r.n_b) == (2, 3, 4)
    assert r.pi == min(2 / 3, 2 / 4)
    assert ("cafe", "park") not in out  # no shared cell -> no row
    assert ("park", "stop") not in out


def _ref_cover(doc_terms, k):
    covered, rows, total = set(), [], 0
    picked = set()
    for i in range(1, k + 1):
        best = None
        for d, ts in doc_terms.items():
            if d in picked:
                continue
            gain = len(ts - covered)
            if gain > 0 and (best is None or (-gain, d) < (-best[1], best[0])):
                best = (d, gain)
        if best is None:
            break
        d, gain = best
        picked.add(d)
        covered |= doc_terms[d]
        total += gain
        rows.append((i, d, gain, total))
    return rows


def test_set_cover_greedy_order_and_early_stop(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 terms
            (2, "a b"),              # subset of 1
            (3, "e f g"),            # 3 new
            (4, "c e h"),            # 1 new after 1,3
            (5, "a"),                # never adds
        ],
        "doc_id long, text string",
    )
    out = [
        (r.pick_order, r.doc_id, r.new_terms, r.covered_total)
        for r in greedy_set_cover(docs, k=10).orderBy("pick_order").collect()
    ]
    terms = {1: set("abcd"), 2: set("ab"), 3: set("efg"), 4: set("ceh"), 5: set("a")}
    assert out == _ref_cover(terms, 10)
    assert out[0][1] == 1 and out[1][1] == 3 and out[2][1] == 4
    assert len(out) == 3  # early stop: everything covered
    assert out[-1][3] == 8


def test_set_cover_tie_smallest_id(spark):
    docs = spark.createDataFrame(
        [(7, "x y"), (3, "p q"), (9, "x y p q")],
        "doc_id long, text string",
    )
    out = greedy_set_cover(docs, k=2).orderBy("pick_order").collect()
    assert out[0].doc_id == 9  # biggest gain first
    assert len(out) == 1


def test_set_cover_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    out = greedy_set_cover(docs, k=5, ngram=2).orderBy("pick_order").collect()
    # bigrams: doc1 {a b, b c}, doc2 {b c, c d} -> pick 1 (tie 2@2 vs 1@2
    # broken by id), then doc2 adds only "c d"
    assert [(r.doc_id, r.new_terms) for r in out] == [(1, 2), (2, 1)]
