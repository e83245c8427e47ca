"""Round-3e operators: co-citation host similarity
(operators/weblinks.cocitation), rolling distinct actives
(operators/timeseries.rolling_distinct_active), and deletion-
neighborhood fuzzy join (operators/dedup.fuzzy_join_lev1) — behavior
vs brute-force references plus the scale-shape properties each
docstring claims."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- cocitation


def _links_df(spark, rows):
    return spark.createDataFrame(rows, "src_url string, dst_host string")


def test_cocitation_counts_pages_not_links(spark):
    from skyway_spark.operators.weblinks import cocitation

    rows = [
        ("p1", "a.com"), ("p1", "b.com"), ("p1", "b.com"),  # dup link ignored
        ("p2", "a.com"), ("p2", "b.com"),
        ("p3", "a.com"), ("p3", "c.com"),
        ("p4", "c.com"),
    ]
    got = {
        (r.host_a, r.host_b): r.n_pages
        for r in cocitation(_links_df(spark, rows), min_count=1).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1}
    # min_count threshold drops the singleton pair
    got2 = {
        (r.host_a, r.host_b): r.n_pages
        for r in cocitation(_links_df(spark, rows), min_count=2).collect()
    }
    assert got2 == {("a.com", "b.com"): 2}


def test_cocitation_matches_bruteforce_on_fixture(spark):
    from skyway_spark.operators.weblinks import cocitation, extract_links
    from skyway_spark.sources.generate import generate_linked_pages

    links = extract_links(generate_linked_pages(spark, 300))
    got = {
        (r.host_a, r.host_b): r.n_pages
        for r in cocitation(links, min_count=1).collect()
    }
    per_page = {}
    for r in links.select("src_url", "dst_host").distinct().collect():
        per_page.setdefault(r.src_url, set()).add(r.dst_host)
    want = {}
    for hosts in per_page.values():
        for a, b in combinations(sorted(hosts), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
    for a, b in got:
        assert a < b  # each unordered pair exactly once


# ------------------------------------------------- rolling_distinct_active


def test_rolling_wau_bruteforce(spark):
    from skyway_spark.operators.timeseries import rolling_distinct_active

    rows = [  # (entity, day)
        ("u1", 1), ("u1", 1), ("u2", 1),
        ("u1", 3), ("u3", 5),
        ("u2", 12),
    ]
    df = spark.createDataFrame(rows, "user_id string, day long")
    got = {
        r.day: r.n_active
        for r in rolling_distinct_active(df, window=7).collect()
    }
    acts = set(rows)
    days = sorted({d for _, d in acts})
    want = {
        d: len({e for e, ad in acts if d - 7 < ad <= d}) for d in days
    }
    assert got == want
    # only observed days appear — no ghost trailing days
    assert set(got) == set(days)


def test_rolling_wau_window_one_is_dau(spark):
    from skyway_spark.operators.timeseries import rolling_distinct_active

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 2)], "user_id string, day long"
    )
    got = {r.day: r.n_active for r in rolling_distinct_active(df, window=1).collect()}
    assert got == {1: 2, 2: 1}


# ---------------------------------------------------------- fuzzy_join_lev1


def _sides(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "id long, key string")
    b = spark.createDataFrame(b_rows, "id long, key string")
    return a, b


def test_fuzzy_join_all_edit_kinds(spark):
    from skyway_spark.operators.dedup import fuzzy_join_lev1

    a, b = _sides(
        spark,
        [(1, "spark"), (2, "duck"), (3, "flink")],
        [
            (10, "spark"),   # exact
            (11, "spork"),   # substitution
            (12, "sparks"),  # insertion on b side
            (13, "spak"),    # deletion on b side
            (14, "duckdb"),  # distance 2 — excluded
            (15, "fink"),    # deletion
        ],
    )
    got = {(r.a_id, r.b_id): r.dist for r in fuzzy_join_lev1(a, b).collect()}
    assert got == {
        (1, 10): 0,
        (1, 11): 1,
        (1, 12): 1,
        (1, 13): 1,
        (3, 15): 1,
    }


def test_fuzzy_join_bruteforce_parity(spark):
    from skyway_spark.operators.dedup import fuzzy_join_lev1

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    words = ["alpha", "alphb", "alpa", "beta", "betas", "gamma", "gamm", "delta"]
    a_rows = [(i, w) for i, w in enumerate(words)]
    b_rows = [(100 + i, w) for i, w in enumerate(reversed(words))]
    a, b = _sides(spark, a_rows, b_rows)
    got = {(r.a_id, r.b_id): r.dist for r in fuzzy_join_lev1(a, b).collect()}
    want = {
        (ai, bi): lev(aw, bw)
        for ai, aw in a_rows
        for bi, bw in b_rows
        if lev(aw, bw) <= 1
    }
    assert got == want


def test_fuzzy_join_emits_each_pair_once(spark):
    from skyway_spark.operators.dedup import fuzzy_join_lev1

    # 'ab' and 'ba' are distance 2 (no shared deletion variant match at
    # lev<=1); 'ab' vs 'aab' share MULTIPLE variants → still one row
    a, b = _sides(spark, [(1, "ab")], [(2, "aab")])
    rows = fuzzy_join_lev1(a, b).collect()
    assert len(rows) == 1 and rows[0].dist == 1
