"""Web link-graph operators (operators/weblinks.py): href extraction
from html bytes, host graph, anchor-text mining, DOM stats — behavior
plus the scale-shape property that extraction is shuffle-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyway_spark.operators import weblinks
from skyway_spark.sources.generate import LINK_HOSTS, generate_linked_pages


@pytest.fixture(scope="module")
def linked(spark):
    return generate_linked_pages(spark, 400).cache()


@pytest.fixture(scope="module")
def links(linked):
    return weblinks.extract_links(linked).cache()


def test_extract_links_parses_all_tags(spark, links, linked):
    # every link row round-trips: href embeds the dst page id whose
    # host matches dst_host, and anchor ends with that id
    rows = links.collect()
    assert rows, "fixture must emit links"
    for r in rows:
        pid = int(r.href.rsplit("/", 1)[1])
        assert r.dst_host == f"h{pid % LINK_HOSTS}.example"
        assert r.anchor.endswith(f" place {pid}")
        assert r.src_host == r.src_url.split("/")[2]
    # tag count equals the independent regexp census over html
    n_tags = linked.select(
        F.sum(F.regexp_count(F.decode("html", "utf-8"), F.lit("<a href")))
    ).first()[0]
    assert len(rows) == n_tags


def test_extract_links_is_scan_stage_only(links):
    """No exchange before the explode: extraction rides the scan."""
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_link_order_preserved(links):
    # link_no is the in-document ordinal: 0..n-1 per page, dense
    per_page = (
        links.groupBy("src_url")
        .agg(F.sort_array(F.collect_list("link_no")).alias("ord"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_page:
        assert r.ord == list(range(r.n))


def test_host_graph_totals(links):
    g = weblinks.host_graph(links)
    assert g.select(F.sum("n_links")).first()[0] == links.count()
    # n_pages never exceeds n_links
    assert g.where(F.col("n_pages") > F.col("n_links")).count() == 0


def test_anchor_terms_topk_and_ties(links):
    t = weblinks.anchor_terms(links, top=2)
    rows = t.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.dst_host, []).append(r)
    for host, rs in by_host.items():
        assert len(rs) <= 2
        rs.sort(key=lambda r: r.rk)
        # rank order respects (n desc, term asc)
        for a, b in zip(rs, rs[1:]):
            assert a.n > b.n or (a.n == b.n and a.term < b.term)


def test_dom_stats_identities(linked):
    s = weblinks.dom_stats(linked).collect()
    assert sum(r.n_pages for r in s) == 400
    for r in s:
        # every page contributes html/body/p plus one tag per link
        assert r.n_tags == 3 * r.n_pages + r.n_links
        assert r.html_bytes > r.text_chars


def test_host_rank_mass_conservation(spark, links):
    from skyway_spark.operators.graph import pagerank_int

    edges = links.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).distinct()
    pr = pagerank_int(edges, iters=2)
    n = pr.count()
    assert n <= LINK_HOSTS
    total = pr.select(F.sum("rank")).first()[0]
    # integer mass-passing loses at most ~iters units per node to
    # floor division, never gains
    assert 0 < total <= 10**12
    assert total >= 10**12 - 200 * n


def test_hits_int_properties(spark, links):
    """HITS scores: peak is exactly 2^20 on both vectors after the
    final rescale; authorities correlate with indegree on the host
    graph; python mirror agrees exactly."""
    from skyway_spark.operators.graph import hits_int

    edges = links.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).distinct()
    got = {r.node: (r.hub, r.auth) for r in hits_int(edges, iters=2).collect()}
    assert max(h for h, _ in got.values()) == 1 << 20
    assert max(a for _, a in got.values()) == 1 << 20

    # exact python mirror
    e = {(r.src, r.dst) for r in edges.collect()}
    nodes = {s for s, _ in e} | {t for _, t in e}
    peak = 1 << 20
    a = {n: peak for n in nodes}
    h = {}
    for _ in range(2):
        h = {n: 0 for n in nodes}
        for s, t in e:
            h[s] += a[t]
        mx = max(h.values())
        h = {n: (v * peak) // mx for n, v in h.items()}
        a = {n: 0 for n in nodes}
        for s, t in e:
            a[t] += h[s]
        mx = max(a.values())
        a = {n: (v * peak) // mx for n, v in a.items()}
    assert got == {n: (h[n], a[n]) for n in nodes}
