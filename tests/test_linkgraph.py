"""Web link graph + fixed-point host PageRank (operators/linkgraph.py)."""

import math

from pyspark.sql import functions as F

from osm_chordify_spark.operators import linkgraph as LG


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_anchor_extraction_and_host_parse(spark):
    pages = _pages(
        spark,
        [
            (
                "https://a.example.org/p/1",
                '<a href="https://b.example.org/x">t</a> mid '
                '<a href="/relative/path">r</a>'
                '<a href="HTTPS://C.Example.ORG:8443/y?q=1">u</a>',
            ),
            ("https://a.example.org/p/2", "<p>no links</p>"),
        ],
    )
    got = {
        r.url: r.hrefs
        for r in LG.with_anchor_links(pages).select("url", "hrefs").collect()
    }
    assert got["https://a.example.org/p/1"] == [
        "https://b.example.org/x",
        "/relative/path",
        "HTTPS://C.Example.ORG:8443/y?q=1",
    ]
    assert got["https://a.example.org/p/2"] == []
    hosts = pages.select(LG.host_expr("url").alias("h")).distinct().collect()
    assert {r.h for r in hosts} == {"a.example.org"}


def test_host_link_edges_weights_and_filters(spark):
    pages = _pages(
        spark,
        [
            # two links a->b (weight 2), one a->a self loop, one relative
            # (dropped: no scheme/host)
            (
                "https://a.org/1",
                '<a href="https://b.org/x">.</a><a href="https://b.org/y">.</a>'
                '<a href="https://a.org/z">.</a><a href="/rel">.</a>',
            ),
            # uppercase scheme/host still parses; c->b
            ("HTTPS://C.org/1", '<a href="https://B.org/q">.</a>'),
        ],
    )
    edges = LG.host_link_edges(LG.with_anchor_links(pages))
    got = {(r.src_host, r.dst_host): r.weight for r in edges.collect()}
    assert got == {("a.org", "b.org"): 2, ("a.org", "a.org"): 1, ("c.org", "b.org"): 1}
    no_loops = LG.host_link_edges(LG.with_anchor_links(pages), drop_self_loops=True)
    assert ("a.org", "a.org") not in {
        (r.src_host, r.dst_host) for r in no_loops.collect()
    }


def _expected_fixed_point(edge_list, iterations):
    """Pure-python replication of the bigint micro-rank update (python
    floats are IEEE doubles, so floor() matches the engines exactly)."""
    nodes = sorted({s for s, _, _ in edge_list} | {d for _, d, _ in edge_list})
    od = {}
    for s, _, w in edge_list:
        od[s] = od.get(s, 0) + w
    r = {h: 1_000_000_000_000 for h in nodes}
    for _ in range(iterations):
        c = {h: 0 for h in nodes}
        for s, d, w in edge_list:
            c[d] += math.floor((r[s] * w) / od[s])
        r = {h: 150_000_000_000 + math.floor((c[h] * 17) / 20.0) for h in nodes}
    return r, od


def test_pagerank_fixed_point_matches_reference_arithmetic(spark):
    edge_list = [
        ("a", "b", 2),
        ("b", "a", 1),
        ("a", "c", 1),
        ("c", "a", 3),
        ("c", "b", 1),
        ("d", "a", 1),  # d is dangling-in only as source; no in-links
    ]
    edges = spark.createDataFrame(
        edge_list, "src_host string, dst_host string, weight long"
    )
    out = {
        r.host: (r.rank_micro, r.out_weight)
        for r in LG.pagerank_fixed_point(edges, iterations=3).collect()
    }
    exp_r, exp_od = _expected_fixed_point(edge_list, 3)
    assert {h: v[0] for h, v in out.items()} == exp_r
    assert {h: v[1] for h, v in out.items()} == {
        h: exp_od.get(h, 0) for h in exp_r
    }
    # sanity: the micro-ranks approximate float PageRank-with-leak
    rf = {h: 1.0 for h in exp_r}
    for _ in range(3):
        c = {h: 0.0 for h in exp_r}
        for s, d, w in edge_list:
            c[d] += rf[s] * w / exp_od[s]
        rf = {h: 0.15 + 0.85 * c[h] for h in exp_r}
    for h in exp_r:
        assert abs(out[h][0] / 1e12 - rf[h]) < 1e-9


def test_with_host_rank_join(spark):
    pages = _pages(spark, [("https://a.org/1", "x"), ("https://zzz.org/1", "x")])
    ranks = spark.createDataFrame(
        [("a.org", 1_230_000_000_000, 4)],
        "host string, rank_micro long, out_weight long",
    )
    got = {
        r.url: r.host_rank_micro
        for r in LG.with_host_rank(pages, ranks).collect()
    }
    assert got["https://a.org/1"] == 1_230_000_000_000
    assert got["https://zzz.org/1"] is None


def test_pagerank_scale_invariance(spark):
    """Same graph, different partitioning → identical bigint ranks
    (the order-independence claim that float PageRank can't make)."""
    edge_list = [(f"h{i}", f"h{(i * 3 + 1) % 40}", 1 + i % 5) for i in range(200)]
    edges = spark.createDataFrame(
        edge_list, "src_host string, dst_host string, weight long"
    )
    a = LG.pagerank_fixed_point(edges.repartition(1), iterations=2).collect()
    b = LG.pagerank_fixed_point(edges.repartition(16), iterations=2).collect()
    assert {(r.host, r.rank_micro) for r in a} == {(r.host, r.rank_micro) for r in b}
