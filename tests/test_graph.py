"""Web-graph operators: link extraction, integer-exact PageRank, host
graph, mirror detection — hand-computed cases + plan shapes."""

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.graph import (
    RANK_SCALE,
    degree_stats,
    extract_links,
    host_graph,
    host_mirrors,
    pagerank,
    url_host,
)


def test_extract_links_warts(spark):
    """Absolute targets only; relative and self links drop; spacing
    around '='; canonicalization folds case/port/fragment/params."""
    pages = spark.createDataFrame(
        [
            (
                "http://a.com/x",
                '<a href="HTTP://B.com:80/p/#frag">b</a>'
                '<a href="/rel">rel</a>'
                '<a href="http://a.com/x">self</a>',
            ),
            ("http://b.com/p", '<a href = "https://C.org:443/q?b=2&a=1">c</a>'),
            ("http://c.com/none", "<p>no links</p>"),
        ],
        "url string, html string",
    )
    got = sorted(tuple(r) for r in extract_links(pages).collect())
    assert got == [
        ("http://a.com/x", "http://b.com/p"),
        ("http://b.com/p", "https://c.org/q?a=1&b=2"),
    ]
    # raw mode keeps the href bytes (minus relative/self)
    raw = sorted(
        r["dst"] for r in extract_links(pages, canonicalize=False).collect()
    )
    assert raw == ["HTTP://B.com:80/p/#frag", "https://C.org:443/q?b=2&a=1"]


def test_extract_links_plan_is_map_only(spark):
    pages = spark.createDataFrame(
        [("http://a.com/x", '<a href="http://b.com/y">b</a>')],
        "url string, html string",
    )
    plan = extract_links(pages)._jdf.queryExecution().toString()
    assert "Exchange" not in plan, plan


def _py_pagerank(edges, n_iter, d_e6=850_000):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    unit = RANK_SCALE // n
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    rank = {v: unit for v in nodes}
    base = (1_000_000 - d_e6) * unit
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, t in edges:
            inflow[t] += rank[s] // outd[s]
        dang = sum(rank[v] for v in nodes if v not in outd)
        red = dang // n
        rank = {v: (base + d_e6 * (inflow[v] + red)) // 1_000_000 for v in nodes}
    return rank


def test_pagerank_matches_reference_with_dangling_node(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
        ("c", "sink"),  # sink has no out-edges: the dangling-mass path
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_e12"] for r in pagerank(edf, n_iter=5).collect()}
    assert got == _py_pagerank(edges, 5)
    # mass conservation within integer-division shedding: ≤ 1 unit per
    # node per round leaks, never appears
    assert 0 <= RANK_SCALE - sum(got.values()) <= 5 * (len(got) + 2)


def test_pagerank_multi_edges_contribute_multiply(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_e12"] for r in pagerank(edf, n_iter=2).collect()}
    assert got == _py_pagerank(edges, 2)
    assert got["b"] > got["c"]


def test_pagerank_zero_iters_is_uniform(spark):
    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["rank_e12"] for r in pagerank(edf, n_iter=0).collect()}
    assert got == {"a": RANK_SCALE // 2, "b": RANK_SCALE // 2}


def test_degree_stats(spark):
    edf = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = sorted(tuple(r) for r in degree_stats(edf).collect())
    assert got == [("a", 2, 0), ("b", 1, 1), ("c", 0, 2)]


def test_url_host_and_host_graph(spark):
    df = spark.createDataFrame(
        [
            ("http://A.com:8080/1", "http://b.com/2"),
            ("http://a.com/3", "http://b.com/9"),
            ("http://a.com/1", "http://a.com/5"),  # intra-host: dropped
            ("not a url", "http://b.com/2"),  # hostless endpoint: dropped
        ],
        "src string, dst string",
    )
    got = sorted(tuple(r) for r in host_graph(df).collect())
    assert got == [("a.com", "b.com", 2)]
    keep = sorted(
        tuple(r) for r in host_graph(df, include_intra_host=True).collect()
    )
    assert ("a.com", "a.com", 1) in keep
    hosts = df.select(url_host(F.col("src")).alias("h")).collect()
    assert [r["h"] for r in hosts] == ["a.com", "a.com", "a.com", None]


def test_host_mirrors_jaccard_and_stop_fp_cap(spark):
    docs = spark.createDataFrame(
        [
            ("h1", "f1"), ("h1", "f2"), ("h1", "f3"),
            ("h2", "f1"), ("h2", "f2"), ("h2", "f2"),  # dup (host,fp) row
            ("h3", "f9"), ("h3", "f1"),
        ],
        "source string, fp string",
    )
    got = sorted(tuple(r) for r in host_mirrors(docs, min_shared=2, max_df=3).collect())
    # h1∩h2 = {f1,f2}, totals 3 and 2 -> jaccard 2/3
    assert got == [("h1", "h2", 2, 3, 2, 666666)]
    # f1 sits on 3 hosts: with max_df=2 it is a stop-fingerprint and the
    # only surviving overlap (f2) is below min_shared
    assert host_mirrors(docs, min_shared=2, max_df=2).count() == 0
