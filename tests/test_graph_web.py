"""Graph (PageRank, hybrid boost) and web (URL/link) layer tests.

The PageRank oracle is a pure-Python power iteration mirroring the
reference semantics (backend/ranking_service/pagerank.py:117-191):
r' = d·Mᵀr + d·(Σ_dangling r)/N + (1−d)/N, final Σ=1 normalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.graph.pagerank import (
    hybrid_boost,
    pagerank,
    pagerank_fixed,
    top_pages,
)
from search_engine_spark.web import urls as U
from search_engine_spark.web.links import (
    edges_from_pages,
    extract_links,
    frontier_add,
    frontier_pop_batch,
)

# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),  # e is dangling (no out-edges), reached from c? no — isolated dst
    ("c", "e"),
]


def py_pagerank(edges, n_iter, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        dmass = sum(r[v] for v in nodes if v not in out)
        r = {
            v: d * contrib[v] + d * dmass / n + (1 - d) / n
            for v in nodes
        }
    total = sum(r.values())
    return {v: x / total for v, x in r.items()}


def test_pagerank_fixed_matches_python_oracle(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["id"]: r["r"] for r in pagerank_fixed(edges, n_iter=5).collect()}
    want = py_pagerank(EDGES, n_iter=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_converging_sums_to_one_and_ranks_hub_highest(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    ranks, info = pagerank(spark, edges, max_iter=30, tol=1e-10)
    rows = ranks.collect()
    assert sum(r["r"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert info["iterations"] >= 1
    top = top_pages(ranks, 1).collect()[0]
    # c has in-edges from a, b, d — the hub
    assert top["id"] == "c"


def test_pagerank_dedups_edges(spark):
    dup = spark.createDataFrame(EDGES + EDGES, ["src", "dst"])
    uniq = spark.createDataFrame(EDGES, ["src", "dst"])
    got_dup = {r["id"]: r["r"] for r in pagerank_fixed(dup, 3).collect()}
    got_uni = {r["id"]: r["r"] for r in pagerank_fixed(uniq, 3).collect()}
    assert got_dup == pytest.approx(got_uni)


def test_hybrid_boost_formula_and_order(spark):
    results = spark.createDataFrame(
        [("a", 10.0), ("b", 9.0), ("c", 1.0)], ["id", "score"]
    )
    ranks = spark.createDataFrame([("b", 0.2), ("c", 0.001)], ["id", "r"])
    rows = hybrid_boost(results, ranks).collect()
    by_id = {r["id"]: r["boosted_score"] for r in rows}
    # main.py:259: 0.7*score + 0.3*pagerank*100; missing rank -> 0
    assert by_id["a"] == pytest.approx(0.7 * 10.0)
    assert by_id["b"] == pytest.approx(0.7 * 9.0 + 0.3 * 0.2 * 100)
    assert by_id["c"] == pytest.approx(0.7 * 1.0 + 0.3 * 0.001 * 100)
    assert [r["id"] for r in rows] == ["b", "a", "c"]


# ---------------------------------------------------------------------------
# URL ops: native column expressions vs urlparse-exact Python mirrors
# ---------------------------------------------------------------------------

URL_BATTERY = [
    "http://Example.COM:80/path/",
    "https://example.com:443/a/b/?q=1",
    "https://example.com/",
    "http://example.com",
    "https://sub.Example.org/Deep/Path/Page.html",
    "http://example.com/file.JPG",
    "http://example.com/archive.tar.gz",
    "https://example.com/page#section-2",
    "ftp://example.com/x",
    "https://example.com/a//",
    "http://example.com:8080/x?y=z",
    "https://example.com/search?q=a+b&lang=en",
    "http://example.com/path/index.php",
]


def test_url_columns_match_python_mirrors(spark):
    df = spark.createDataFrame([(u,) for u in URL_BATTERY], ["url"])
    rows = df.select(
        "url",
        U.normalize_url_col(F.col("url")).alias("norm"),
        U.is_valid_url_col(F.col("url")).alias("valid"),
        U.should_skip_url_col(F.col("url")).alias("skip"),
        U.crawl_priority_col(F.col("url"), F.lit(2)).alias("prio"),
        U.domain_col(F.col("url")).alias("domain"),
    ).collect()
    from urllib.parse import urlparse

    for r in rows:
        u = r["url"]
        assert r["norm"] == U.normalize_url(u), u
        assert r["valid"] == U.is_valid_url(u), u
        assert r["skip"] == U.should_skip_url(u), u
        assert r["prio"] == pytest.approx(U.crawl_priority(u, 2)), u
        assert r["domain"] == urlparse(u).netloc, u


def test_reference_url_semantics_pinned():
    # pinned expectations from test_backend.py:211-236 + utils truth table
    assert U.normalize_url("http://Example.COM:80/path/") == "http://example.com/path"
    assert U.normalize_url("https://example.com/") == "https://example.com/"
    assert U.is_valid_url("https://example.com")
    assert not U.is_valid_url("not-a-url")
    assert not U.is_valid_url("ftp://example.com")
    assert U.should_skip_url("http://example.com/img.png")
    assert U.should_skip_url("http://example.com/page#frag")
    assert not U.should_skip_url("https://example.com/page")


def test_truncate_and_cache_key(spark):
    import hashlib

    df = spark.createDataFrame([("x" * 300, "python", 1, 10)], ["t", "q", "p", "s"])
    row = df.select(
        U.truncate_col(F.col("t"), 100).alias("tr"),
        U.cache_key_col(F.col("q"), F.col("p"), F.col("s")).alias("key"),
    ).collect()[0]
    # utils.py:50-54 / main.py:146
    assert row["tr"] == "x" * 97 + "..." and len(row["tr"]) == 100
    assert row["key"] == hashlib.md5(b"python:1:10").hexdigest()


# ---------------------------------------------------------------------------
# link extraction + edges + frontier
# ---------------------------------------------------------------------------

HTML = b"""<html><body>
<a href="/about/">About</a>
<a href="https://Other.COM:443/x/">X</a>
<a href="#frag">skip</a>
<a href="javascript:void(0)">skip</a>
<a href="mailto:a@b.c">skip</a>
<a href="img.png">skip-ext</a>
<a href="/about/">dup</a>
</body></html>"""


def test_extract_links_semantics():
    links = extract_links(HTML.decode(), "https://example.com/base/")
    assert links == sorted(
        ["https://example.com/about", "https://other.com/x"]
    )


def test_edges_from_pages(spark):
    pages = spark.createDataFrame(
        [("https://example.com/base/", bytearray(HTML))], ["url", "html"]
    )
    edges = edges_from_pages(pages).collect()
    assert {(e["src"], e["dst"]) for e in edges} == {
        ("https://example.com/base/", "https://example.com/about"),
        ("https://example.com/base/", "https://other.com/x"),
    }


def test_frontier_ops(spark):
    f = spark.createDataFrame(
        [("u1", 5.0, 0), ("u2", 1.0, 1), ("u3", 3.0, 0)],
        ["url", "priority", "depth"],
    )
    new = spark.createDataFrame(
        [("u2", 0.5, 2), ("u4", 2.0, 1)], ["url", "priority", "depth"]
    )
    merged = frontier_add(f, new)
    got = {r["url"]: (r["priority"], r["depth"]) for r in merged.collect()}
    # the WINNING entry's depth rides with its priority
    assert got == {
        "u1": (5.0, 0), "u2": (0.5, 2), "u3": (3.0, 0), "u4": (2.0, 1)
    }
    popped = [r["url"] for r in frontier_pop_batch(merged, 2).collect()]
    assert popped == ["u2", "u4"]


def test_pagerank_empty_graph(spark):
    from search_engine_spark.graph.pagerank import pagerank, pagerank_fixed

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed(empty).count() == 0
    ranks, info = pagerank(spark, empty)
    assert ranks.count() == 0 and info["n_nodes"] == 0


def test_url_parity_bare_query_and_ipv6(spark):
    """The native twins must agree with the Python twins on a bare
    trailing '?' (urlunparse drops it) and unbalanced IPv6 brackets
    (urlparse raises -> invalid)."""
    from search_engine_spark.web.urls import (
        is_valid_url,
        is_valid_url_col,
        normalize_url,
        normalize_url_col,
    )

    urls = [
        "http://x.com/a?",
        "http://x.com/a?b=1",
        "http://[::1",
        "http://[::1]/p",
        "https://ok.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        normalize_url_col(F.col("url")).alias("n"),
        is_valid_url_col(F.col("url")).alias("v"),
    ).collect()
    for r in rows:
        assert r["v"] == is_valid_url(r["url"]), r["url"]
        # normalize parity is only defined on VALID urls — the Python
        # twin (urlparse) raises on the invalid ones by design
        if is_valid_url(r["url"]):
            assert r["n"] == normalize_url(r["url"]), r["url"]
