"""Crawl-wave simulator (web/crawl.py) vs a pure-Python reference loop.

The oracle replays crawler.py:487-559's semantics wave-by-wave from a
driver-side snapshot of the pages table: priority-ordered batch pop
with url tie-break, visited-marked-before-fetch, per-page link lists
(the SAME extract_links pure function the Arrow pass wraps — link
extraction itself is pinned byte-exactly in test_graph_web), ≤100-edge
cap, depth-gated enqueue at F15 priority with min-(priority,depth)
frontier merge.  The Spark run must match crawled/edges/frontier
exactly.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.synth import synth_pages
from search_engine_spark.web.crawl import simulate_crawl
from search_engine_spark.web.links import extract_links
from search_engine_spark.web.urls import crawl_priority

N_PAGES = 120
MAX_LINKS = 100


def _blocked(url, robots):
    from urllib.parse import urlparse

    p = urlparse(url)
    return any(
        p.netloc == dom and p.path.startswith(pref) for dom, pref in robots
    )


def _oracle(pagemap, seeds, waves, batch_size, max_depth, robots=()):
    linkmap = {u: extract_links(h, u) for u, h in pagemap.items()}
    frontier = {u: (0.0, 0) for u in sorted(set(seeds))}
    visited, crawled, edges = set(), [], set()
    for wave in range(waves):
        cand = sorted(
            ((p, u, d) for u, (p, d) in frontier.items() if u not in visited),
            key=lambda x: (x[0], x[1]),
        )[:batch_size]
        if not cand:
            break
        batch = [(u, d) for _, u, d in cand]
        visited |= {u for u, _ in batch}
        disc = {}
        for u, d in batch:
            if u in pagemap and not _blocked(u, robots):
                crawled.append((u, wave, True))
                links = linkmap[u]
                edges |= {(u, l) for l in links[:MAX_LINKS]}
                if d < max_depth:
                    for l in links:
                        nd = d + 1
                        if l in visited:
                            continue
                        disc[l] = min(disc.get(l, math.inf), nd)
            else:
                crawled.append((u, wave, False))
            frontier.pop(u, None)
        for l, nd in disc.items():
            cand_entry = (crawl_priority(l, nd), nd)
            frontier[l] = min(frontier.get(l, cand_entry), cand_entry)
        # anti-join semantics: discovered urls already visited never enter
        frontier = {u: v for u, v in frontier.items() if u not in visited}
    return crawled, edges, frontier


@pytest.fixture(scope="module")
def web(spark):
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    pagemap = {
        r["url"]: bytes(r["html"]).decode("utf-8")
        for r in pages.select("url", "html").collect()
    }
    return pages, pagemap


class TestCrawlWaves:
    @pytest.mark.parametrize(
        "waves,batch,max_depth",
        [(3, 10, 3), (2, 5, 1), (5, 25, 2)],
    )
    def test_matches_oracle(self, spark, web, waves, batch, max_depth):
        pages, pagemap = web
        seeds = sorted(pagemap)[:4] + ["https://nowhere.example.com/miss"]
        crawled, edges, frontier = simulate_crawl(
            spark, pages, seeds, waves=waves, batch_size=batch,
            max_depth=max_depth,
        )
        oc, oe, of = _oracle(pagemap, seeds, waves, batch, max_depth)

        got_c = {
            (r["url"], r["wave"], r["fetched"]) for r in crawled.collect()
        }
        assert got_c == set(oc)
        got_e = {(r["src"], r["dst"]) for r in edges.collect()}
        assert got_e == oe
        got_f = {
            r["url"]: (round(r["priority"], 9), r["depth"])
            for r in frontier.collect()
        }
        exp_f = {u: (round(p, 9), d) for u, (p, d) in of.items()}
        assert got_f == exp_f

    def test_depth_zero_never_spawns(self, spark, web):
        pages, pagemap = web
        seeds = sorted(pagemap)[:3]
        crawled, edges, frontier = simulate_crawl(
            spark, pages, seeds, waves=3, batch_size=10, max_depth=0
        )
        # seeds crawl, edges still recorded, but nothing enqueued
        assert crawled.count() == 3
        assert frontier.count() == 0

    def test_robots_disallow_blocks_fetch(self, spark, web):
        """A2: a (domain, path_prefix) disallow rule makes matching
        urls behave like failed fetches — visited, no links, no edges —
        rank-identical to the Python replay with the same rules."""
        from urllib.parse import urlparse

        pages, pagemap = web
        seeds = sorted(pagemap)[:4]
        blocked_dom = urlparse(seeds[0]).netloc
        rules = [(blocked_dom, "/page")]
        robots = spark.createDataFrame(
            rules, "domain string, path_prefix string"
        )
        crawled, edges, frontier = simulate_crawl(
            spark, pages, seeds, waves=3, batch_size=10, robots=robots
        )
        oc, oe, of = _oracle(pagemap, seeds, 3, 10, 3, robots=rules)
        got_c = {
            (r["url"], r["wave"], r["fetched"]) for r in crawled.collect()
        }
        assert got_c == set(oc)
        assert {(r["src"], r["dst"]) for r in edges.collect()} == oe
        # every blocked-domain url that was popped reads as unfetched
        blocked_rows = [
            r for r in got_c if urlparse(r[0]).netloc == blocked_dom
        ]
        assert blocked_rows and all(not f for _, _, f in blocked_rows)
        # and no edge ever originates from the blocked domain
        assert all(
            urlparse(s).netloc != blocked_dom
            for s, _ in {(r["src"], r["dst"]) for r in edges.collect()}
        )

    def test_drains_and_stops(self, spark, web):
        pages, pagemap = web
        # a seed with no pages row: wave 0 pops it (fetch-fails), then
        # the frontier is empty and the loop stops early
        crawled, edges, frontier = simulate_crawl(
            spark, pages, ["https://missing.example.com/x"], waves=5,
            batch_size=10,
        )
        rows = crawled.collect()
        assert [(r["wave"], r["fetched"]) for r in rows] == [(0, False)]
        assert edges.count() == 0 and frontier.count() == 0


class TestCrawlAndIndex:
    """crawl_and_index (POST /crawl-index, main.py:450-512): fetch ->
    extract -> upsert into the live index via merge_pages, per-url
    CrawlResult rows + job summary."""

    def test_fetch_index_and_results(self, spark, web, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.web.crawl import crawl_and_index

        pages, pagemap = web
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        root = str(tmp_path / "ciidx")
        build_index(spark, pages.filter(ordinal < 40), root,
                    num_buckets=4, block_size=16, num_partitions=2)
        base_docs = spark.read.parquet(root + "/docs").count()

        # crawl two urls NOT yet indexed + one re-crawl + one miss
        new_urls = [
            r["url"] for r in pages.filter(ordinal >= 40)
            .select("url").orderBy("url").limit(2).collect()
        ]
        recrawl = pages.filter(ordinal == 0).select("url").first()["url"]
        miss = "https://nowhere.example.com/x"
        results, job = crawl_and_index(
            spark, root, pages, new_urls + [recrawl, miss]
        )
        rows = {r["url"]: r for r in results.collect()}
        assert job["status"] == "completed"
        assert job["total"] == 4 and job["completed"] == 3 and job["failed"] == 1
        assert not rows[miss]["success"]
        assert rows[miss]["error"] == "fetch_failed"
        for u in new_urls + [recrawl]:
            assert rows[u]["success"] and rows[u]["error"] is None

        # the index grew by the two new urls; the re-crawl replaced,
        # not duplicated, its old doc
        idx = BM25Index(spark, root, seed_min_df=0)
        assert idx.stats()["indexed_docs"] == base_docs + 2
        urls_in_index = {
            r["url"] for r in spark.read.parquet(root + "/docs")
            .select("url").collect()
        }
        assert set(new_urls) <= urls_in_index

    def test_follow_links_indexes_discovered(self, spark, web, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.web.crawl import crawl_and_index, simulate_crawl

        pages, pagemap = web
        root = str(tmp_path / "ciidx2")
        seed = sorted(pagemap)[0]
        build_index(
            spark,
            pages.filter(F.col("url") != seed).limit(5), root,
            num_buckets=4, block_size=16, num_partitions=2,
        )
        results, job = crawl_and_index(
            spark, root, pages, [seed], follow_links=True, max_depth=1,
        )
        # parity with the plain simulator at the same settings
        crawled, _, _ = simulate_crawl(
            spark, pages, [seed], waves=2, batch_size=50, max_depth=1
        )
        exp = {
            (r["url"], r["fetched"]) for r in crawled.collect()
        }
        got = {(r["url"], r["success"]) for r in results.collect()}
        assert got == exp
        assert job["completed"] == sum(1 for _, f in exp if f)


def test_seed_normalization_and_robots_empty_prefix(spark):
    """Seeds take the same normalize+validate gate as discovered links,
    and an empty robots Disallow prefix allows (not blocks) the domain."""
    pages = spark.createDataFrame(
        [("http://example.com/a", b"<html><body>hi</body></html>")],
        "url string, html binary",
    )
    # raw seed form differs from the canonical pages key
    crawled, _, _ = simulate_crawl(
        spark, pages, ["http://Example.COM:80/a/"], waves=1
    )
    rows = crawled.collect()
    assert [(r["url"], r["fetched"]) for r in rows] == [
        ("http://example.com/a", True)
    ]
    # invalid seeds are dropped, not carried as unfetchable rows
    crawled2, _, _ = simulate_crawl(
        spark, pages, ["not-a-url", "http://example.com/a"], waves=1
    )
    assert crawled2.count() == 1
    # empty Disallow prefix = allow-all (RobotFileParser semantics)
    robots = spark.createDataFrame(
        [("example.com", "")], "domain string, path_prefix string"
    )
    crawled3, _, _ = simulate_crawl(
        spark, pages, ["http://example.com/a"], waves=1, robots=robots
    )
    assert crawled3.collect()[0]["fetched"] is True


def test_crawl_and_index_covers_all_urls_and_fresh_dir(spark, tmp_path):
    """Requested urls beyond batch_size must still be processed, and a
    zero-fetch call against a brand-new index dir answers per-url
    failures instead of raising."""
    from search_engine_spark.web.crawl import crawl_and_index

    pages = spark.createDataFrame(
        [
            (f"http://s.com/{i}", None,
             b"<html><title>t</title><body>words here</body></html>",
             None, "en")
            for i in range(6)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    urls = [f"http://s.com/{i}" for i in range(6)]
    results, job = crawl_and_index(
        spark, str(tmp_path / "idx"), pages, urls,
        follow_links=False, batch_size=2,
    )
    assert results.count() == 6 and job["total"] == 6
    assert job["completed"] == 6
    # all-miss batch on a fresh dir: per-url failures, no crash
    results2, job2 = crawl_and_index(
        spark, str(tmp_path / "idx2"), pages,
        ["http://missing.com/x"], follow_links=False,
    )
    r = results2.collect()[0]
    assert r["success"] is False and r["error"] == "fetch_failed"
    assert job2["failed"] == 1


def test_extract_links_survives_hostile_href():
    assert extract_links(
        '<a href="http://[::1">x</a><a href="/ok">y</a>',
        "http://site.com/",
    ) == ["http://site.com/ok"]


def test_crawl_and_index_answers_per_requested_url(spark, tmp_path):
    """Invalid and non-canonical requested urls still get result rows
    keyed by the CALLER's string; robots 'Disallow: /' blocks the bare
    root url (RobotFileParser substitutes '/' for an empty path)."""
    from search_engine_spark.web.crawl import (
        crawl_and_index,
        robots_block_cond,
        simulate_crawl,
    )

    pages = spark.createDataFrame(
        [("http://s.com/a", None,
          b"<html><title>t</title><body>words</body></html>", None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    results, job = crawl_and_index(
        spark, str(tmp_path / "idx"), pages,
        ["not-a-url", "http://S.com:80/a/", "http://s.com/miss"],
        follow_links=False,
    )
    got = {r["url"]: r["success"] for r in results.collect()}
    assert got == {
        "not-a-url": False,
        "http://S.com:80/a/": True,   # caller's raw string, canonical fetch
        "http://s.com/miss": False,
    }
    assert job["total"] == 3 and job["completed"] == 1
    assert job["job_id"] != "job-0"  # a real correlatable id

    # root-url disallow
    root_pages = spark.createDataFrame(
        [("http://r.com", b"<html><body>hi</body></html>")],
        "url string, html binary",
    )
    robots = spark.createDataFrame(
        [("r.com", "/")], "domain string, path_prefix string"
    )
    crawled, _, _ = simulate_crawl(
        spark, root_pages, ["http://r.com"], waves=1, robots=robots
    )
    assert crawled.collect()[0]["fetched"] is False
