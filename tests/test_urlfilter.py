"""URL blocklist filtering (ops/urlfilter) vs urllib-based Python
recomputation — the cheapest curation gate in a training pipeline."""

from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.urlfilter import (
    apply_url_filter,
    url_filter_stats,
)

URLS = [
    (1, "https://Ads.Tracker.COM/landing"),
    (2, "https://sub.ads.tracker.com:443/x"),
    (3, "https://tracker.com/clean"),              # NOT ads.tracker.com
    (4, "http://news.example.org/story/1"),
    (5, "https://example.org/casino-REVIEW/top"),  # path keyword
    (6, "https://example.org/fine?casino=no"),     # keyword in query only
    (7, "http://spam.biz:8080/a/b"),
    (8, "https://ok.example.org/"),
]
BLOCKED = ["ads.tracker.com", "spam.biz"]
KEYWORDS = ["casino"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def _py_verdict(url):
    p = urlparse(url)
    host = p.netloc.lower().rsplit(":", 1)[0] if ":" in p.netloc else p.netloc.lower()
    # strip port robustly
    host = p.hostname or ""
    bd = any(host == d or host.endswith("." + d) for d in BLOCKED)
    bp = any(kw in p.path.lower() for kw in KEYWORDS)
    return bd, bp, bd or bp


class TestUrlFilter:
    def test_matches_urllib(self, spark, df):
        rows = {
            r["id"]: (r["blocked_domain"], r["blocked_path"], r["blocked"])
            for r in url_filter_stats(
                df, blocked_domains=BLOCKED, path_keywords=KEYWORDS
            ).collect()
        }
        for doc_id, url in URLS:
            assert rows[doc_id] == _py_verdict(url), url

    def test_expected_verdicts(self, spark, df):
        got = {
            r["id"]: r["blocked"]
            for r in url_filter_stats(
                df, blocked_domains=BLOCKED, path_keywords=KEYWORDS
            ).collect()
        }
        assert got == {1: True, 2: True, 3: False, 4: False,
                       5: True, 6: False, 7: True, 8: False}

    def test_apply_keeps_schema_and_rows(self, spark, df):
        kept = apply_url_filter(
            df, blocked_domains=BLOCKED, path_keywords=KEYWORDS
        )
        assert kept.columns == df.columns
        assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 6, 8]

    def test_empty_lists_block_nothing(self, spark, df):
        assert apply_url_filter(df).count() == len(URLS)

    def test_plan_is_scan_filter(self, spark, df):
        plan = apply_url_filter(
            df, blocked_domains=BLOCKED, path_keywords=KEYWORDS
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure WHERE, no shuffle


class TestUserinfoBypass:
    def test_userinfo_cannot_evade_blocklist(self, spark):
        # "alice@blocked" authority must still match the blocked domain
        df = spark.createDataFrame(
            [
                (1, "https://alice@ads.tracker.com/x"),
                (2, "https://a:b@sub.ads.tracker.com:443/y"),
                (3, "https://alice@ok.example.org/z"),
            ],
            "doc_id long, url string",
        )
        kept = apply_url_filter(df, "url", BLOCKED, KEYWORDS)
        assert {r["doc_id"] for r in kept.collect()} == {3}

    def test_double_at_cannot_evade_blocklist(self, spark):
        # URL parsers split the authority at the LAST '@'
        # (urlparse.hostname, browsers): 'a@b@evil.com' is host
        # 'evil.com'.  A lazy strip-to-first-@ would leave
        # 'b@evil.com', which matches neither the equality nor the
        # '.domain' suffix predicate — the double-@ variant must not
        # slip through (ADVICE r2).
        df = spark.createDataFrame(
            [
                (1, "https://x@y@ads.tracker.com/p"),
                (2, "https://a@b:pw@sub.ads.tracker.com:8443/p"),
                (3, "https://x@y@ok.example.org/p"),
            ],
            "doc_id long, url string",
        )
        for _, url in [(r, u) for r, u in df.collect()]:
            assert urlparse(url).hostname.count("@") == 0  # oracle sanity
        kept = apply_url_filter(df, "url", BLOCKED, KEYWORDS)
        assert {r["doc_id"] for r in kept.collect()} == {3}
