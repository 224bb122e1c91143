"""Serving-layer semantics: highlight/fragment (F16), query sanitizer
(F14), and the query-log table + /stats analytics (D9)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from search_engine_spark.query import serving


class TestHighlight:
    def test_whole_word_marks(self, spark):
        df = spark.createDataFrame(
            [(1, "Spark sparkles; spark and SPARK merge windows.")], "id int, text string"
        )
        out = df.select(
            serving.highlight_col(F.col("text"), ["spark", "merge"]).alias("h")
        ).collect()[0]["h"]
        assert out == (
            "<mark>Spark</mark> sparkles; <mark>spark</mark> and "
            "<mark>SPARK</mark> <mark>merge</mark> windows."
        )

    def test_no_terms_identity(self, spark):
        df = spark.createDataFrame([(1, "abc def")], "id int, text string")
        out = df.select(
            serving.highlight_col(F.col("text"), []).alias("h")
        ).collect()[0]["h"]
        assert out == "abc def"

    def test_fragment_window(self, spark):
        text = "x" * 200 + " spark " + "y" * 200
        df = spark.createDataFrame([(1, text)], "id int, text string")
        frag = df.select(
            serving.fragment_col(F.col("text"), ["spark"], size=60).alias("f")
        ).collect()[0]["f"]
        assert len(frag) == 60
        assert "spark" in frag

    def test_fragment_no_match_head(self, spark):
        df = spark.createDataFrame([(1, "a" * 300)], "id int, text string")
        frag = df.select(
            serving.fragment_col(F.col("text"), ["zzz"], size=50).alias("f")
        ).collect()[0]["f"]
        assert frag == "a" * 50


class TestSanitize:
    def test_es_special_chars(self):
        # utils.py:57-64 semantics: every special sequence escaped
        assert serving.sanitize_query("a+b") == "a\\+b"
        assert serving.sanitize_query('say "hi"') == 'say \\"hi\\"'
        assert serving.sanitize_query("x&&y||z") == "x\\&&y\\||z"
        assert serving.sanitize_query("plain words") == "plain words"


class TestParseQuery:
    def test_phrases_and_flags(self):
        p = serving.parse_query('fast "quick brown fox" AND python NOT java')
        assert p["phrases"] == ["quick brown fox"]
        assert p["operators"] == {"and": True, "or": False, "not": True}
        # AND/NOT survive tokenization? they lowercase to "and"/"not"
        # which are stopwords -> dropped; content terms stemmed
        assert "python" in p["terms"] and "fast" in p["terms"]
        assert "and" not in p["terms"] and "not" not in p["terms"]

    def test_plain_query(self):
        p = serving.parse_query("  hello world  ")
        assert p["raw"] == "hello world"
        assert p["phrases"] == []
        assert p["operators"] == {"and": False, "or": False, "not": False}


class TestQueryLog:
    def test_log_and_stats(self, spark, tmp_path):
        log_dir = str(tmp_path / "qlog")
        t0 = datetime(2026, 1, 2, 12, 0, 0)
        rows = [
            ("spark merge", 10, 120, False, t0),
            ("spark merge", 10, 2, True, t0 + timedelta(hours=1)),
            ("fox", 3, 80, False, t0 + timedelta(hours=2)),
            ("stale", 1, 500, False, t0 - timedelta(hours=30)),  # outside 24h
        ]
        for q, n, ms, hit, ts in rows:
            serving.log_query(spark, log_dir, q, n, ms, cache_hit=hit, queried_at=ts)
        logs = serving.read_query_log(spark, log_dir)
        assert logs.count() == 4
        stats = serving.query_log_stats(logs).collect()[0]
        # anchored on max ts (t0+2h): the -30h row is excluded
        assert stats["total_queries"] == 3
        assert abs(stats["avg_response_time_ms"] - (120 + 2 + 80) / 3) < 0.01
        assert abs(stats["cache_hit_rate_pct"] - 100.0 / 3) < 0.01

    def test_search_with_log(self, spark, tmp_path):
        # end-to-end over a tiny index
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages

        idx_dir = str(tmp_path / "idx")
        build_index(
            spark, synth_pages(spark, 40, num_partitions=2), idx_dir,
            num_buckets=4, block_size=16, num_partitions=2,
        )
        idx = BM25Index(spark, idx_dir)
        log_dir = str(tmp_path / "qlog2")
        rows = serving.search_with_log(idx, "python tutorial", k=5, log_dir=log_dir)
        logged = serving.read_query_log(spark, log_dir).collect()
        assert len(logged) == 1
        assert logged[0]["query"] == "python tutorial"
        assert logged[0]["results_count"] == len(rows)


class TestQueryResultCache:
    """A15: md5-keyed GET-or-compute response cache with TTL semantics
    (main.py:146-158,235; utils.py:16-18; config.py:51)."""

    def test_key_matches_reference(self):
        import hashlib

        assert serving.cache_key("quick fox", 2, 10) == hashlib.md5(
            b"quick fox:2:10"
        ).hexdigest()

    def _index(self, spark, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages

        idx_dir = str(tmp_path / "idx")
        build_index(
            spark, synth_pages(spark, 40, num_partitions=2), idx_dir,
            num_buckets=4, block_size=16, num_partitions=2,
        )
        return BM25Index(spark, idx_dir)

    def test_hit_miss_ttl_and_log(self, spark, tmp_path):
        idx = self._index(spark, tmp_path)
        cache = serving.QueryResultCache(
            spark, str(tmp_path / "qcache"), ttl_s=3600
        )
        log_dir = str(tmp_path / "qlog")
        t0 = datetime(2024, 1, 1, 12, 0, 0)

        r1 = serving.search_cached(
            idx, "python tutorial", page=1, size=5, cache=cache,
            log_dir=log_dir, now=t0,
        )
        assert r1["cached"] is False and r1["results"]

        # within TTL: served from cache, identical payload
        r2 = serving.search_cached(
            idx, "python tutorial", page=1, size=5, cache=cache,
            log_dir=log_dir, now=t0 + timedelta(seconds=100),
        )
        assert r2["cached"] is True
        assert r2["results"] == r1["results"]
        assert r2["total"] == r1["total"]

        # different page => different key => miss
        r3 = serving.search_cached(
            idx, "python tutorial", page=2, size=5, cache=cache,
            log_dir=log_dir, now=t0 + timedelta(seconds=101),
        )
        assert r3["cached"] is False and r3["page"] == 2
        # page-2 slice disjoint from page-1 but same global ranking
        ids1 = [x["doc_id"] for x in r1["results"]]
        ids3 = [x["doc_id"] for x in r3["results"]]
        assert not set(ids1) & set(ids3)

        # past TTL: expired => recompute
        r4 = serving.search_cached(
            idx, "python tutorial", page=1, size=5, cache=cache,
            log_dir=log_dir, now=t0 + timedelta(seconds=3601),
        )
        assert r4["cached"] is False
        assert r4["results"] == r1["results"]

        logs = serving.read_query_log(spark, log_dir).collect()
        assert sorted(r["cache_hit"] for r in logs) == [
            False, False, False, True
        ]

    def test_newest_wins_and_compact(self, spark, tmp_path):
        cache = serving.QueryResultCache(
            spark, str(tmp_path / "qcache2"), ttl_s=3600
        )
        t0 = datetime(2024, 1, 1, 12, 0, 0)
        cache.put("k1", '{"v": 1}', t0)
        cache.put("k1", '{"v": 2}', t0 + timedelta(seconds=10))
        cache.put("k2", '{"v": 3}', t0 - timedelta(seconds=7200))  # expired
        now = t0 + timedelta(seconds=20)
        assert cache.get("k1", now) == '{"v": 2}'
        assert cache.get("k2", now) is None
        cache.compact_cache(now)
        t = spark.read.parquet(str(tmp_path / "qcache2"))
        assert t.count() == 1
        assert t.collect()[0]["response_json"] == '{"v": 2}'
        # and the survivor still serves
        assert cache.get("k1", now) == '{"v": 2}'

    def test_get_on_missing_table(self, spark, tmp_path):
        cache = serving.QueryResultCache(spark, str(tmp_path / "nope"))
        assert cache.get("k", datetime(2024, 1, 1)) is None


class TestSearchResponseShape:
    """Full /search handler parity (main.py:125-267): highlighted
    title/description, snippet fallback + content fragment, crawled_at,
    and the post-slice PageRank boost with in-page re-sort."""

    def _index(self, spark, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages

        pages = synth_pages(spark, 60, num_partitions=2)
        idx_dir = str(tmp_path / "idx")
        build_index(spark, pages, idx_dir, num_buckets=4, block_size=16,
                    num_partitions=2)
        return BM25Index(spark, idx_dir), pages

    def test_result_fields_and_highlight(self, spark, tmp_path):
        idx, pages = self._index(spark, tmp_path)
        resp = serving.search_cached(idx, "python tutorial", page=1, size=5,
                                     pages=pages)
        assert resp["results"]
        r0 = resp["results"][0]
        assert set(r0) == {"doc_id", "url", "title", "description",
                           "snippet", "score", "crawled_at"}
        blob = " ".join(
            (r["title"] or "") + (r["snippet"] or "")
            for r in resp["results"]
        ).lower()
        assert "<mark>" in blob
        assert r0["crawled_at"] is None or "T" in r0["crawled_at"]

    def test_snippet_fallback_without_pages(self, spark, tmp_path):
        idx, _ = self._index(spark, tmp_path)
        resp = serving.search_cached(idx, "python tutorial", page=1, size=5)
        for r in resp["results"]:
            # description[:200] fallback (main.py:203) — allowing for the
            # <mark> wrapping added by the description highlight source
            assert len(r["snippet"]) <= 200

    def test_pagerank_boost_within_page(self, spark, tmp_path):
        idx, _ = self._index(spark, tmp_path)
        base = serving.search_cached(idx, "python tutorial", page=1, size=5)
        ids = [r["doc_id"] for r in base["results"]]
        assert len(ids) >= 3
        # rank the LAST result heavily: it must come first after boost
        ranks = spark.createDataFrame(
            [(ids[-1], 0.9)], "id long, r double"
        )
        boosted = serving.search_cached(
            idx, "python tutorial", page=1, size=5, ranks=ranks
        )
        bres = boosted["results"]
        assert bres[0]["doc_id"] == ids[-1]
        assert bres[0]["pagerank"] == 0.9
        exp = 0.7 * base["results"][-1]["score"] + 0.3 * 0.9 * 100.0
        assert abs(bres[0]["score"] - exp) < 1e-9
        # unranked results keep their raw score (reference leaves them)
        raw = {r["doc_id"]: r["score"] for r in base["results"]}
        for r in bres[1:]:
            assert "pagerank" not in r
            assert abs(r["score"] - raw[r["doc_id"]]) < 1e-9


class TestExactTotal:
    def test_exact_total_drives_pagination(self, spark, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages

        pages = synth_pages(spark, 60, num_partitions=2)
        idx_dir = str(tmp_path / "idx")
        build_index(spark, pages, idx_dir, num_buckets=4, block_size=16,
                    num_partitions=2)
        idx = BM25Index(spark, idx_dir)
        capped = serving.search_cached(idx, "data", page=1, size=3)
        exact = serving.search_cached(idx, "data", page=1, size=3,
                                      exact_total=True)
        assert capped["total"] <= 3  # depth-capped
        assert exact["total"] == idx.count_matches("data", mode="or")
        assert exact["total"] >= capped["total"]
        assert exact["total_pages"] == -(-exact["total"] // 3)
        # same ranked page either way
        assert [r["doc_id"] for r in exact["results"]] == [
            r["doc_id"] for r in capped["results"]
        ]


class TestEngineStats:
    def test_composite_stats_shape(self, spark, tmp_path):
        from datetime import datetime
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages
        from search_engine_spark.web.crawl import seed_frontier

        idx_dir = str(tmp_path / "idx")
        build_index(spark, synth_pages(spark, 30, num_partitions=2), idx_dir,
                    num_buckets=4, block_size=16, num_partitions=2)
        idx = BM25Index(spark, idx_dir)
        log_dir = str(tmp_path / "qlog")
        t = datetime(2024, 1, 1, 12, 0, 0)
        serving.log_query(spark, log_dir, "a", 3, 120, cache_hit=False,
                          queried_at=t)
        serving.log_query(spark, log_dir, "a", 3, 4, cache_hit=True,
                          queried_at=t)
        frontier = seed_frontier(spark, ["https://a.com/", "https://b.com/"])
        out = serving.engine_stats(idx, frontier=frontier, log_dir=log_dir,
                                   pages_crawled=30)
        assert out["indexed_pages"] == 30
        assert out["crawler_queue_size"] == 2
        assert out["pages_crawled"] == 30
        assert out["queries_24h"] == 2
        assert out["avg_response_time_ms"] == 62.0
        assert out["cache_hit_rate"] == 50.0
        # reference key set, exactly (main.py:631-639)
        assert set(out) == {
            "indexed_pages", "index_size_mb", "crawler_queue_size",
            "pages_crawled", "queries_24h", "avg_response_time_ms",
            "cache_hit_rate",
        }

    def test_no_logs_no_frontier(self, spark, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.query.bm25 import BM25Index
        from search_engine_spark.synth import synth_pages

        idx_dir = str(tmp_path / "idx2")
        build_index(spark, synth_pages(spark, 20, num_partitions=2), idx_dir,
                    num_buckets=4, block_size=16, num_partitions=2)
        out = serving.engine_stats(BM25Index(spark, idx_dir))
        assert out["queries_24h"] == 0 and out["crawler_queue_size"] == 0
