"""ES aggregations family beyond `terms` — stats, histogram, range,
significant_terms — vs pure-Python oracles.

The reference delegates every aggregation to Elasticsearch (the ES agg
surface behind backend/search_api/main.py:162-189); here they run over
the posting-block engine's ids-only matched pre-pass and are pinned
count-/value-identical to ground truth computed from the token lists,
including filter context, AND mode, overlap/zero-count range buckets,
and JLH scoring parity for significant_terms.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 300

QUERIES = [
    "python programming tutorial",
    "quick brown fox",
    "machine learning data science",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggs"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
    )
    docs = spark.read.parquet(paths.docs).select(
        "doc_id", "url", "domain"
    ).collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    domain_by_doc = {r["doc_id"]: r["domain"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle = BM25Oracle(
        {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    )
    return paths, oracle, domain_by_doc


def _matched(oracle, query, mode="or", allowed=None):
    terms = [t for t in set(tokenize_py(query)) if oracle.df.get(t, 0) > 0]
    if not terms:
        return set()
    if mode == "and":
        m = {d for d, tf in oracle.tf.items() if all(t in tf for t in terms)}
    else:
        m = {d for d, tf in oracle.tf.items() if any(t in tf for t in terms)}
    return m if allowed is None else m & allowed


class TestFacetStats:
    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("mode", ["or", "and"])
    def test_matches_oracle(self, spark, corpus, query, mode):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query, mode)
        row = idx.facet_stats(query, "doclen", mode=mode).collect()[0]
        dls = [oracle.doclen[d] for d in m]
        assert row["count"] == len(dls)
        assert row["min"] == min(dls)
        assert row["max"] == max(dls)
        assert abs(row["avg"] - sum(dls) / len(dls)) < 1e-9
        assert row["sum"] == sum(dls)

    def test_filter_context(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        dom = "example.com"
        allowed = {d for d, v in domain_by_doc.items() if v == dom}
        m = _matched(oracle, QUERIES[0], allowed=allowed)
        row = idx.facet_stats(
            QUERIES[0], "doclen", predicate=f"domain = '{dom}'"
        ).collect()[0]
        assert row["count"] == len(m)
        assert row["sum"] == sum(oracle.doclen[d] for d in m)

    def test_no_indexed_terms(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_stats("zzqqxx", "doclen").collect() == []


class TestFacetHistogram:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        interval = 25.0
        m = _matched(oracle, query)
        want = {}
        for d in m:
            key = math.floor(oracle.doclen[d] / interval) * interval
            want[key] = want.get(key, 0) + 1
        rows = idx.facet_histogram(query, "doclen", interval).collect()
        got = {r["key"]: r["doc_count"] for r in rows}
        assert got == want
        # ES histogram order: bucket key ascending
        assert [r["key"] for r in rows] == sorted(got)

    def test_bad_interval(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_histogram(QUERIES[0], "doclen", 0)


RANGES = [(None, 50.0), (50.0, 150.0), (150.0, None), (40.0, 60.0)]


class TestFacetRange:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        rows = idx.facet_range(query, "doclen", RANGES).collect()
        assert [r["key"] for r in rows] == ["*-50", "50-150", "150-*", "40-60"]
        for r, (lo, hi) in zip(rows, RANGES):
            want = sum(
                1
                for d in m
                if (lo is None or oracle.doclen[d] >= lo)
                and (hi is None or oracle.doclen[d] < hi)
            )
            assert r["doc_count"] == want, r["key"]
            assert r["range_from"] == lo and r["range_to"] == hi

    def test_all_buckets_on_no_match(self, spark, corpus):
        """ES returns every requested bucket even when nothing matches."""
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_range("zzqqxx", "doclen", RANGES).collect()
        assert len(rows) == len(RANGES)
        assert all(r["doc_count"] == 0 for r in rows)


def _jlh_oracle(oracle, m, min_doc_count, size):
    fg = {}
    for d in m:
        for t in oracle.tf[d]:
            fg[t] = fg.get(t, 0) + 1
    out = []
    for t, c in fg.items():
        if c < min_doc_count:
            continue
        fg_pct = c / len(m)
        bg_pct = oracle.df[t] / oracle.n
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        if score > 0:
            out.append((t, c, oracle.df[t], score))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:size]


class TestSignificantTerms:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        want = _jlh_oracle(oracle, m, min_doc_count=2, size=15)
        rows = idx.significant_terms(query, size=15, min_doc_count=2).collect()
        assert [r["term"] for r in rows] == [t for t, *_ in want]
        for r, (t, c, df, s) in zip(rows, want):
            assert r["fg_count"] == c and r["bg_count"] == df
            assert abs(r["score"] - s) < 1e-9

    def test_masked_equals_semijoin(self, spark, corpus):
        """The collect-mask fast path and the semi-join fallback are the
        same aggregation — force the fallback via filter_collect_max=0."""
        paths, *_ = corpus
        q = QUERIES[1]
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        fast = idx.significant_terms(q, size=15, min_doc_count=2).collect()
        idx.filter_collect_max = 0
        slow = idx.significant_terms(q, size=15, min_doc_count=2).collect()
        assert [tuple(r) for r in fast] == [tuple(r) for r in slow]

    def test_query_terms_rank_high(self, spark, corpus):
        """A query's own (indexed) terms are maximally significant —
        fgPct = 1.0 for a single-term query's term."""
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        term = tokenize_py("python")[0]
        rows = idx.significant_terms("python", size=5, min_doc_count=1).collect()
        assert rows[0]["term"] == term
        assert rows[0]["fg_count"] == rows[0]["bg_count"] == oracle.df[term]

    def test_filter_context(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        dom = "example.com"
        allowed = {d for d, v in domain_by_doc.items() if v == dom}
        m = _matched(oracle, QUERIES[0], allowed=allowed)
        want = _jlh_oracle(oracle, m, min_doc_count=2, size=10)
        rows = idx.significant_terms(
            QUERIES[0], size=10, min_doc_count=2, predicate=f"domain = '{dom}'"
        ).collect()
        assert [r["term"] for r in rows] == [t for t, *_ in want]


class TestFacetCardinality:
    @pytest.mark.parametrize("query", QUERIES)
    def test_exact(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        want = len({domain_by_doc[d] for d in m})
        assert idx.facet_cardinality(query, "domain") == want

    def test_approx_close(self, spark, corpus):
        """The HLL++ scale path lands within rsd of exact on a tiny
        value domain (HLL is exact below its sparse threshold)."""
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        exact = idx.facet_cardinality(QUERIES[0], "domain")
        approx = idx.facet_cardinality(QUERIES[0], "domain", approx=True)
        assert abs(approx - exact) <= max(1, int(0.1 * exact))

    def test_no_match(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_cardinality("zzqqxx", "domain") == 0


class TestFacetComposite:
    def _want(self, oracle, domain_by_doc, query, after=None):
        m = _matched(oracle, query)
        counts = {}
        for d in m:
            key = (domain_by_doc[d], str(oracle.doclen[d] % 2))
            counts[key] = counts.get(key, 0) + 1
        items = sorted(counts.items())
        if after is not None:
            items = [kv for kv in items if kv[0] > after]
        return items

    FIELDS = ["domain", "cast(doclen % 2 as string)"]

    @pytest.mark.parametrize("query", QUERIES)
    def test_first_page(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        want = self._want(oracle, domain_by_doc, query)[:5]
        rows = idx.facet_composite(query, self.FIELDS, size=5).collect()
        assert [((r["k0"], r["k1"]), r["doc_count"]) for r in rows] == want

    def test_cursor_walk_covers_all_buckets(self, spark, corpus):
        """Paging with after-keys enumerates every bucket exactly once,
        in key order — the composite contract."""
        paths, oracle, domain_by_doc = corpus
        q = QUERIES[0]
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        want = self._want(oracle, domain_by_doc, q)
        got, after = [], None
        while True:
            rows = idx.facet_composite(q, self.FIELDS, size=3, after=after).collect()
            if not rows:
                break
            got.extend(((r["k0"], r["k1"]), r["doc_count"]) for r in rows)
            after = (rows[-1]["k0"], rows[-1]["k1"])
        assert got == want

    def test_after_validation(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_composite("python", self.FIELDS, after=("x",))
        with pytest.raises(ValueError):
            idx.facet_composite("python", [])


class TestFacetDateHistogram:
    @pytest.mark.parametrize("interval,trunc", [
        ("day", lambda t: t.replace(hour=0, minute=0, second=0,
                                    microsecond=0)),
        ("month", lambda t: t.replace(day=1, hour=0, minute=0, second=0,
                                      microsecond=0)),
        ("year", lambda t: t.replace(month=1, day=1, hour=0, minute=0,
                                     second=0, microsecond=0)),
    ])
    def test_matches_oracle(self, spark, corpus, interval, trunc):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        ts_by_doc = {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "warc_ts").collect()
        }
        q = QUERIES[0]
        m = _matched(oracle, q)
        want = {}
        for d in m:
            key = trunc(ts_by_doc[d])
            want[key] = want.get(key, 0) + 1
        rows = idx.facet_date_histogram(q, "warc_ts", interval).collect()
        got = {r["key"]: r["doc_count"] for r in rows}
        assert got == want
        assert [r["key"] for r in rows] == sorted(got)

    def test_bad_interval(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_date_histogram(QUERIES[0], "warc_ts", "fortnight")


class TestFacetDateRange:
    """ES date_range agg: half-open [from, to) timestamp buckets in
    request order, overlap + zero-fill like the range agg."""

    def _ts_by_doc(self, spark, paths):
        return {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "warc_ts").collect()
        }

    def test_matches_oracle(self, spark, corpus):
        from datetime import datetime

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        ts_by_doc = self._ts_by_doc(spark, paths)
        q = QUERIES[0]
        m = _matched(oracle, q)
        tss = sorted(ts_by_doc[d] for d in m)
        mid = tss[len(tss) // 2].strftime("%Y-%m-%d %H:%M:%S")
        ranges = [
            (None, mid),                      # *-mid
            (mid, None),                      # mid-*
            ("2000-01-01 00:00:00", mid),     # overlapping
            (mid, mid),                       # empty [x, x)
        ]
        rows = idx.facet_date_range(q, "warc_ts", ranges).collect()
        mid_dt = datetime.strptime(mid, "%Y-%m-%d %H:%M:%S")
        lo_dt = datetime(2000, 1, 1)

        def count(lo, hi):
            return sum(
                1 for d in m
                if (lo is None or ts_by_doc[d] >= lo)
                and (hi is None or ts_by_doc[d] < hi)
            )

        want = [
            count(None, mid_dt), count(mid_dt, None),
            count(lo_dt, mid_dt), 0,
        ]
        assert [r["doc_count"] for r in rows] == want
        assert rows[0]["key"] == f"*-{mid}"
        assert rows[1]["key"] == f"{mid}-*"
        assert sum(want[:2]) == len(m)  # the two halves partition m

    def test_bad_bound_refuses(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_date_range(
                QUERIES[0], "warc_ts", [("now-1M/d", None)]
            )

    def test_empty_ranges(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_date_range(QUERIES[0], "warc_ts", []).count() == 0


class TestAutoDateHistogram:
    """ES auto_date_histogram: the chosen calendar interval is the
    smallest ladder step fitting the span into <= `buckets` buckets,
    and the buckets equal facet_date_histogram at that interval."""

    def test_interval_choice_and_buckets(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        ts = {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "warc_ts").collect()
        }
        m = _matched(oracle, q)
        span = (
            max(ts[d] for d in m) - min(ts[d] for d in m)
        ).total_seconds()
        for buckets in (3, 10, 1000):
            df, interval = idx.facet_auto_date_histogram(
                q, "warc_ts", buckets=buckets
            )
            want_interval = "year"
            for name, secs in BM25Index._AUTO_INTERVALS:
                if span / secs + 1 <= buckets:
                    want_interval = name
                    break
            assert interval == want_interval
            if interval != "year":  # ladder not exhausted → fits
                assert df.count() <= buckets
            base = idx.facet_date_histogram(q, "warc_ts", interval)
            assert [tuple(r) for r in df.collect()] == [
                tuple(r) for r in base.collect()
            ]

    def test_validation(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_auto_date_histogram(QUERIES[0], "warc_ts", buckets=0)


class TestFacetPercentiles:
    @pytest.mark.parametrize("query", QUERIES)
    def test_exact_matches_numpy(self, spark, corpus, query):
        import numpy as np

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        dls = np.array(sorted(oracle.doclen[d] for d in m), dtype=float)
        percents = [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
        rows = idx.facet_percentiles(query, "doclen", percents).collect()
        assert [r["percent"] for r in rows] == percents
        for r, p in zip(rows, percents):
            want = float(np.percentile(dls, p, method="linear"))
            assert abs(r["value"] - want) < 1e-9, (query, p)

    def test_approx_within_rank_band(self, spark, corpus):
        """The sketch path (percentile_approx — the 10^12-doc plan)
        returns a true order statistic within ±1 percent-rank of the
        target (GK sketch guarantee at this accuracy); exact
        interpolates, so compare against the order-statistic band, not
        the interpolated value."""
        import numpy as np

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, QUERIES[0])
        dls = np.array(sorted(oracle.doclen[d] for d in m), dtype=float)
        approx = {
            r["percent"]: r["value"]
            for r in idx.facet_percentiles(
                QUERIES[0], "doclen", approx=True
            ).collect()
        }
        for p, v in approx.items():
            lo = float(np.percentile(dls, max(p - 1.0, 0.0), method="lower"))
            hi = float(np.percentile(dls, min(p + 1.0, 100.0), method="higher"))
            assert lo <= v <= hi, (p, v, lo, hi)

    def test_no_match(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_percentiles("zzqqxx", "doclen").collect() == []


class TestFacetTopHits:
    def _want(self, oracle, domain_by_doc, query, size, hits, mode="or"):
        terms = [
            t for t in set(tokenize_py(query)) if oracle.df.get(t, 0) > 0
        ]
        m = _matched(oracle, query, mode)
        scored = [(d, oracle.score(d, terms)) for d in m]
        by_bucket = {}
        for d, s in scored:
            by_bucket.setdefault(domain_by_doc[d], []).append((d, s))
        buckets = sorted(
            ((v, len(ds)) for v, ds in by_bucket.items()),
            key=lambda x: (-x[1], x[0]),
        )[:size]
        out = []
        for v, cnt in buckets:
            docs = sorted(by_bucket[v], key=lambda x: (-x[1], x[0]))[:hits]
            out.extend(
                (v, cnt, i + 1, d, s) for i, (d, s) in enumerate(docs)
            )
        return out

    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = [
            (r["value"], r["doc_count"], r["rank"], r["doc_id"], r["score"])
            for r in idx.facet_top_hits(
                query, "domain", size=4, hits_per_bucket=3
            ).collect()
        ]
        want = self._want(oracle, domain_by_doc, query, 4, 3)
        assert [g[:4] for g in got] == [w[:4] for w in want], query
        for g, w in zip(got, want):
            assert abs(g[4] - w[4]) < 1e-9

    def test_and_mode(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        q = QUERIES[0]
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = [
            (r["value"], r["doc_count"], r["rank"], r["doc_id"])
            for r in idx.facet_top_hits(
                q, "domain", size=3, hits_per_bucket=2, mode="and"
            ).collect()
        ]
        want = [w[:4] for w in self._want(
            oracle, domain_by_doc, q, 3, 2, mode="and")]
        assert got == want

    def test_no_match(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_top_hits("zzqqxx", "domain").collect() == []


class TestCountMatchesRefactor:
    """count_matches went through _matched_ids — pin the old contract."""

    @pytest.mark.parametrize("mode", ["or", "and"])
    def test_counts(self, spark, corpus, mode):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        for q in QUERIES:
            assert idx.count_matches(q, mode=mode) == len(
                _matched(oracle, q, mode)
            )
        assert idx.count_matches("zzqqxx") == 0


class TestSearchCollapse:
    def _want(self, oracle, domain_by_doc, query, k, allowed=None):
        terms = [
            t for t in set(tokenize_py(query)) if oracle.df.get(t, 0) > 0
        ]
        m = _matched(oracle, query, allowed=allowed)
        best = {}
        for d in m:
            v = domain_by_doc[d]
            s = oracle.score(d, terms)
            cur = best.get(v)
            if cur is None or (s, -d) > (cur[1], -cur[0]):
                best[v] = (d, s)
        reps = sorted(
            ((d, s, v) for v, (d, s) in best.items()),
            key=lambda x: (-x[1], x[0]),
        )
        return reps[:k]

    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = [
            (r["doc_id"], r["score"], r["value"])
            for r in idx.search_collapse(
                query, "domain", k=5, join_docs=False
            ).collect()
        ]
        want = self._want(oracle, domain_by_doc, query, 5)
        assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want]
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-9

    def test_one_result_per_value(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.search_collapse(
            QUERIES[0], "domain", k=20, join_docs=False
        ).collect()
        vals = [r["value"] for r in rows]
        assert len(vals) == len(set(vals))

    def test_dsl_collapse(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {
            "query": {"match": {"content": QUERIES[0]}},
            "collapse": {"field": "domain"},
            "size": 5,
        }
        got = [
            tuple(r)
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        want = [
            tuple(r)
            for r in idx.search_collapse(
                QUERIES[0], "domain", k=5, join_docs=False
            ).collect()
        ]
        assert got == want

    def test_join_docs_carries_value(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.search_collapse(QUERIES[0], "domain", k=3).collect()
        assert rows and all(
            r["value"] and r["url"] and r["title"] is not None
            for r in rows
        )


class TestFacetTermsMetrics:
    """ES terms + metric sub-aggs: one groupBy yields doc_count AND
    every metric, bucket order identical to facet_counts."""

    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        got = idx.facet_terms_metrics(
            query, "domain",
            {"avg_dl": ("avg", "doclen"), "max_dl": ("max", "doclen"),
             "sum_dl": ("sum", "doclen"), "min_dl": ("min", "doclen")},
            size=100,
        ).collect()
        exp = {}
        for d in m:
            exp.setdefault(domain_by_doc[d], []).append(oracle.doclen[d])
        assert {r["value"] for r in got} == set(exp)
        for r in got:
            dls = exp[r["value"]]
            assert r["doc_count"] == len(dls)
            assert abs(r["avg_dl"] - sum(dls) / len(dls)) < 1e-9
            assert r["max_dl"] == max(dls)
            assert r["sum_dl"] == sum(dls)
            assert r["min_dl"] == min(dls)
        # bucket order == facet_counts order (doc_count desc, value asc)
        counts = idx.facet_counts(query, "domain", size=100).collect()
        assert [r["value"] for r in got] == [r["value"] for r in counts]

    def test_validation(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="metric ops"):
            idx.facet_terms_metrics("python", "domain",
                                    {"x": ("median", "doclen")})
        with pytest.raises(ValueError, match="collide"):
            idx.facet_terms_metrics("python", "domain",
                                    {"doc_count": ("avg", "doclen")})

    def test_unknown_query_empty_schema(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        df = idx.facet_terms_metrics(
            "zzzznotaterm", "domain", {"avg_dl": ("avg", "doclen")}
        )
        assert df.columns == ["value", "doc_count", "avg_dl"]
        assert df.count() == 0


class TestBucketMetrics:
    """Metric sub-aggs folded into (date_)histogram buckets — the ES
    time-series shape — vs per-bucket Python recomputation."""

    def test_histogram_with_metrics(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        got = idx.facet_histogram(
            q, "doclen", 32.0,
            metrics={"avg_dl": ("avg", "doclen"), "max_dl": ("max", "doclen")},
        ).collect()
        exp = {}
        for d in m:
            key = (oracle.doclen[d] // 32) * 32.0
            exp.setdefault(key, []).append(oracle.doclen[d])
        assert {r["key"] for r in got} == set(exp)
        for r in got:
            dls = exp[r["key"]]
            assert r["doc_count"] == len(dls)
            assert abs(r["avg_dl"] - sum(dls) / len(dls)) < 1e-9
            assert r["max_dl"] == max(dls)
        # keys ascending, plain histogram counts unchanged
        keys = [r["key"] for r in got]
        assert keys == sorted(keys)
        plain = idx.facet_histogram(q, "doclen", 32.0).collect()
        assert [(r["key"], r["doc_count"]) for r in plain] == [
            (r["key"], r["doc_count"]) for r in got
        ]

    def test_date_histogram_with_metrics(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = idx.facet_date_histogram(
            QUERIES[0], "warc_ts", "month",
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()
        assert got and all(r["avg_dl"] is not None for r in got)
        plain = idx.facet_date_histogram(
            QUERIES[0], "warc_ts", "month"
        ).collect()
        assert [(r["key"], r["doc_count"]) for r in plain] == [
            (r["key"], r["doc_count"]) for r in got
        ]

    def test_validation(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="metric ops"):
            idx.facet_histogram(
                "python", "doclen", 16.0, metrics={"x": ("median", "doclen")}
            )
        with pytest.raises(ValueError, match="collide"):
            idx.facet_histogram(
                "python", "doclen", 16.0, metrics={"key": ("avg", "doclen")}
            )


class TestFacetTermsBuckets:
    """ES bucket-in-bucket (terms -> terms|histogram|date_histogram
    [-> metric leaves]) flattened to rows, vs full Python recomputation
    including the outer top-size cut, the per-outer-bucket inner terms
    cut, and null-inner-key accounting (doc counts in its outer bucket
    but yields no inner bucket, as for an ES sub-agg)."""

    def _outer(self, m, domain_by_doc, size):
        counts = {}
        for d in m:
            dom = domain_by_doc[d]
            counts[dom] = counts.get(dom, 0) + 1
        order = sorted(counts, key=lambda v: (-counts[v], v))[:size]
        return counts, order

    def test_terms_histogram_with_metrics(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        got = idx.facet_terms_buckets(
            q, "domain", ("histogram", "doclen", 64.0), size=3,
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()
        counts, order = self._outer(m, domain_by_doc, 3)
        exp = []
        for v in order:
            cells = {}
            for d in m:
                if domain_by_doc[d] != v:
                    continue
                key = (oracle.doclen[d] // 64) * 64.0
                cells.setdefault(key, []).append(oracle.doclen[d])
            for key in sorted(cells):
                exp.append((v, counts[v], key, len(cells[key]),
                            sum(cells[key]) / len(cells[key])))
        assert len(got) == len(exp)
        for r, (v, dc, key, kc, avg) in zip(got, exp):
            assert (r["value"], r["doc_count"], r["key"], r["key_count"]) \
                == (v, dc, key, kc)
            assert abs(r["avg_dl"] - avg) < 1e-9

    def test_terms_terms_inner_cut(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        m = _matched(oracle, q)
        got = idx.facet_terms_buckets(
            q, "domain", ("terms", "concat('g', pmod(doc_id, 3))"),
            size=100, inner_size=2,
        ).collect()
        counts, order = self._outer(m, domain_by_doc, 100)
        exp = []
        for v in order:
            cells = {}
            for d in m:
                if domain_by_doc[d] != v:
                    continue
                key = f"g{d % 3}"
                cells[key] = cells.get(key, 0) + 1
            inner = sorted(cells, key=lambda k: (-cells[k], k))[:2]
            for key in inner:
                exp.append((v, counts[v], key, cells[key]))
        assert [
            (r["value"], r["doc_count"], r["key"], r["key_count"])
            for r in got
        ] == exp

    def test_null_inner_key_counts_outer(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        got = idx.facet_terms_buckets(
            q, "domain",
            ("terms", "nullif(cast(pmod(doc_id, 2) as string), '0')"),
            size=100,
        ).collect()
        counts, _ = self._outer(m, domain_by_doc, 100)
        # outer doc_count includes null-inner-key docs...
        assert {r["value"]: r["doc_count"] for r in got} == {
            v: c for v, c in counts.items()
            if any(d % 2 == 1 and domain_by_doc[d] == v for d in m)
        }
        # ...but no null inner bucket surfaces
        assert all(r["key"] == "1" for r in got)
        for r in got:
            want = sum(
                1 for d in m if domain_by_doc[d] == r["value"] and d % 2 == 1
            )
            assert r["key_count"] == want

    def test_date_histogram_inner(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[2]
        m = _matched(oracle, q)
        ts_by_doc = {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "warc_ts").collect()
        }
        got = idx.facet_terms_buckets(
            q, "domain", ("date_histogram", "warc_ts", "month"), size=100
        ).collect()
        exp = {}
        for d in m:
            key = ts_by_doc[d].replace(
                day=1, hour=0, minute=0, second=0, microsecond=0
            )
            exp[(domain_by_doc[d], key)] = exp.get(
                (domain_by_doc[d], key), 0
            ) + 1
        assert {
            (r["value"], r["key"]): r["key_count"] for r in got
        } == exp
        # inner keys ascending within each outer bucket
        by_outer = {}
        for r in got:
            by_outer.setdefault(r["value"], []).append(r["key"])
        for keys in by_outer.values():
            assert keys == sorted(keys)

    def test_validation_and_empty(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="inner kind"):
            idx.facet_terms_buckets("python", "domain", ("range", "doclen"))
        with pytest.raises(ValueError, match="interval"):
            idx.facet_terms_buckets(
                "python", "domain", ("histogram", "doclen", 0)
            )
        with pytest.raises(ValueError, match="calendar_interval"):
            idx.facet_terms_buckets(
                "python", "domain", ("date_histogram", "warc_ts", "decade")
            )
        with pytest.raises(ValueError, match="collide"):
            idx.facet_terms_buckets(
                "python", "domain", ("terms", "domain"),
                metrics={"key_count": ("avg", "doclen")},
            )
        df = idx.facet_terms_buckets(
            "zzzznotaterm", "domain", ("histogram", "doclen", 16.0),
            metrics={"avg_dl": ("avg", "doclen")},
        )
        assert df.columns == [
            "value", "doc_count", "key", "key_count", "avg_dl"
        ]
        assert df.count() == 0


class TestMatchAllForeground:
    """query=None is the ES match_all aggs foreground: every live doc
    matches, the postings are never touched, predicates still apply."""

    def test_facet_counts_all(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = {
            r["value"]: r["doc_count"]
            for r in idx.facet_counts(None, "domain", size=100).collect()
        }
        exp = {}
        for d in oracle.tf:
            exp[domain_by_doc[d]] = exp.get(domain_by_doc[d], 0) + 1
        assert got == exp

    def test_facet_stats_all_with_predicate(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        dom = "example.com"
        row = idx.facet_stats(
            None, "doclen", predicate=f"domain = '{dom}'"
        ).collect()[0]
        dls = [
            oracle.doclen[d] for d in oracle.tf if domain_by_doc[d] == dom
        ]
        assert row["count"] == len(dls)
        assert row["sum"] == sum(dls)

    def test_count_matches_all(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.count_matches(None) == len(oracle.tf)

    def test_top_hits_all_constant_score(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_top_hits(
            None, "domain", size=3, hits_per_bucket=2
        ).collect()
        counts = {}
        for d in oracle.tf:
            counts[domain_by_doc[d]] = counts.get(domain_by_doc[d], 0) + 1
        order = sorted(counts, key=lambda v: (-counts[v], v))[:3]
        exp = []
        for v in order:
            ids = sorted(d for d in oracle.tf if domain_by_doc[d] == v)[:2]
            exp.extend(
                (v, counts[v], i + 1, doc, 1.0)
                for i, doc in enumerate(ids)
            )
        assert [
            (r["value"], r["doc_count"], r["rank"], r["doc_id"], r["score"])
            for r in rows
        ] == exp

    def test_terms_buckets_all(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_terms_buckets(
            None, "domain", ("histogram", "doclen", 128.0), size=2
        ).collect()
        counts = {}
        for d in oracle.tf:
            counts[domain_by_doc[d]] = counts.get(domain_by_doc[d], 0) + 1
        order = sorted(counts, key=lambda v: (-counts[v], v))[:2]
        exp = []
        for v in order:
            cells = {}
            for d in oracle.tf:
                if domain_by_doc[d] != v:
                    continue
                key = (oracle.doclen[d] // 128) * 128.0
                cells[key] = cells.get(key, 0) + 1
            exp.extend(
                (v, counts[v], k, cells[k]) for k in sorted(cells)
            )
        assert [
            (r["value"], r["doc_count"], r["key"], r["key_count"])
            for r in rows
        ] == exp


class TestFacetFilters:
    """ES filter / filters / missing aggs — one conditional-aggregation
    pass vs Python recomputation, incl. overlap, zero-fill, request
    order, and null metric values on empty buckets."""

    BUCKETS = {
        "short": "doclen < 100",
        "long": "doclen >= 100",
        "example": "domain = 'example.com'",   # overlaps both
        "nothing": "doclen < 0",               # always empty
    }

    @pytest.mark.parametrize("query", QUERIES)
    def test_filters_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        rows = idx.facet_filters(query, self.BUCKETS).collect()
        assert [r["key"] for r in rows] == list(self.BUCKETS)
        want = {
            "short": sum(1 for d in m if oracle.doclen[d] < 100),
            "long": sum(1 for d in m if oracle.doclen[d] >= 100),
            "example": sum(
                1 for d in m if domain_by_doc[d] == "example.com"
            ),
            "nothing": 0,
        }
        assert {r["key"]: r["doc_count"] for r in rows} == want

    def test_filters_no_indexed_term_zero_fill(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_filters("zzqqxx", self.BUCKETS).collect()
        assert [(r["key"], r["doc_count"]) for r in rows] == [
            (n, 0) for n in self.BUCKETS
        ]

    def test_filters_empty_refused(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_filters("python", {})

    def test_filter_with_metrics(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        row = idx.facet_filter(
            q, "doclen >= 100",
            metrics={"avg_dl": ("avg", "doclen"), "max_dl": ("max", "doclen")},
        ).collect()[0]
        dls = [oracle.doclen[d] for d in m if oracle.doclen[d] >= 100]
        assert row["doc_count"] == len(dls)
        assert abs(row["avg_dl"] - sum(dls) / len(dls)) < 1e-9
        assert row["max_dl"] == max(dls)

    def test_filter_empty_bucket_null_metrics(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        row = idx.facet_filter(
            QUERIES[0], "doclen < 0",
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()[0]
        assert row["doc_count"] == 0 and row["avg_dl"] is None

    def test_missing(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        m = _matched(oracle, q)
        # synthesize missing-ness from a derived expression
        row = idx.facet_missing(
            q, "nullif(cast(pmod(doc_id, 3) as string), '0')"
        ).collect()[0]
        assert row["doc_count"] == sum(1 for d in m if d % 3 == 0)

    def test_match_all_filters(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_filters(None, {"all": "doclen >= 0"}).collect()
        assert rows[0]["doc_count"] == len(oracle.tf)


class TestMultiAndRareTerms:
    def test_multi_terms_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        got = idx.facet_multi_terms(
            q, ["domain", "concat('g', pmod(doc_id, 2))"], size=100
        ).collect()
        exp = {}
        for d in m:
            key = (domain_by_doc[d], f"g{d % 2}")
            exp[key] = exp.get(key, 0) + 1
        order = sorted(exp, key=lambda k: (-exp[k], k[0], k[1]))
        assert [
            (r["value_0"], r["value_1"], r["doc_count"]) for r in got
        ] == [(a, b, exp[(a, b)]) for a, b in order]

    def test_rare_terms_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        m = _matched(oracle, q)
        # bucket by doclen (many near-unique values -> a real tail)
        got = idx.facet_rare_terms(
            q, "doclen", max_doc_count=2
        ).collect()
        counts = {}
        for d in m:
            v = str(oracle.doclen[d])
            counts[v] = counts.get(v, 0) + 1
        exp = sorted(
            ((v, c) for v, c in counts.items() if c <= 2),
            key=lambda x: (x[1], x[0]),
        )
        assert [(r["value"], r["doc_count"]) for r in got] == exp

    def test_validation(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_multi_terms("python", [])
        with pytest.raises(ValueError):
            idx.facet_rare_terms("python", "domain", max_doc_count=0)


class TestAdjacencyMatrix:
    BUCKETS = {
        "short": "doclen < 100",
        "long": "doclen >= 100",
        "example": "domain = 'example.com'",
    }

    def test_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        rows = idx.facet_adjacency_matrix(q, self.BUCKETS).collect()

        def sat(d, name):
            return {
                "short": oracle.doclen[d] < 100,
                "long": oracle.doclen[d] >= 100,
                "example": domain_by_doc[d] == "example.com",
            }[name]

        names = sorted(self.BUCKETS)
        exp = []
        for n in names:
            exp.append((n, sum(1 for d in m if sat(d, n))))
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                c = sum(1 for d in m if sat(d, a) and sat(d, b))
                if c > 0:
                    exp.append((f"{a}&{b}", c))
        assert [(r["key"], r["doc_count"]) for r in rows] == exp
        # short&long is an impossible intersection — must be absent
        assert all(r["key"] != "long&short" for r in rows)

    def test_singletons_zero_filled_on_no_match(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.facet_adjacency_matrix("zzqqxx", self.BUCKETS).collect()
        assert [(r["key"], r["doc_count"]) for r in rows] == [
            (n, 0) for n in sorted(self.BUCKETS)
        ]


class TestExtendedStatsAndWeightedAvg:
    @pytest.mark.parametrize("query", QUERIES[:2])
    def test_extended_stats_matches_oracle(self, spark, corpus, query):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        row = idx.facet_extended_stats(query, "doclen", sigma=3.0) \
            .collect()[0]
        dls = [oracle.doclen[d] for d in m]
        n = len(dls)
        mean = sum(dls) / n
        var = sum((x - mean) ** 2 for x in dls) / n  # population, like ES
        assert row["count"] == n
        assert row["sum_of_squares"] == sum(x * x for x in dls)
        assert abs(row["variance"] - var) < 1e-6
        assert abs(row["std_deviation"] - var ** 0.5) < 1e-9
        assert abs(row["upper"] - (mean + 3 * var ** 0.5)) < 1e-9
        assert abs(row["lower"] - (mean - 3 * var ** 0.5)) < 1e-9

    def test_weighted_avg_matches_oracle(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        # weight = pmod(doc_id, 3) + 1 — deterministic, recomputable
        row = idx.facet_weighted_avg(
            q, "doclen", "pmod(doc_id, 3) + 1"
        ).collect()[0]
        num = sum(oracle.doclen[d] * (d % 3 + 1) for d in m)
        den = sum(d % 3 + 1 for d in m)
        assert abs(row["value"] - num / den) < 1e-9


class TestBucketPipeline:
    """Pipeline aggs (derivative / cumulative_sum / moving_avg) over
    (date_)histogram buckets vs Python recomputation."""

    def test_pipeline_matches_oracle(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        base = idx.facet_histogram(q, "doclen", 32.0)
        out = idx.bucket_pipeline(
            base, "doc_count", derivative="deriv",
            cumulative_sum="cum", moving_avg=("mov", 3),
        ).collect()
        counts = [r["doc_count"] for r in base.collect()]
        run = 0
        for i, r in enumerate(out):
            assert r["deriv"] == (
                None if i == 0 else counts[i] - counts[i - 1]
            )
            run += counts[i]
            assert r["cum"] == run
            w = counts[max(0, i - 2): i + 1]
            assert abs(r["mov"] - sum(w) / len(w)) < 1e-9

    def test_validation(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        base = idx.facet_histogram(QUERIES[0], "doclen", 32.0)
        with pytest.raises(ValueError):
            idx.bucket_pipeline(base)
        with pytest.raises(ValueError):
            idx.bucket_pipeline(base, moving_avg=("m", 0))
        with pytest.raises(ValueError):
            idx.bucket_pipeline(base, serial_diff=("s", 0))
        with pytest.raises(ValueError):
            idx.sibling_bucket_stats(base, "doc_count", "median_bucket")


class TestPipelineExtended:
    """The remaining ES parent pipeline aggs (serial_diff,
    bucket_script, bucket_selector, bucket_sort) and the sibling
    family (avg/sum/min/max/stats_bucket) vs Python recomputation."""

    @pytest.fixture()
    def base(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        df = idx.facet_histogram(QUERIES[0], "doclen", 32.0)
        return idx, df, [r["doc_count"] for r in df.collect()]

    def test_serial_diff(self, base):
        idx, df, counts = base
        out = idx.bucket_pipeline(df, "doc_count",
                                  serial_diff=("sd", 2)).collect()
        for i, r in enumerate(out):
            want = None if i < 2 else counts[i] - counts[i - 2]
            assert r["sd"] == want

    def test_bucket_script_sees_prior_outputs(self, base):
        idx, df, counts = base
        out = idx.bucket_pipeline(
            df, "doc_count", cumulative_sum="cum",
            bucket_script=("pct", "doc_count * 100.0 / cum"),
        ).collect()
        run = 0
        for i, r in enumerate(out):
            run += counts[i]
            assert abs(r["pct"] - counts[i] * 100.0 / run) < 1e-9

    def test_bucket_selector_drops_buckets(self, base):
        idx, df, counts = base
        cut = sorted(counts)[len(counts) // 2]
        out = idx.bucket_pipeline(
            df, bucket_selector=f"doc_count >= {cut}"
        ).collect()
        assert [r["doc_count"] for r in out] == [
            c for c in counts if c >= cut
        ]

    def test_bucket_sort_orders_and_truncates(self, base):
        idx, df, counts = base
        rows = [(r["key"], r["doc_count"]) for r in df.collect()]
        out = idx.bucket_pipeline(
            df,
            bucket_sort=([("doc_count", "desc"), ("key", "asc")], 1, 3),
        ).collect()
        want = sorted(rows, key=lambda kv: (-kv[1], kv[0]))[1:4]
        assert [(r["key"], r["doc_count"]) for r in out] == want
        # empty sort list = pure from/size truncation in key order
        out2 = idx.bucket_pipeline(df, bucket_sort=([], 0, 2)).collect()
        assert [(r["key"], r["doc_count"]) for r in out2] == sorted(
            rows
        )[:2]

    def test_sibling_bucket_stats(self, base):
        idx, df, counts = base
        row = idx.sibling_bucket_stats(
            df, "doc_count", "stats_bucket"
        ).collect()[0]
        assert row["count"] == len(counts)
        assert row["min"] == min(counts)
        assert row["max"] == max(counts)
        assert row["sum"] == sum(counts)
        assert abs(row["avg"] - sum(counts) / len(counts)) < 1e-9
        for kind, want in [
            ("avg_bucket", sum(counts) / len(counts)),
            ("sum_bucket", sum(counts)),
            ("min_bucket", min(counts)),
            ("max_bucket", max(counts)),
        ]:
            got = idx.sibling_bucket_stats(
                df, "doc_count", kind
            ).collect()[0]["value"]
            assert abs(got - want) < 1e-9


class TestTermsOrder:
    def test_order_by_key_and_metric(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        by_key = idx.facet_counts(
            q, "domain", size=100, order_by=("value", "asc")
        ).collect()
        assert [r["value"] for r in by_key] == sorted(
            {domain_by_doc[d] for d in m}
        )
        by_metric = idx.facet_terms_metrics(
            q, "domain", {"avg_dl": ("avg", "doclen")}, size=100,
            order_by=("avg_dl", "desc"),
        ).collect()
        avgs = [r["avg_dl"] for r in by_metric]
        assert avgs == sorted(avgs, reverse=True)
        with pytest.raises(ValueError):
            idx.facet_counts(q, "domain", order_by=("nope", "asc"))


class TestTermsMissingMinDocCount:
    def test_missing_placeholder_and_threshold(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        # a derived field that is null for doc_id % 3 == 0
        fld = "nullif(cast(pmod(doc_id, 3) as string), '0')"
        # without missing: null-field docs produce no bucket
        plain = idx.facet_counts(q, fld, size=100).collect()
        assert {r["value"] for r in plain} == {"1", "2"}
        # with missing: they bucket under the placeholder
        got = {
            r["value"]: r["doc_count"]
            for r in idx.facet_counts(
                q, fld, size=100, missing="N/A"
            ).collect()
        }
        assert got["N/A"] == sum(1 for d in m if d % 3 == 0)
        assert sum(got.values()) == len(m)
        # min_doc_count drops small buckets
        thresh = idx.facet_counts(
            q, "domain", size=100, min_doc_count=5
        ).collect()
        assert all(r["doc_count"] >= 5 for r in thresh)


class TestTopMetrics:
    def test_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        rows = idx.facet_top_metrics(
            q, ["doclen"], ("doclen", "desc"), size=3
        ).collect()
        want = sorted(m, key=lambda d: (-oracle.doclen[d], d))[:3]
        assert [(r["doc_id"], r["doclen"]) for r in rows] == [
            (d, float(oracle.doclen[d])) for d in want
        ]

    def test_validation(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_top_metrics("python", [], ("doclen", "desc"))
        with pytest.raises(ValueError):
            idx.facet_top_metrics("python", ["doclen"], ("doclen", "down"))


class TestBoxplotAndMad:
    def _vals(self, oracle, q):
        return sorted(oracle.doclen[d] for d in _matched(oracle, q))

    @staticmethod
    def _pctl(xs, f):
        """Linear-interpolated percentile (Spark `percentile`)."""
        n = len(xs)
        pos = f * (n - 1)
        lo = int(pos)
        hi = min(lo + 1, n - 1)
        return xs[lo] + (pos - lo) * (xs[hi] - xs[lo])

    def test_boxplot_matches_oracle(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        xs = self._vals(oracle, q)
        row = idx.facet_boxplot(q, "doclen").collect()[0]
        assert row["min"] == xs[0] and row["max"] == xs[-1]
        for col, f in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
            assert abs(row[col] - self._pctl(xs, f)) < 1e-9, col

    def test_mad_matches_oracle(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        xs = self._vals(oracle, q)
        med = self._pctl(xs, 0.5)
        devs = sorted(abs(x - med) for x in xs)
        want = self._pctl(devs, 0.5)
        row = idx.facet_mad(q, "doclen").collect()[0]
        assert abs(row["value"] - want) < 1e-9

    def test_no_match_empty(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_boxplot("zzqqxx", "doclen").count() == 0
        assert idx.facet_mad("zzqqxx", "doclen").count() == 0


class TestTermsSet:
    """ES terms_set query: docs matching >= M of the given terms,
    M constant or per-doc from a docs expression; score = bool-should
    BM25 sum of the matched terms — vs BM25Oracle recomputation."""

    TERMS_Q = "python tutorial fox learning"

    def _want(self, oracle, req_fn, k=10):
        terms = sorted(set(tokenize_py(self.TERMS_Q)))
        live = [t for t in terms if oracle.df.get(t, 0) > 0]
        scored = []
        for d, tf in oracle.tf.items():
            m = sum(1 for t in live if t in tf)
            if m >= req_fn(d):
                s = oracle.score(d, live)
                scored.append((d, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]

    def test_constant_threshold(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        terms = sorted(set(tokenize_py(self.TERMS_Q)))
        for msm in (1, 2, 3):
            got = [
                (r["doc_id"], r["score"])
                for r in idx.search_terms_set(
                    terms, k=10, minimum_should_match=msm,
                    join_docs=False,
                ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
            ]
            want = self._want(oracle, lambda d: msm)
            assert [d for d, _ in got] == [d for d, _ in want], msm
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9

    def test_per_doc_field_threshold(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        terms = sorted(set(tokenize_py(self.TERMS_Q)))
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_terms_set(
                terms, k=10,
                minimum_should_match_field="1 + pmod(doc_id, 3)",
                join_docs=False,
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = self._want(oracle, lambda d: 1 + d % 3)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    def test_validation_and_dsl(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        terms = sorted(set(tokenize_py(self.TERMS_Q)))
        with pytest.raises(ValueError):
            idx.search_terms_set(terms)          # no threshold source
        with pytest.raises(ValueError):
            idx.search_terms_set(
                terms, minimum_should_match=1,
                minimum_should_match_field="doclen",
            )
        body = {"query": {"terms_set": {"content": {
            "terms": terms,
            "minimum_should_match_script": {"source": "2"},
        }}}, "size": 10}
        got = execute_es_query(idx, body, join_docs=False)
        want = idx.search_terms_set(
            terms, k=10, minimum_should_match=2, join_docs=False
        )
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]


class TestMatrixStats:
    """ES matrix_stats agg: pairwise covariance/correlation over
    numeric docs fields, docs missing any field excluded — vs Python
    statistics over the matched set."""

    def test_matches_python(self, spark, corpus):
        import statistics

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        dl_by_doc = {
            r["doc_id"]: r["doclen"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "doclen").collect()
        }
        m = sorted(_matched(oracle, q))
        xs = [float(dl_by_doc[d]) for d in m]
        ys = [float(d % 13) for d in m]
        rows = idx.facet_matrix_stats(
            q, ["doclen", "pmod(doc_id, 13)"]
        ).collect()
        by_pair = {(r["field_a"], r["field_b"]): r for r in rows}
        assert set(by_pair) == {
            ("doclen", "doclen"),
            ("doclen", "pmod(doc_id, 13)"),
            ("pmod(doc_id, 13)", "pmod(doc_id, 13)"),
        }
        diag = by_pair[("doclen", "doclen")]
        assert diag["doc_count"] == len(m)
        assert abs(diag["mean_a"] - statistics.fmean(xs)) < 1e-9
        assert abs(diag["covariance"] - statistics.variance(xs)) < 1e-6
        assert diag["correlation"] == 1.0
        off = by_pair[("doclen", "pmod(doc_id, 13)")]
        assert abs(off["covariance"] - statistics.covariance(xs, ys)) < 1e-6
        assert abs(
            off["correlation"] - statistics.correlation(xs, ys)
        ) < 1e-9

    def test_dsl_and_validation(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_matrix_stats(QUERIES[0], [])
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {"mx": {"matrix_stats": {
                    "fields": ["doclen", "pmod(doc_id, 13)"]}}}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_matrix_stats(
            QUERIES[0], ["doclen", "pmod(doc_id, 13)"]
        )
        assert [tuple(r) for r in out["mx"].collect()] == [
            tuple(r) for r in want.collect()
        ]


class TestPercentileRanks:
    """ES percentile_ranks agg — the inverse CDF of percentiles:
    100 · count(x <= v) / count per requested value, one conditional
    single-row aggregate — vs Python recomputation."""

    VALUES = [50.0, 100.0, 250.0]

    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        m = _matched(oracle, query)
        dls = [oracle.doclen[d] for d in m]
        rows = idx.facet_percentile_ranks(query, "doclen", self.VALUES).collect()
        assert [r["value"] for r in rows] == self.VALUES
        for r, v in zip(rows, self.VALUES):
            want = 100.0 * sum(1 for x in dls if x <= v) / len(dls)
            assert abs(r["percent"] - want) < 1e-9

    def test_no_indexed_terms(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        assert idx.facet_percentile_ranks(
            "zzqqxx", "doclen", self.VALUES
        ).collect() == []

    def test_empty_values_refused(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_percentile_ranks(QUERIES[0], "doclen", [])

    def test_dsl(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {"pr": {"percentile_ranks": {
                    "field": "doclen", "values": self.VALUES}}}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_percentile_ranks(QUERIES[0], "doclen", self.VALUES)
        assert [tuple(r) for r in out["pr"].collect()] == [
            tuple(r) for r in want.collect()
        ]


class TestFiltersOtherBucket:
    """ES filters agg other_bucket: docs matching NONE of the named
    predicates, incl. null-predicate docs (three-valued NOT folded to
    false before negation)."""

    BUCKETS = {
        "short": "doclen < 100",
        "example": "domain = 'example.com'",
    }

    def test_other_bucket_counts(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        rows = idx.facet_filters(
            q, self.BUCKETS, other_bucket=True
        ).collect()
        assert [r["key"] for r in rows] == ["short", "example", "_other_"]
        want_other = sum(
            1 for d in m
            if not (oracle.doclen[d] < 100
                    or domain_by_doc[d] == "example.com")
        )
        got = {r["key"]: r["doc_count"] for r in rows}
        assert got["_other_"] == want_other
        # every matched doc lands somewhere (buckets may overlap, so
        # the named buckets can over-count; other is exact complement)
        assert got["_other_"] == len(m) - sum(
            1 for d in m
            if oracle.doclen[d] < 100 or domain_by_doc[d] == "example.com"
        )

    def test_null_predicate_doc_falls_in_other(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        m = _matched(oracle, q)
        # nullif makes the predicate NULL for doc_id % 2 == 0
        rows = idx.facet_filters(
            q,
            {"oddish": "nullif(pmod(doc_id, 2), 0) = 1"},
            other_bucket=True,
            other_bucket_key="rest",
        ).collect()
        got = {r["key"]: r["doc_count"] for r in rows}
        assert got["oddish"] == sum(1 for d in m if d % 2 == 1)
        assert got["rest"] == sum(1 for d in m if d % 2 == 0)

    def test_key_collision_refused(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.facet_filters(
                QUERIES[0], {"a": "doclen < 0"},
                other_bucket=True, other_bucket_key="a",
            )

    def test_dsl_other_bucket(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {"kinds": {"filters": {
                    "other_bucket_key": "misc",
                    "filters": {
                        "short": {"range": {"doclen": {"lt": 100}}},
                    }}}}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_filters(
            QUERIES[0], {"short": "doclen < 100"},
            other_bucket=True, other_bucket_key="misc",
        )
        assert [tuple(r) for r in out["kinds"].collect()] == [
            tuple(r) for r in want.collect()
        ]


class TestHistogramOptions:
    """ES histogram/date_histogram options: offset, min_doc_count
    (sparse-drop and zero-fill), extended_bounds, hard_bounds,
    fixed_interval — vs Python recomputation."""

    def test_offset_keys(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        interval, offset = 25.0, 10.0
        want = {}
        for d in m:
            key = math.floor(
                (oracle.doclen[d] - offset) / interval
            ) * interval + offset
            want[key] = want.get(key, 0) + 1
        rows = idx.facet_histogram(
            q, "doclen", interval, offset=offset
        ).collect()
        assert {r["key"]: r["doc_count"] for r in rows} == want

    def test_min_doc_count_drops_sparse(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        base = idx.facet_histogram(q, "doclen", 25.0).collect()
        thresh = sorted(r["doc_count"] for r in base)[len(base) // 2]
        got = idx.facet_histogram(
            q, "doclen", 25.0, min_doc_count=thresh
        ).collect()
        assert [(r["key"], r["doc_count"]) for r in got] == [
            (r["key"], r["doc_count"]) for r in base
            if r["doc_count"] >= thresh
        ]

    def test_zero_fill_contiguous(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        rows = idx.facet_histogram(
            q, "doclen", 5.0, min_doc_count=0
        ).collect()
        keys = [r["key"] for r in rows]
        # spine is contiguous at interval spacing
        assert keys == [keys[0] + 5.0 * i for i in range(len(keys))]
        base = {
            r["key"]: r["doc_count"]
            for r in idx.facet_histogram(q, "doclen", 5.0).collect()
        }
        got = {r["key"]: r["doc_count"] for r in rows}
        assert {k: v for k, v in got.items() if v > 0} == base
        assert min(keys) == min(base) and max(keys) == max(base)

    def test_extended_bounds_widen(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        base = idx.facet_histogram(
            q, "doclen", 25.0, min_doc_count=0
        ).collect()
        rows = idx.facet_histogram(
            q, "doclen", 25.0, min_doc_count=0,
            extended_bounds=(0.0, 1000.0),
        ).collect()
        keys = [r["key"] for r in rows]
        # widened on the low side to 0, never clipped on the high side
        hi = max(base[-1]["key"], 1000.0)
        assert keys[0] == 0.0 and keys[-1] == hi
        assert len(keys) == int(hi / 25.0) + 1

    def test_hard_bounds_clip(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        base = idx.facet_histogram(q, "doclen", 25.0).collect()
        got = idx.facet_histogram(
            q, "doclen", 25.0, hard_bounds=(50.0, 150.0)
        ).collect()
        assert [(r["key"], r["doc_count"]) for r in got] == [
            (r["key"], r["doc_count"]) for r in base
            if 50.0 <= r["key"] <= 150.0
        ]

    def test_max_buckets_guard(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="max_buckets"):
            idx.facet_histogram(
                QUERIES[0], "doclen", 0.001, min_doc_count=0
            ).collect()

    def test_fixed_interval_matches_python(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        ts = {
            r["doc_id"]: r["warc_ts"].timestamp()
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", F.col("warc_ts")).collect()
        }
        secs = 6 * 3600
        want = {}
        for d in m:
            k = math.floor(ts[d] / secs) * secs
            want[k] = want.get(k, 0) + 1
        rows = idx.facet_date_histogram(
            q, "warc_ts", fixed_interval="6h"
        ).collect()
        got = {r["key"].timestamp(): r["doc_count"] for r in rows}
        assert got == want

    def test_fixed_interval_zero_fill(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        rows = idx.facet_date_histogram(
            q, "warc_ts", fixed_interval="1h", min_doc_count=0
        ).collect()
        keys = [r["key"].timestamp() for r in rows]
        assert keys == [keys[0] + 3600 * i for i in range(len(keys))]
        base = idx.facet_date_histogram(
            q, "warc_ts", fixed_interval="1h"
        ).collect()
        got = {r["key"]: r["doc_count"] for r in rows}
        assert {k: v for k, v in got.items() if v > 0} == {
            r["key"]: r["doc_count"] for r in base
        }

    def test_calendar_zero_fill_refused(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="fixed_interval"):
            idx.facet_date_histogram(
                QUERIES[0], "warc_ts", "day", min_doc_count=0
            )

    def test_bad_duration(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="duration"):
            idx.facet_date_histogram(
                QUERIES[0], "warc_ts", fixed_interval="1 fortnight"
            )

    def test_dsl_lowering(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {
                    "h": {"histogram": {
                        "field": "doclen", "interval": 25, "offset": 10,
                        "min_doc_count": 0,
                        "extended_bounds": {"min": 10, "max": 510}}},
                    "dh": {"date_histogram": {
                        "field": "warc_ts", "fixed_interval": "12h",
                        "offset": "+1h"}},
                }}
        out = execute_es_aggs(idx, body)
        want_h = idx.facet_histogram(
            QUERIES[0], "doclen", 25.0, offset=10.0, min_doc_count=0,
            extended_bounds=(10.0, 510.0),
        )
        want_dh = idx.facet_date_histogram(
            QUERIES[0], "warc_ts", fixed_interval="12h", offset="+1h"
        )
        assert [tuple(r) for r in out["h"].collect()] == [
            tuple(r) for r in want_h.collect()
        ]
        assert [tuple(r) for r in out["dh"].collect()] == [
            tuple(r) for r in want_dh.collect()
        ]


class TestSamplerAggs:
    """ES sampler / diversified_sampler: sub-aggs over the top
    shard_size best-scoring matches (global deterministic cut) —
    engine id set and DSL-lowered sub-aggs vs Python recomputation."""

    def _oracle_sample(self, oracle, query, shard_size):
        scored = sorted(
            oracle.or_scores(query).items(), key=lambda x: (-x[1], x[0])
        )
        return [d for d, _ in scored[:shard_size]]

    def test_sampler_ids_match_oracle(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        got = sorted(
            r["doc_id"]
            for r in idx.sampler_ids(q, shard_size=25).collect()
        )
        assert got == sorted(self._oracle_sample(oracle, q, 25))

    def test_diversified_caps_per_value(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        cap = 2
        got = [
            r["doc_id"]
            for r in idx.sampler_ids(
                q, shard_size=15, field="domain", max_docs_per_value=cap
            ).collect()
        ]
        # python twin: per-domain rank by (-round(score,9), doc_id),
        # keep <= cap, then global cut
        scored = oracle.or_scores(q)
        by_dom = {}
        for d in sorted(scored, key=lambda d: (-round(scored[d], 9), d)):
            dom = domain_by_doc[d]
            by_dom.setdefault(dom, []).append(d)
        kept = {d for ds in by_dom.values() for d in ds[:cap]}
        want = [
            d for d, _ in sorted(
                ((d, s) for d, s in scored.items() if d in kept),
                key=lambda x: (-x[1], x[0]),
            )[:15]
        ]
        assert sorted(got) == sorted(want)
        # cap actually binds
        doms = [domain_by_doc[d] for d in got]
        assert all(doms.count(x) <= cap for x in set(doms))

    def test_facets_accept_id_frame(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[1]
        ids = idx.sampler_ids(q, shard_size=20)
        rows = idx.facet_counts(ids, "domain", size=50).collect()
        sample = self._oracle_sample(oracle, q, 20)
        want = {}
        for d in sample:
            want[domain_by_doc[d]] = want.get(domain_by_doc[d], 0) + 1
        assert {r["value"]: r["doc_count"] for r in rows} == want

    def test_dsl_sampler(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        body = {"query": {"match": {"content": q}},
                "aggs": {"s": {
                    "sampler": {"shard_size": 30},
                    "aggs": {"by_dom": {"terms": {
                        "field": "domain", "size": 50}}},
                }}}
        out = execute_es_aggs(idx, body)
        sample = self._oracle_sample(oracle, q, 30)
        assert out["s"]["doc_count"] == len(sample)
        want = {}
        for d in sample:
            want[domain_by_doc[d]] = want.get(domain_by_doc[d], 0) + 1
        got = {
            r["value"]: r["doc_count"] for r in out["s"]["by_dom"].collect()
        }
        assert got == want

    def test_dsl_sampler_unknown_terms(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": "zzqqxx"}},
                "aggs": {"s": {
                    "sampler": {"shard_size": 10},
                    "aggs": {"st": {"stats": {"field": "doclen"}}},
                }}}
        out = execute_es_aggs(idx, body)
        assert out["s"]["doc_count"] == 0

    def test_validation(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="shard_size"):
            idx.sampler_ids(QUERIES[0], shard_size=0)
        with pytest.raises(ValueError, match="field"):
            idx.sampler_ids(QUERIES[0], max_docs_per_value=2)


class TestCumulativeCardinality:
    """ES cumulative_cardinality pipeline: exact distinct-to-date per
    date bucket via the first-appearance trick — vs Python."""

    def test_matches_python(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        m = _matched(oracle, q)
        ts = {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs)
            .select("doc_id", "warc_ts").collect()
        }
        day = {d: ts[d].date() for d in m}
        rows = idx.facet_cumulative_cardinality(
            q, "domain", "warc_ts", calendar_interval="day"
        ).collect()
        # python: first day per domain, then cumulative distinct
        first_day = {}
        for d in sorted(m):
            dom = domain_by_doc[d]
            if dom not in first_day or day[d] < first_day[dom]:
                first_day[dom] = day[d]
        keys = [r["key"].date() for r in rows]
        assert keys == sorted(keys)
        seen = set()
        for r in rows:
            kd = r["key"].date()
            assert r["doc_count"] == sum(1 for d in m if day[d] == kd)
            new = {v for v, fd in first_day.items() if fd == kd}
            assert r["new_values"] == len(new)
            seen |= {v for v, fd in first_day.items() if fd <= kd}
            assert r["cumulative_cardinality"] == len(seen)
        # final cumulative = total distinct domains over matches
        assert rows[-1]["cumulative_cardinality"] == len(
            {domain_by_doc[d] for d in m}
        )

    def test_dsl_shape(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        body = {"query": {"match": {"content": q}},
                "aggs": {"daily": {
                    "date_histogram": {"field": "warc_ts",
                                       "calendar_interval": "day"},
                    "aggs": {
                        "doms": {"cardinality": {"field": "domain"}},
                        "total": {"cumulative_cardinality": {
                            "buckets_path": "doms"}},
                    },
                }}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_cumulative_cardinality(
            q, "domain", "warc_ts", calendar_interval="day"
        )
        assert [tuple(r) for r in out["daily"].collect()] == [
            tuple(r) for r in want.collect()
        ]

    def test_bad_buckets_path(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {"daily": {
                    "date_histogram": {"field": "warc_ts",
                                       "calendar_interval": "day"},
                    "aggs": {
                        "doms": {"cardinality": {"field": "domain"}},
                        "total": {"cumulative_cardinality": {
                            "buckets_path": "nope"}},
                    },
                }}}
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, body)


class TestRateAgg:
    """ES rate agg under a fixed_interval date_histogram: metric
    rescaled from bucket width to the requested unit."""

    def test_rescale(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        base = idx.facet_date_histogram(q, "warc_ts", fixed_interval="12h")
        got = idx.rate(base, "12h", unit="day").collect()
        for r in got:
            assert r["rate"] == pytest.approx(r["doc_count"] * 2.0)

    def test_dsl_and_refusals(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "aggs": {"dh": {
                    "date_histogram": {"field": "warc_ts",
                                       "fixed_interval": "6h"},
                    "aggs": {"per_day": {"rate": {"unit": "day"}}},
                }}}
        out = execute_es_aggs(idx, body)
        for r in out["dh"].collect():
            assert r["per_day"] == pytest.approx(r["doc_count"] * 4.0)
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, {
                "query": {"match": {"content": QUERIES[0]}},
                "aggs": {"dh": {
                    "date_histogram": {"field": "warc_ts",
                                       "calendar_interval": "day"},
                    "aggs": {"r": {"rate": {"unit": "hour"}}},
                }}})
        with pytest.raises(ValueError, match="unit"):
            idx.rate(
                idx.facet_date_histogram(
                    QUERIES[0], "warc_ts", fixed_interval="6h"
                ),
                "6h", unit="fortnight",
            )


class TestStringStats:
    def test_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        query = "python programming tutorial"
        m = _matched(oracle, query)
        vals = [domain_by_doc[d] for d in m if domain_by_doc[d] is not None]
        row = idx.facet_string_stats(
            query, "domain", show_distribution=True
        ).collect()[0]
        assert row["count"] == len(vals)
        assert row["min_length"] == min(len(v) for v in vals)
        assert row["max_length"] == max(len(v) for v in vals)
        assert abs(
            row["avg_length"] - sum(len(v) for v in vals) / len(vals)
        ) < 1e-9
        from collections import Counter

        chars = Counter("".join(vals))
        total = sum(chars.values())
        ent = -sum(
            (c / total) * math.log2(c / total) for c in chars.values()
        )
        assert abs(row["entropy"] - ent) < 1e-9
        dist = row["distribution"]
        assert abs(sum(dist.values()) - 1.0) < 1e-9
        for ch, c in chars.items():
            assert abs(dist[ch] - c / total) < 1e-12

    def test_dsl_lowering(self, spark, corpus):
        paths, oracle, _ = corpus
        from search_engine_spark.query.dsl import execute_es_aggs

        idx = BM25Index(spark, paths.root, seed_min_df=0)
        out = execute_es_aggs(
            idx,
            {
                "query": {"match": {"content": "quick brown fox"}},
                "aggs": {"d": {"string_stats": {"field": "domain"}}},
            },
        )
        got = out["d"].collect()[0]
        want = idx.facet_string_stats("quick brown fox", "domain").collect()[0]
        assert got["count"] == want["count"]
        assert abs(got["entropy"] - want["entropy"]) < 1e-12


class TestTTest:
    @staticmethod
    def _welch(xs, ys):
        import statistics

        na, nb = len(xs), len(ys)
        ma, mb = sum(xs) / na, sum(ys) / nb
        va, vb = statistics.variance(xs), statistics.variance(ys)
        ea, eb = va / na, vb / nb
        t = (ma - mb) / math.sqrt(ea + eb)
        dof = (ea + eb) ** 2 / (ea**2 / (na - 1) + eb**2 / (nb - 1))
        return t, dof

    def test_welch_matches_oracle(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        query = "python programming tutorial"
        m = _matched(oracle, query)
        dom = sorted({domain_by_doc[d] for d in m})[0]
        xs = [oracle.doclen[d] for d in m if domain_by_doc[d] == dom]
        ys = [oracle.doclen[d] for d in m if domain_by_doc[d] != dom]
        row = idx.facet_t_test(
            query,
            {"field": "doclen", "filter": f"domain = '{dom}'"},
            {"field": "doclen", "filter": f"domain <> '{dom}'"},
        ).collect()[0]
        t, dof = self._welch(xs, ys)
        assert row["n_a"] == len(xs) and row["n_b"] == len(ys)
        assert abs(row["t_statistic"] - t) < 1e-9
        assert abs(row["dof"] - dof) < 1e-6
        from search_engine_spark.query.stattests import (
            student_t_two_tailed_p,
        )

        assert abs(row["p_value"] - student_t_two_tailed_p(t, dof)) < 1e-9

    def test_paired(self, spark, corpus):
        paths, oracle, _ = corpus
        import statistics

        idx = BM25Index(spark, paths.root, seed_min_df=0)
        query = "quick brown fox"
        m = _matched(oracle, query)
        titles = {
            r["doc_id"]: r["_t"]
            for r in spark.read.parquet(paths.docs)
            .selectExpr("doc_id", "length(coalesce(title, '')) as _t")
            .collect()
        }
        diffs = [oracle.doclen[d] - titles[d] for d in m]
        t = (sum(diffs) / len(diffs)) / math.sqrt(
            statistics.variance(diffs) / len(diffs)
        )
        row = idx.facet_t_test(
            query,
            {"field": "doclen"},
            {"field": "length(coalesce(title, ''))"},
            type="paired",
        ).collect()[0]
        assert row["n_a"] == len(diffs)
        assert abs(row["t_statistic"] - t) < 1e-9
        assert abs(row["dof"] - (len(diffs) - 1)) < 1e-12

    def test_p_value_table(self):
        # published two-tailed critical values of Student's t
        from search_engine_spark.query.stattests import (
            student_t_two_tailed_p,
        )

        assert abs(student_t_two_tailed_p(12.706, 1) - 0.05) < 1e-3
        assert abs(student_t_two_tailed_p(2.228, 10) - 0.05) < 1e-4
        assert abs(student_t_two_tailed_p(1.0, 1) - 0.5) < 1e-9
        assert abs(student_t_two_tailed_p(0.0, 30) - 1.0) < 1e-12
        assert abs(
            student_t_two_tailed_p(-2.228, 10)
            - student_t_two_tailed_p(2.228, 10)
        ) < 1e-12


class TestVariableWidthHistogram:
    @pytest.mark.parametrize("buckets", [1, 3, 7])
    def test_equal_population_spec(self, spark, corpus, buckets):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        query = "machine learning data science"
        m = _matched(oracle, query)
        ordered = sorted((oracle.doclen[d], d) for d in m)
        n = len(ordered)
        base, extra = divmod(n, buckets)
        expected, i = [], 0
        for bkt in range(buckets):
            size = base + (1 if bkt < extra else 0)
            if size == 0:
                continue
            chunk = [v for v, _ in ordered[i : i + size]]
            expected.append(
                (
                    sum(chunk) / len(chunk),
                    min(chunk),
                    max(chunk),
                    len(chunk),
                )
            )
            i += size
        rows = idx.facet_variable_width_histogram(
            query, "doclen", buckets
        ).collect()
        assert len(rows) == len(expected)
        for row, (key, lo, hi, cnt) in zip(rows, expected):
            assert abs(row["key"] - key) < 1e-9
            assert row["min"] == lo
            assert row["max"] == hi
            assert row["doc_count"] == cnt

    def test_corpus_sized_foreground_avoids_global_window(self, spark, corpus):
        """VERDICT r2: the exact/approx strategy switch is gated on a
        MEASURED match count, not caller foreknowledge.  Above
        vwh_exact_max the plan must contain NO window at all (the
        percentile-edge path) and still partition the matches into
        ordered, non-overlapping, complete buckets."""
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        idx.vwh_exact_max = 0  # force every foreground onto the scale path
        query = "machine learning data science"
        n = len(_matched(oracle, query))
        df = idx.facet_variable_width_histogram(query, "doclen", 4)
        # the facet materializes its bucket-sized result eagerly (the
        # persist/unpersist lifecycle), so the computing plan is pinned
        # via the recorded _last_vwh_plan, not the returned local frame
        assert "Window" not in idx._last_vwh_plan
        rows = df.collect()
        assert 1 <= len(rows) <= 4
        assert sum(r["doc_count"] for r in rows) == n
        for a, b in zip(rows, rows[1:]):
            assert a["min"] <= a["max"] < b["min"] <= b["max"]
        # near-equal population: percentile_approx is exact below its
        # accuracy budget, so only ties may unbalance buckets
        assert max(r["doc_count"] for r in rows) <= n  # sanity
        assert rows == sorted(rows, key=lambda r: r["min"])


class TestNormalizeAndMovingPercentiles:
    """ES normalize (whole-bucket-list rescale) and moving_percentiles
    (trailing-window exact percentile) pipeline aggs vs Python
    recomputation, plus the DSL lowering."""

    @pytest.fixture()
    def base(self, spark, corpus):
        paths, _, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        df = idx.facet_histogram(QUERIES[0], "doclen", 32.0)
        return idx, df, [r["doc_count"] for r in df.collect()]

    def test_normalize_methods(self, base):
        import math

        idx, df, counts = base
        mn, mx, tot = min(counts), max(counts), sum(counts)
        mean = tot / len(counts)
        sd = (sum((c - mean) ** 2 for c in counts) / len(counts)) ** 0.5
        sm = sum(math.exp(c) for c in counts)
        want = {
            "rescale_0_1": [(c - mn) / (mx - mn) for c in counts],
            "rescale_0_100": [(c - mn) / (mx - mn) * 100 for c in counts],
            "percent_of_sum": [c / tot for c in counts],
            "mean": [(c - mean) / (mx - mn) for c in counts],
            "z-score": [(c - mean) / sd for c in counts],
            "softmax": [math.exp(c) / sm for c in counts],
        }
        assert mx > mn  # the fixture must exercise a non-degenerate list
        for method, exp in want.items():
            out = idx.bucket_pipeline(
                df, "doc_count", normalize=("nv", method)
            ).collect()
            for r, e in zip(out, exp):
                assert abs(r["nv"] - e) < 1e-9, method
        with pytest.raises(ValueError):
            idx.bucket_pipeline(df, "doc_count", normalize=("nv", "nope"))

    def test_normalize_degenerate_is_null(self, spark, base):
        idx, df, _ = base
        one = df.limit(1)
        out = idx.bucket_pipeline(
            one, "doc_count", normalize=("nv", "rescale_0_1")
        ).collect()
        assert out[0]["nv"] is None

    def test_moving_percentiles(self, base):
        import numpy as np

        idx, df, counts = base
        for window, pct in [(3, 50.0), (4, 90.0), (2, 0.0)]:
            out = idx.bucket_pipeline(
                df, "doc_count", moving_percentiles=("mp", window, pct)
            ).collect()
            for i, r in enumerate(out):
                w = counts[max(0, i - window + 1): i + 1]
                assert abs(r["mp"] - float(np.percentile(w, pct))) < 1e-9
        with pytest.raises(ValueError):
            idx.bucket_pipeline(
                df, "doc_count", moving_percentiles=("mp", 0, 50.0)
            )
        with pytest.raises(ValueError):
            idx.bucket_pipeline(
                df, "doc_count", moving_percentiles=("mp", 3, 101.0)
            )

    def test_dsl_lowering(self, spark, base):
        from search_engine_spark.query.dsl import execute_es_aggs

        idx, _, _ = base
        body = {
            "query": {"match": {"content": QUERIES[0]}},
            "aggs": {"h": {
                "histogram": {"field": "doclen", "interval": 32},
                "aggs": {
                    "pct": {"normalize": {"buckets_path": "_count",
                                          "method": "percent_of_sum"}},
                    "mp": {"moving_percentiles": {
                        "buckets_path": "_count", "window": 3,
                        "percent": 50.0}},
                },
            }},
        }
        import numpy as np

        rows_ = execute_es_aggs(idx, body)["h"].collect()
        assert rows_
        counts = [r["doc_count"] for r in rows_]
        tot = sum(counts)
        for i, r in enumerate(rows_):
            assert abs(r["pct"] - counts[i] / tot) < 1e-9
            w = counts[max(0, i - 2): i + 1]
            assert abs(r["mp"] - float(np.percentile(w, 50.0))) < 1e-9


class TestCollapseInnerHits:
    """ES collapse inner_hits: each representative carries its group's
    top-N matches in group rank order, from the same window pass."""

    def test_inner_hits_match_python(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        size = 3
        rows = idx.search_collapse(
            q, "domain", k=5, join_docs=False, inner_hits_size=size
        ).collect()
        assert rows
        terms = [
            t for t in set(tokenize_py(q)) if oracle.df.get(t, 0) > 0
        ]
        groups = {}
        for d in _matched(oracle, q):
            groups.setdefault(domain_by_doc[d], []).append(
                (d, oracle.score(d, terms))
            )
        for r in rows:
            want = sorted(
                groups[r["value"]], key=lambda x: (-x[1], x[0])
            )[:size]
            got = [(h["doc_id"], h["score"]) for h in r["inner_hits"]]
            assert [g[0] for g in got] == [w[0] for w in want], r["value"]
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9
            # the representative is its group's first inner hit
            assert got[0][0] == r["doc_id"]

    def test_dsl_inner_hits(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {
            "query": {"match": {"content": QUERIES[0]}},
            "collapse": {"field": "domain",
                         "inner_hits": {"size": 2}},
            "size": 4,
        }
        rows = execute_es_query(idx, body, join_docs=False).collect()
        assert rows and all(
            1 <= len(r["inner_hits"]) <= 2 for r in rows
        )


class TestCompositeSources:
    """Composite agg histogram / date_histogram sources: numeric keys
    keep natural order (string-cast would sort '128' before '64') and
    the after cursor stays typed."""

    def test_histogram_source_pages_numerically(self, spark, corpus):
        paths, oracle, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        interval = 64.0
        want = {}
        for d in _matched(oracle, q):
            key = (oracle.doclen[d] // 64) * 64.0
            want[key] = want.get(key, 0) + 1
        ordered = sorted(want.items())
        src = [{"histogram": {"field": "doclen", "interval": interval}}]
        page1 = idx.facet_composite(q, src, size=3).collect()
        assert [(r["k0"], r["doc_count"]) for r in page1] == ordered[:3]
        # typed after cursor resumes mid-list
        after = (page1[-1]["k0"],)
        page2 = idx.facet_composite(q, src, size=3, after=after).collect()
        assert [(r["k0"], r["doc_count"]) for r in page2] == ordered[3:6]
        # paging must cross a numeric boundary a string sort would break
        all_keys = [k for k, _ in ordered]
        assert all_keys == sorted(all_keys)  # numeric order
        assert [str(k) for k in all_keys] != sorted(str(k) for k in all_keys) \
            or len(all_keys) < 3  # corpus-dependent guard

    def test_mixed_date_and_terms_sources(self, spark, corpus):
        paths, oracle, domain_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = QUERIES[0]
        ts_by_doc = {
            r["doc_id"]: r["warc_ts"]
            for r in spark.read.parquet(paths.docs).select(
                "doc_id", "warc_ts"
            ).collect()
        }
        want = {}
        for d in _matched(oracle, q):
            ts = ts_by_doc[d]
            month = ts.replace(day=1, hour=0, minute=0, second=0,
                               microsecond=0)
            key = (month.strftime("%Y-%m-%d %H:%M:%S"), domain_by_doc[d])
            want[key] = want.get(key, 0) + 1
        ordered = sorted(want.items())
        src = [
            {"date_histogram": {"field": "warc_ts",
                                "calendar_interval": "month"}},
            {"terms": {"field": "domain"}},
        ]
        rows = idx.facet_composite(q, src, size=100).collect()
        assert [((r["k0"], r["k1"]), r["doc_count"]) for r in rows] == \
            ordered[:100]

    def test_dsl_lowering_and_refusals(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_aggs

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {
            "query": {"match": {"content": QUERIES[0]}},
            "aggs": {"c": {"composite": {
                "size": 4,
                "sources": [
                    {"dl": {"histogram": {"field": "doclen",
                                          "interval": 64}}},
                ],
            }}},
        }
        rows = execute_es_aggs(idx, body)["c"].collect()
        direct = idx.facet_composite(
            QUERIES[0],
            [{"histogram": {"field": "doclen", "interval": 64}}],
            size=4,
        ).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in direct]
        with pytest.raises(ValueError):
            idx.facet_composite(
                QUERIES[0],
                [{"histogram": {"field": "doclen", "interval": 0}}],
            )
        with pytest.raises(NotImplementedError):
            idx.facet_composite(
                QUERIES[0], [{"geotile_grid": {"field": "x"}}]
            )


class TestFieldCaps:
    def test_field_caps_shape(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        caps = idx.field_caps()
        assert caps["content"] == {
            "type": "text", "searchable": True, "aggregatable": False,
        }
        assert caps["domain"]["type"] == "keyword"
        assert caps["doclen"]["type"] == "long"
        assert caps["warc_ts"]["type"] == "date"
        assert caps["doclen"]["aggregatable"]
        # this fixture has no field postings -> no analyzed title
        assert caps["title"]["type"] == "keyword"


class TestCollapseInnerHitsDefault:
    def test_empty_inner_hits_object_means_default_size(self, spark,
                                                        corpus):
        """{"inner_hits": {}} is a valid ES request for the default
        page (size 3) — only ABSENCE disables inner hits."""
        from search_engine_spark.query.dsl import execute_es_query

        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"query": {"match": {"content": QUERIES[0]}},
                "collapse": {"field": "domain", "inner_hits": {}},
                "size": 3}
        rows = execute_es_query(idx, body, join_docs=False).collect()
        assert rows and all(
            1 <= len(r["inner_hits"]) <= 3 for r in rows
        )
        none = {"query": {"match": {"content": QUERIES[0]}},
                "collapse": {"field": "domain"}, "size": 3}
        rows2 = execute_es_query(idx, none, join_docs=False).collect()
        assert rows2 and "inner_hits" not in rows2[0].asDict()
