"""Filter-context search, terms-aggregation facets, and more-like-this
vs the pure-Python oracle.

The reference delegates these ES query shapes to Elasticsearch (bool
`filter` clauses, `terms` aggregations, `more_like_this` — all part of
the ES surface behind backend/search_api/main.py:162-189); here they
run through the posting-block engine and are pinned rank-/count-
identical to BM25Oracle ground truth, including blockmax == exhaustive
under a filter and the selective-collect vs broad-semi-join parity.
"""

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
    "database transaction",
    "fox database python",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fidx"))
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
    text_by_doc = {id_by_url[r["url"]]: r["text"] for r in texts}
    return paths, oracle, domain_by_doc, text_by_doc


def _collect(df):
    return [
        (r["doc_id"], r["score"])
        for r in df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
    ]


def _assert_rank_identical(got, want, ctx=""):
    assert [d for d, _ in got] == [d for d, _ in want], ctx
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, ctx


FILTER_DOMAIN = "example.com"


class TestFiltered:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        allowed = {
            d for d, dom in domain_by_doc.items() if dom == FILTER_DOMAIN
        }
        got = _collect(
            idx.search_filtered(
                query, f"domain = '{FILTER_DOMAIN}'", k=10, join_docs=False
            )
        )
        want = oracle.topk_filtered(query, allowed, k=10)
        _assert_rank_identical(got, want, query)

    @pytest.mark.parametrize("query", QUERIES[:3])
    def test_blockmax_equals_exhaustive(self, spark, corpus, query):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        pred = f"domain = '{FILTER_DOMAIN}'"
        a = _collect(
            idx.search_filtered(query, pred, k=10, join_docs=False)
        )
        b = _collect(
            idx.search_filtered(
                query, pred, k=10, mode="exhaustive", join_docs=False
            )
        )
        _assert_rank_identical(a, b, query)

    @pytest.mark.parametrize("query", QUERIES[:3])
    def test_broad_path_parity(self, spark, corpus, query):
        # force the broad-filter strategy (semi-join, θ-seeding off) —
        # must return exactly what the selective collect path returns
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        pred = f"domain = '{FILTER_DOMAIN}'"
        selective = _collect(
            idx.search_filtered(query, pred, k=10, join_docs=False)
        )
        idx.filter_collect_max = 0
        broad = _collect(
            idx.search_filtered(query, pred, k=10, join_docs=False)
        )
        _assert_rank_identical(broad, selective, query)

    def test_column_predicate_and_join_docs(self, spark, corpus):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        got = idx.search_filtered(
            "python programming", F.col("domain") == FILTER_DOMAIN, k=5
        ).collect()
        assert 0 < len(got) <= 5
        assert all(FILTER_DOMAIN in r["url"] for r in got)

    def test_empty_filter(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root)
        assert (
            idx.search_filtered(
                "python", "domain = 'nope.invalid'", k=10, join_docs=False
            ).count()
            == 0
        )

    def test_and_mode_filtered(self, spark, corpus):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        allowed = {
            d for d, dom in domain_by_doc.items() if dom == FILTER_DOMAIN
        }
        query = "python programming"
        got = _collect(
            idx.search_filtered(
                query, f"domain = '{FILTER_DOMAIN}'", k=10,
                mode="and", join_docs=False,
            )
        )
        want = [
            (d, s) for d, s in oracle.topk_and(query, k=N_PAGES)
            if d in allowed
        ][:10]
        _assert_rank_identical(got, want, query)


class TestFacets:
    @pytest.mark.parametrize("query", QUERIES)
    def test_or_matches_oracle(self, spark, corpus, query):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        got = [
            (r["value"], r["doc_count"])
            for r in idx.facet_counts(query, "domain", size=10).collect()
        ]
        assert got == oracle.facets(query, domain_by_doc, size=10), query

    def test_and_mode(self, spark, corpus):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        query = "python programming"
        got = [
            (r["value"], r["doc_count"])
            for r in idx.facet_counts(
                query, "domain", size=10, mode="and"
            ).collect()
        ]
        assert got == oracle.facets(query, domain_by_doc, size=10, mode="and")

    def test_size_limits_buckets(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root)
        assert idx.facet_counts("python", "domain", size=2).count() <= 2

    def test_with_filter_predicate(self, spark, corpus):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        query = "quick brown fox"
        got = [
            (r["value"], r["doc_count"])
            for r in idx.facet_counts(
                query, "domain", size=10,
                predicate=f"domain = '{FILTER_DOMAIN}'",
            ).collect()
        ]
        want = [
            (v, c)
            for v, c in oracle.facets(query, domain_by_doc, size=10)
            if v == FILTER_DOMAIN
        ]
        assert got == want

    def test_expression_field_date_histogram(self, spark, corpus):
        # ES date_histogram shape: the facet field is a derived time
        # bucket expression over the docs table
        paths, oracle, _, _ = corpus
        idx = BM25Index(spark, paths.root)
        rows = spark.read.parquet(paths.docs).select(
            "doc_id", "warc_ts"
        ).collect()
        month_by_doc = {
            r["doc_id"]: r["warc_ts"].strftime("%Y-%m") for r in rows
        }
        query = "python programming"
        got = [
            (r["value"], r["doc_count"])
            for r in idx.facet_counts(
                query, "date_format(warc_ts, 'yyyy-MM')", size=30
            ).collect()
        ]
        assert got == oracle.facets(query, month_by_doc, size=30)

    def test_unknown_terms_empty(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root)
        assert idx.facet_counts("zzzznotaterm", "domain").count() == 0


class TestMinShouldMatch:
    @pytest.mark.parametrize("n", [2, 3])
    def test_matches_oracle(self, spark, corpus, n):
        paths, oracle, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        query = "python programming tutorial"
        got = _collect(
            idx.search(query, k=10, join_docs=False, min_should_match=n)
        )
        want = oracle.topk_msm(query, n, k=10)
        _assert_rank_identical(got, want, f"msm={n}")

    def test_msm_equals_and_at_full_count(self, spark, corpus):
        paths, oracle, *_ = corpus
        idx = BM25Index(spark, paths.root)
        query = "python programming"
        msm = _collect(
            idx.search(query, k=10, join_docs=False, min_should_match=2)
        )
        and_mode = _collect(
            idx.search(query, k=10, join_docs=False, mode="and")
        )
        _assert_rank_identical(msm, and_mode)

    def test_msm_above_term_count_empty(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root)
        assert (
            idx.search(
                "python programming", k=10, join_docs=False,
                min_should_match=5,
            ).count()
            == 0
        )

    def test_count_matches_with_predicate(self, spark, corpus):
        paths, oracle, domain_by_doc, _ = corpus
        idx = BM25Index(spark, paths.root)
        query = "quick brown fox"
        total = idx.count_matches(query)
        filtered = idx.count_matches(
            query, predicate=f"domain = '{FILTER_DOMAIN}'"
        )
        facet = dict(oracle.facets(query, domain_by_doc, size=100))
        assert filtered == facet.get(FILTER_DOMAIN, 0)
        assert 0 < filtered < total


class TestMoreLikeThis:
    @pytest.mark.parametrize("src_doc", [0, 7, 42])
    def test_matches_oracle(self, spark, corpus, src_doc):
        paths, oracle, _, text_by_doc = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        like = text_by_doc[src_doc]
        got = _collect(
            idx.more_like_this(
                like, k=10, min_term_freq=1, min_doc_freq=2,
                join_docs=False,
            )
        )
        want = oracle.topk_mlt(like, k=10, min_term_freq=1, min_doc_freq=2)
        _assert_rank_identical(got, want, f"doc {src_doc}")

    def test_exclude_source(self, spark, corpus):
        paths, oracle, _, text_by_doc = corpus
        idx = BM25Index(spark, paths.root)
        like = text_by_doc[7]
        got = _collect(
            idx.more_like_this(
                like, k=10, min_term_freq=1, min_doc_freq=2,
                join_docs=False, exclude_doc_id=7,
            )
        )
        want = oracle.topk_mlt(
            like, k=10, min_term_freq=1, min_doc_freq=2, exclude_doc_id=7
        )
        _assert_rank_identical(got, want)
        assert all(d != 7 for d, _ in got)

    def test_no_selectable_terms_empty(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root)
        # every input term below min_term_freq / unknown -> empty
        assert (
            idx.more_like_this(
                "zzzznotaterm qqqqnotaterm", k=10, join_docs=False
            ).count()
            == 0
        )

    def test_term_gates_respected(self, spark, corpus):
        # min_doc_freq high enough to exclude everything -> empty
        paths, oracle, _, text_by_doc = corpus
        idx = BM25Index(spark, paths.root)
        assert (
            idx.more_like_this(
                text_by_doc[0], k=10, min_term_freq=1,
                min_doc_freq=N_PAGES + 1, join_docs=False,
            ).count()
            == 0
        )
