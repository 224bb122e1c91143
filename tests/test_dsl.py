"""ES Query-DSL interpreter (query/dsl.py) — lowering equivalence.

Each engine method is rank-identity-pinned against pure-Python oracles
in its own suite; here we pin that `execute_es_query` lowers every
supported ES request-body shape onto EXACTLY the equivalent engine
call — including the reference's actual /search body
(backend/search_api/main.py:162-189) — and refuses unsupported shapes
loudly instead of answering wrong.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_query
from search_engine_spark.synth import synth_pages

N_PAGES = 300


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dsl_idx"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    build_index(
        spark, pages, root, num_buckets=16, block_size=32,
        num_partitions=8, index_fields=True, index_positions=True,
        index_shingles=True,
    )
    return BM25Index(spark, root, seed_min_df=0)


def rows(df):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
    ]


class TestReferenceBody:
    def test_flagship_search_body(self, idx):
        """The EXACT query shape the reference sends to ES
        (main.py:162-189): multi_match best_fields over
        title^3/description^2/content, from/size, _source."""
        body = {
            "query": {
                "multi_match": {
                    "query": "python tutorial",
                    "fields": ["title^3", "description^2", "content"],
                    "type": "best_fields",
                }
            },
            "from": 0,
            "size": 10,
            "_source": ["url", "title"],
        }
        got = execute_es_query(idx, body)
        want = idx.search_fields(
            "python tutorial", k=10,
            boosts={"title": 3.0, "description": 2.0, "content": 1.0},
        )
        assert rows(got) == rows(want)
        assert set(got.columns) <= {"doc_id", "score", "url", "title"}

    def test_pagination_page2(self, idx):
        q = "python programming tutorial"
        body = {"query": {"match": {"content": q}}, "from": 5, "size": 5}
        got = rows(execute_es_query(idx, body, join_docs=False))
        full = rows(idx.search(q, k=10, join_docs=False))
        assert got == full[5:10]


class TestLeafLowering:
    def test_match_or(self, idx):
        q = "quick brown fox"
        got = rows(execute_es_query(
            idx, {"query": {"match": {"content": q}}}, join_docs=False))
        assert got == rows(idx.search(q, k=10, join_docs=False))

    def test_match_and(self, idx):
        q = "python database"
        body = {"query": {"match": {"content": {
            "query": q, "operator": "and"}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        assert got == rows(idx.search(q, k=10, mode="and", join_docs=False))

    def test_match_msm(self, idx):
        q = "python database fox"
        body = {"query": {"match": {"content": {
            "query": q, "minimum_should_match": 2}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        assert got == rows(
            idx.search(q, k=10, min_should_match=2, join_docs=False))

    def test_match_on_title_field(self, idx):
        body = {"query": {"match": {"title": "page"}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        assert got == rows(idx.search_fields(
            "page", k=10, boosts={"title": 1.0}, join_docs=False))

    def test_match_phrase_and_slop(self, idx):
        body = {"query": {"match_phrase": {"content": "machine learning"}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        assert got == rows(
            idx.search_phrase("machine learning", k=10, join_docs=False))
        body = {"query": {"match_phrase": {"content": {
            "query": "machine learning", "slop": 2}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        assert got == rows(idx.search_phrase(
            "machine learning", k=10, slop=2, join_docs=False))

    def test_multi_match_types(self, idx):
        q = "python tutorial"
        fields = ["title^3", "description^2", "content"]
        boosts = {"title": 3.0, "description": 2.0, "content": 1.0}
        for qtype, want in [
            ("best_fields",
             idx.search_fields(q, k=10, boosts=boosts, join_docs=False)),
            ("most_fields",
             idx.search_fields(q, k=10, boosts=boosts, tie_breaker=1.0,
                               mode="exhaustive", join_docs=False)),
            ("cross_fields",
             idx.search_cross_fields(q, k=10, boosts=boosts,
                                     join_docs=False)),
        ]:
            body = {"query": {"multi_match": {
                "query": q, "fields": fields, "type": qtype}}}
            got = rows(execute_es_query(idx, body, join_docs=False))
            assert got == rows(want), qtype

    def test_rewrite_queries(self, idx):
        cases = [
            ({"prefix": {"content": {"value": "mach"}}},
             idx.search_prefix("mach", k=10, join_docs=False)),
            ({"wildcard": {"content": {"value": "ma*ine"}}},
             idx.search_wildcard("ma*ine", k=10, join_docs=False)),
            ({"fuzzy": {"content": {"value": "machne",
                                    "fuzziness": "AUTO"}}},
             idx.search_fuzzy("machne", k=10, max_edits=2, join_docs=False)),
        ]
        for node, want in cases:
            got = rows(execute_es_query(idx, {"query": node},
                                        join_docs=False))
            assert got == rows(want), node

    def test_more_like_this(self, idx):
        like = ("python tutorial with code examples about loops and "
                "functions in python for beginners learning python")
        body = {"query": {"more_like_this": {
            "like": like, "min_term_freq": 1, "min_doc_freq": 2,
            "max_query_terms": 8}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.more_like_this(
            like, k=10, min_term_freq=1, min_doc_freq=2,
            max_query_terms=8, join_docs=False))
        assert got == want


class TestBoolLowering:
    def test_query_plus_filter(self, idx):
        body = {"query": {"bool": {
            "must": [{"match": {"content": "python tutorial"}}],
            "filter": [{"term": {"domain": "example.com"}}],
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_filtered(
            "python tutorial", "domain = 'example.com'", k=10,
            join_docs=False))
        assert got == want

    def test_filter_range_and_terms(self, idx):
        body = {"query": {"bool": {
            "must": [{"match": {"content": "python"}}],
            "filter": [
                {"range": {"doclen": {"gte": 30, "lt": 200}}},
                {"terms": {"domain": ["example.com", "news.site.com"]}},
            ],
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_filtered(
            "python",
            "doclen >= 30 and doclen < 200 and "
            "domain in ('example.com', 'news.site.com')",
            k=10, join_docs=False))
        assert got == want

    def test_must_not_terms(self, idx):
        body = {"query": {"bool": {
            "must": [{"match": {"content": "python tutorial"}}],
            "must_not": [{"match": {"content": "database"}}],
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            "python tutorial NOT database", k=10, join_docs=False))
        assert got == want

    def test_phrase_composition_with_negated_phrase(self, idx):
        body = {"query": {"bool": {
            "must": [
                {"match": {"content": "python"}},
                {"match_phrase": {"content": "machine learning"}},
            ],
            "must_not": [{"match_phrase": {"content": "quick brown"}}],
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        # ES bool.must REQUIRES the match clause too (a phrase-only doc
        # without 'python' is excluded) — for a single-term match the
        # required->=1 semantics equal the AND grammar form.  The bare
        # boolean-string grammar ('python "machine learning"') keeps
        # bare terms optional, so it is NOT the ES-equivalent here.
        want = rows(idx.search_boolean(
            'python AND "machine learning" NOT "quick brown"', k=10,
            join_docs=False))
        assert got == want
        # and every hit really holds the must term
        hit_ids = [d for d, _ in got]
        assert hit_ids, "expected hits matching both clauses"
        with_term = {
            r["doc_id"]
            for r in idx.search("python", k=1000, join_docs=False)
            .collect()
        }
        assert set(hit_ids) <= with_term

    def test_should_with_msm(self, idx):
        body = {"query": {"bool": {
            "should": [
                {"match": {"content": "python"}},
                {"match": {"content": "database"}},
                {"match": {"content": "fox"}},
            ],
            "minimum_should_match": 2,
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search(
            "python database fox", k=10, min_should_match=2,
            join_docs=False))
        assert got == want


class TestRefusals:
    @pytest.mark.parametrize(
        "body",
        [
            {"query": {"span_near": {"clauses": []}}},
            {"query": {"knn": {"field": "v"}}},
            {"query": {"bool": {
                "must": [{"match": {"content": "a b"}},
                         {"match": {"content": "c d"}}]}}},
            {"query": {"function_score": {}}},
            {"query": {"match": {"nosuchfield": "x"}}},
        ],
    )
    def test_unsupported_shapes_raise(self, idx, body):
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, body)


class TestAggsLowering:
    """execute_es_aggs lowers the request body's aggs section onto the
    facet methods — each pinned to its oracle in test_aggs.py."""

    Q = {"query": {"match": {"content": "python tutorial"}}}

    def test_terms_stats_histogram(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {
            "by_domain": {"terms": {"field": "domain", "size": 5}},
            "len_stats": {"stats": {"field": "doclen"}},
            "len_hist": {"histogram": {"field": "doclen", "interval": 25}},
        }}
        out = execute_es_aggs(idx, body)
        assert [tuple(r) for r in out["by_domain"].collect()] == [
            tuple(r)
            for r in idx.facet_counts("python tutorial", "domain", size=5).collect()
        ]
        assert [tuple(r) for r in out["len_stats"].collect()] == [
            tuple(r)
            for r in idx.facet_stats("python tutorial", "doclen").collect()
        ]
        assert [tuple(r) for r in out["len_hist"].collect()] == [
            tuple(r)
            for r in idx.facet_histogram("python tutorial", "doclen", 25).collect()
        ]

    def test_range_cardinality_percentiles(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {
            "len_range": {"range": {"field": "doclen", "ranges": [
                {"to": 50.0}, {"from": 50.0, "to": 150.0}, {"from": 150.0},
            ]}},
            "n_domains": {"cardinality": {"field": "domain"}},
            "len_pct": {"percentiles": {"field": "doclen",
                                        "percents": [50.0, 95.0]}},
        }}
        out = execute_es_aggs(idx, body)
        assert [tuple(r) for r in out["len_range"].collect()] == [
            tuple(r) for r in idx.facet_range(
                "python tutorial", "doclen",
                [(None, 50.0), (50.0, 150.0), (150.0, None)]).collect()
        ]
        assert out["n_domains"] == idx.facet_cardinality(
            "python tutorial", "domain")
        assert [tuple(r) for r in out["len_pct"].collect()] == [
            tuple(r) for r in idx.facet_percentiles(
                "python tutorial", "doclen", [50.0, 95.0]).collect()
        ]

    def test_significant_composite_tophits(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {
            "sig": {"significant_terms": {"field": "content", "size": 5,
                                          "min_doc_count": 2}},
            "pages": {"composite": {
                "size": 5,
                "sources": [{"dom": {"terms": {"field": "domain"}}}],
            }},
            "best_per_domain": {
                "terms": {"field": "domain", "size": 3},
                "aggs": {"top": {"top_hits": {"size": 2}}},
            },
        }}
        out = execute_es_aggs(idx, body)
        assert [tuple(r) for r in out["sig"].collect()] == [
            tuple(r) for r in idx.significant_terms(
                "python tutorial", size=5, min_doc_count=2).collect()
        ]
        assert [tuple(r) for r in out["pages"].collect()] == [
            tuple(r) for r in idx.facet_composite(
                "python tutorial", ["domain"], size=5).collect()
        ]
        assert [tuple(r) for r in out["best_per_domain"].collect()] == [
            tuple(r) for r in idx.facet_top_hits(
                "python tutorial", "domain", size=3,
                hits_per_bucket=2).collect()
        ]

    def test_filter_context_aggs(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"bool": {
                "must": [{"match": {"content": "python"}}],
                "filter": [{"term": {"domain": "example.com"}}],
            }},
            "aggs": {"len_stats": {"stats": {"field": "doclen"}}},
        }
        out = execute_es_aggs(idx, body)
        want = idx.facet_stats(
            "python", "doclen",
            predicate=F.col("domain") == F.lit("example.com"),
        )
        assert [tuple(r) for r in out["len_stats"].collect()] == [
            tuple(r) for r in want.collect()
        ]

    def test_composite_after_dict_cursor(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        p1 = idx.facet_composite("python tutorial", ["domain"], size=2).collect()
        body = {**self.Q, "aggs": {"pages": {"composite": {
            "size": 2,
            "sources": [{"dom": {"terms": {"field": "domain"}}}],
            "after": {"dom": p1[-1]["k0"]},
        }}}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_composite(
            "python tutorial", ["domain"], size=2, after=(p1[-1]["k0"],))
        assert [tuple(r) for r in out["pages"].collect()] == [
            tuple(r) for r in want.collect()
        ]

    def test_unsupported_agg_raises(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, {**self.Q, "aggs": {
                "x": {"geo_distance": {"field": "location"}}}})
        with pytest.raises(NotImplementedError):
            # an interval is required — calendar or fixed
            execute_es_aggs(idx, {**self.Q, "aggs": {
                "x": {"date_histogram": {"field": "warc_ts"}}}})

    def test_date_histogram_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {"by_day": {"date_histogram": {
            "field": "warc_ts", "calendar_interval": "month"}}}}
        out = execute_es_aggs(idx, body)
        want = idx.facet_date_histogram(
            "python tutorial", "warc_ts", "month")
        assert [tuple(r) for r in out["by_day"].collect()] == [
            tuple(r) for r in want.collect()
        ]
        # match_all aggs foregrounds are supported (TestMatchAllAggs);
        # formerly refused here

    def test_date_range_and_auto_date_histogram_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {
            "dr": {"date_range": {"field": "warc_ts", "ranges": [
                {"to": "2021-01-01"}, {"from": "2021-01-01"},
            ]}},
            "auto": {"auto_date_histogram": {"field": "warc_ts",
                                             "buckets": 5}},
        }}
        out = execute_es_aggs(idx, body)
        want = idx.facet_date_range(
            "python tutorial", "warc_ts",
            [(None, "2021-01-01"), ("2021-01-01", None)],
        )
        assert [tuple(r) for r in out["dr"].collect()] == [
            tuple(r) for r in want.collect()
        ]
        wdf, winterval = idx.facet_auto_date_histogram(
            "python tutorial", "warc_ts", buckets=5
        )
        assert out["auto"]["interval"] == winterval
        assert [tuple(r) for r in out["auto"]["buckets"].collect()] == [
            tuple(r) for r in wdf.collect()
        ]

    def test_pipeline_and_sibling_lowering(self, idx):
        """serial_diff / bucket_script / bucket_selector / bucket_sort
        nested under a histogram, plus sibling *_bucket aggs at the
        body level referencing the histogram's buckets."""
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {**self.Q, "aggs": {
            "hist": {
                "histogram": {"field": "doclen", "interval": 25},
                "aggs": {
                    "sd": {"serial_diff": {"buckets_path": "_count",
                                           "lag": 2}},
                    "dbl": {"bucket_script": {
                        "buckets_path": {"c": "_count"},
                        "script": "params.c * 2",
                    }},
                    "keep": {"bucket_selector": {
                        "buckets_path": {"c": "_count"},
                        "script": "params.c >= 2 && params.c >= 1",
                    }},
                    "top": {"bucket_sort": {
                        "sort": [{"_count": {"order": "desc"}},
                                 {"_key": "asc"}],
                        "size": 4,
                    }},
                },
            },
            "avg_daily": {"avg_bucket": {"buckets_path": "hist>_count"}},
            "tot": {"stats_bucket": {"buckets_path": "hist>_count"}},
        }}
        out = execute_es_aggs(idx, body)
        base = idx.facet_histogram("python tutorial", "doclen", 25)
        rows_ = [(r["key"], r["doc_count"]) for r in base.collect()]
        counts = [c for _, c in rows_]
        kept = [
            (k, c) for k, c in rows_ if c >= 2
        ]
        want = sorted(kept, key=lambda kv: (-kv[1], kv[0]))[:4]
        got = out["hist"].collect()
        assert [(r["key"], r["doc_count"]) for r in got] == want
        for r in got:
            assert r["dbl"] == r["doc_count"] * 2
        # sibling aggs aggregate the FULL (pre-pipeline) bucket list?
        # No — ES resolves buckets_path against the named agg as
        # written, i.e. after its own pipelines; ours does the same.
        sib = out["avg_daily"].collect()[0]["value"]
        want_avg = sum(c for _, c in want) / len(want)
        assert abs(sib - want_avg) < 1e-9
        st = out["tot"].collect()[0]
        assert st["count"] == len(want)
        assert st["sum"] == sum(c for _, c in want)
        # validation: bad buckets_path refuses loudly
        import pytest as _pytest
        with _pytest.raises(NotImplementedError):
            execute_es_aggs(idx, {**self.Q, "aggs": {
                "s": {"avg_bucket": {"buckets_path": "nope>_count"}}}})
        with _pytest.raises(NotImplementedError):
            execute_es_aggs(idx, {**self.Q, "aggs": {
                "hist": {"histogram": {"field": "doclen",
                                       "interval": 25},
                         "aggs": {"b": {"bucket_script": {
                             "buckets_path": {"c": "_count"},
                             "script": "params.c + params.missing",
                         }}}}}})


class TestConstantScoreAndIds:
    def test_constant_score(self, idx):
        body = {"query": {"constant_score": {
            "filter": [{"term": {"domain": "example.com"}}],
            "boost": 2.5,
        }}, "size": 50}
        rows_ = execute_es_query(idx, body, join_docs=False).collect()
        want = [
            r["doc_id"]
            for r in idx.docs.filter(F.col("domain") == "example.com")
            .orderBy("doc_id").limit(50).collect()
        ]
        assert [r["doc_id"] for r in rows_] == want
        assert all(r["score"] == 2.5 for r in rows_)

    def test_ids_lookup(self, idx):
        some = [r["doc_id"] for r in idx.docs.limit(3).collect()]
        body = {"query": {"ids": {"values": some + [99999999999]}}}
        rows_ = execute_es_query(idx, body, join_docs=False).collect()
        assert sorted(r["doc_id"] for r in rows_) == sorted(some)
        assert all(r["score"] == 1.0 for r in rows_)


class TestPhrasePrefixLowering:
    def test_match_phrase_prefix(self, idx):
        body = {"query": {"match_phrase_prefix": {"content": {
            "query": "machine lear", "max_expansions": 10}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_phrase_prefix(
            "machine lear", k=10, max_expansions=10, join_docs=False))
        assert got == want
        assert got  # the prefix must actually complete to 'learning'


class TestCompoundLowering:
    def test_dis_max(self, idx):
        body = {"query": {"dis_max": {
            "queries": [
                {"match": {"content": "python programming"}},
                {"match": {"content": "database transaction"}},
            ],
            "tie_breaker": 0.3,
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_dis_max(
            [("match", "python programming", "or"),
             ("match", "database transaction", "or")],
            tie_breaker=0.3, k=10, join_docs=False,
        ))
        assert got == want and got

    def test_dis_max_with_phrase(self, idx):
        body = {"query": {"dis_max": {"queries": [
            {"match": {"content": "search ranking"}},
            {"match_phrase": {"content": "quick brown fox"}},
        ]}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_dis_max(
            [("match", "search ranking", "or"),
             ("phrase", "quick brown fox", 0)],
            k=10, join_docs=False,
        ))
        assert got == want

    def test_boosting(self, idx):
        body = {"query": {"boosting": {
            "positive": {"match": {"content": "python tutorial"}},
            "negative": {"match": {"content": "database"}},
            "negative_boost": 0.2,
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boosting(
            ("match", "python tutorial", "or"),
            ("match", "database", "or"),
            negative_boost=0.2, k=10, join_docs=False,
        ))
        assert got == want and got

    def test_function_score_fvf(self, idx):
        body = {"query": {"function_score": {
            "query": {"match": {"content": "search engine"}},
            "field_value_factor": {"field": "doclen", "factor": 0.1,
                                   "modifier": "log1p"},
            "boost_mode": "multiply",
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_function_score(
            ("match", "search engine", "or"),
            field_value_factor={"field": "doclen", "factor": 0.1,
                                "modifier": "log1p"},
            boost_mode="multiply", k=10, join_docs=False,
        ))
        assert got == want and got

    def test_function_score_filter_weight(self, idx):
        body = {"query": {"function_score": {
            "query": {"match": {"content": "search engine"}},
            "functions": [
                {"filter": {"range": {"doclen": {"gte": 40}}},
                 "weight": 2.0},
            ],
            "boost_mode": "sum", "score_mode": "sum",
        }}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_function_score(
            ("match", "search engine", "or"),
            functions=[{"filter": "doclen >= 40", "weight": 2.0}],
            boost_mode="sum", score_mode="sum", k=10, join_docs=False,
        ))
        assert got == want and got

    def test_regexp(self, idx):
        body = {"query": {"regexp": {"content": {"value": "progr.*"}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_regexp("progr.*", k=10, join_docs=False))
        assert got == want and got

    def test_match_bool_prefix(self, idx):
        body = {"query": {"match_bool_prefix": {"content": {
            "query": "python progr", "max_expansions": 20}}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_bool_prefix(
            "python progr", k=10, max_expansions=20, join_docs=False))
        assert got == want and got

    def test_rescore(self, idx):
        body = {
            "query": {"match": {"content": "quick brown fox jumps"}},
            "rescore": {
                "window_size": 25,
                "query": {
                    "rescore_query": {
                        "match_phrase": {"content": "quick brown fox"}},
                    "query_weight": 0.7,
                    "rescore_query_weight": 1.2,
                },
            },
        }
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_rescore(
            "quick brown fox jumps", ("phrase", "quick brown fox", 0),
            window_size=25, query_weight=0.7, rescore_query_weight=1.2,
            k=10, join_docs=False,
        ))
        assert got == want and got

    def test_refusals(self, idx):
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"dis_max": {"queries": [
                {"prefix": {"content": {"value": "py"}}}]}}})
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match_phrase": {"content": "a b"}},
                "rescore": {"window_size": 5, "query": {
                    "rescore_query": {"match": {"content": "x"}}}},
            })
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"function_score": {
                "query": {"match": {"content": "x"}},
                "functions": [{"script_score": {"script": "1"},
                               "weight": 1.0}],
            }}})


class TestQueryString:
    """query_string / simple_query_string — the search-box syntaxes
    lowered onto search_boolean (the reference's QueryProcessor
    grammar, tfidf.py:589-626, is exactly the supported subset)."""

    def test_query_string_lowers_to_boolean(self, idx):
        q = 'python tutorial NOT database "machine learning"'
        body = {"query": {"query_string": {"query": q}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(q, k=10, join_docs=False))
        assert got == want and got

    def test_query_string_bare_string_form(self, idx):
        body = {"query": {"query_string": "search engine ranking"}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            "search engine ranking", k=10, join_docs=False))
        assert got == want and got

    def test_query_string_default_operator_and(self, idx):
        body = {"query": {"query_string": {
            "query": "python tutorial", "default_operator": "AND"}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            "python AND tutorial", k=10, join_docs=False))
        assert got == want and got

    def test_query_string_force_and_through_phrase_path(self, idx):
        # default_operator=and must key must-mode in the PHRASE branch
        # too (force_and seam, not textual AND injection)
        body = {"query": {"query_string": {
            "query": 'python tutorial "machine learning"',
            "default_operator": "and"}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            'python AND tutorial "machine learning"', k=10,
            join_docs=False))
        assert got == want

    def test_query_string_specials_inside_quotes_ok(self, idx):
        # quoted content is literal text in Lucene query_string; the
        # canonical tokenizer strips the punctuation
        q = '"machine learning: models" python'
        got = rows(execute_es_query(
            idx, {"query": {"query_string": {"query": q}}},
            join_docs=False))
        want = rows(idx.search_boolean(q, k=10, join_docs=False))
        assert got == want

    @pytest.mark.parametrize("q", [
        "title:python", "pyth*", "fuzzy~2", "(a AND b) OR c",
        "boost^2", "a && b", "foo -bar", "+foo bar", "a /re/ b",
    ])
    def test_query_string_refuses_lucene_syntax(self, idx, q):
        with pytest.raises(NotImplementedError):
            execute_es_query(
                idx, {"query": {"query_string": {"query": q}}})

    def test_simple_query_string_or_not_phrase(self, idx):
        body = {"query": {"simple_query_string": {
            "query": '-database python | tutorial "machine learning"'}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            'python tutorial "machine learning" NOT database', k=10,
            join_docs=False))
        assert got == want and got

    def test_simple_query_string_plus_is_and(self, idx):
        got = rows(execute_es_query(idx, {"query": {
            "simple_query_string": {"query": "python + tutorial"}}},
            join_docs=False))
        want = rows(idx.search_boolean(
            "python AND tutorial", k=10, join_docs=False))
        assert got == want and got

    def test_simple_query_string_attached_plus(self, idx):
        # ES sqs '+' is an infix operator char, whitespace-optional
        got = rows(execute_es_query(idx, {"query": {
            "simple_query_string": {"query": "python+tutorial"}}},
            join_docs=False))
        want = rows(idx.search_boolean(
            "python AND tutorial", k=10, join_docs=False))
        assert got == want

    def test_simple_query_string_negated_phrase(self, idx):
        body = {"query": {"simple_query_string": {
            "query": 'python -"quick brown"'}}}
        got = rows(execute_es_query(idx, body, join_docs=False))
        want = rows(idx.search_boolean(
            'python NOT "quick brown"', k=10, join_docs=False))
        assert got == want

    def test_simple_query_string_default_operator_and(self, idx):
        got = rows(execute_es_query(idx, {"query": {
            "simple_query_string": {"query": "python tutorial",
                                    "default_operator": "and"}}},
            join_docs=False))
        want = rows(idx.search_boolean(
            "python AND tutorial", k=10, join_docs=False))
        assert got == want

    @pytest.mark.parametrize("q", [
        "(a b)", "pyth*", "fuzz~1", "a + b | c", "a - b",
    ])
    def test_simple_query_string_refusals(self, idx, q):
        with pytest.raises(NotImplementedError):
            execute_es_query(
                idx, {"query": {"simple_query_string": {"query": q}}})

    def test_simple_query_string_fields_refusal(self, idx):
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"simple_query_string": {
                "query": "python", "fields": ["title"]}}})


class TestHighlight:
    """Body-level `highlight` section: highlight_<field> columns with
    the serving layer's <mark> semantics, custom tags, fragments for
    content (needs pages=), composition with sort, loud refusals."""

    def _manual(self, text, terms, pre="<mark>", post="</mark>"):
        import re as _re
        from search_engine_spark.query.serving import _terms_pattern
        if text is None:
            text = ""
        return _re.sub(
            _terms_pattern(terms).replace("(?i)", ""),
            lambda m: f"{pre}{m.group(1)}{post}",
            text,
            flags=_re.IGNORECASE,
        )

    def test_title_description_highlight(self, idx):
        body = {
            "query": {"match": {"content": "python tutorial"}},
            "size": 10,
            "highlight": {"fields": {"title": {}, "description": {}}},
        }
        rows_ = execute_es_query(idx, body).collect()
        assert rows_
        terms = ["python", "tutorial"]
        for r in rows_:
            assert r["highlight_title"] == self._manual(r["title"], terms)

    def test_custom_tags(self, idx):
        body = {
            "query": {"match": {"content": "python"}},
            "size": 5,
            "highlight": {
                "fields": {"title": {}},
                "pre_tags": ["<em>"],
                "post_tags": ["</em>"],
            },
        }
        rows_ = execute_es_query(idx, body).collect()
        for r in rows_:
            assert r["highlight_title"] == self._manual(
                r["title"], ["python"], "<em>", "</em>"
            )

    def test_query_string_operators_not_highlighted(self, idx):
        body = {
            "query": {"query_string": {"query": "python AND tutorial"}},
            "size": 5,
            "highlight": {"fields": {"title": {}}},
        }
        rows_ = execute_es_query(idx, body).collect()
        for r in rows_:
            assert "<mark>and</mark>" not in (r["highlight_title"] or "")
            assert r["highlight_title"] == self._manual(
                r["title"], ["python", "tutorial"]
            )

    def test_content_fragment_needs_pages(self, idx, spark):
        body = {
            "query": {"match": {"content": "python tutorial"}},
            "size": 5,
            "highlight": {"fields": {"content": {"fragment_size": 120}}},
        }
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, body)
        pages = synth_pages(spark, N_PAGES, num_partitions=4)
        got = execute_es_query(idx, body, pages=pages).collect()
        assert got
        texts = {
            r["url"]: r["text"]
            for r in pages.select("url", "text").collect()
        }
        for r in got:
            text = texts[r["url"]] or ""
            low = text.lower()
            hits = [
                p for p in
                (low.find("python"), low.find("tutorial")) if p >= 0
            ]
            pos = (min(hits) + 1) if hits else 1
            start = max(1, pos - 40)
            frag = text[start - 1:start - 1 + 120]
            assert r["highlight_content"] == self._manual(
                frag, ["python", "tutorial"]
            )

    def test_highlight_with_sort(self, idx):
        body = {
            "query": {"match": {"content": "python tutorial"}},
            "sort": [{"warc_ts": "desc"}],
            "size": 6,
            "highlight": {"fields": {"title": {}}},
        }
        got = execute_es_query(idx, body).collect()
        want = [
            r["doc_id"]
            for r in idx.search_sorted(
                "python tutorial", [("warc_ts", "desc")], k=6
            ).collect()
        ]
        assert [r["doc_id"] for r in got] == want
        assert all("highlight_title" in r.asDict() for r in got)

    def test_refusals(self, idx):
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "python"}},
                "highlight": {"fields": {"domain": {}}},
            })
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "python"}},
                "highlight": {"fields": {"title": {"type": "fvh"}}},
            })
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "python"}},
                "highlight": {"fields": {"title": {}}, "encoder": "html"},
            })


class TestCount:
    """execute_es_count = the ES _count endpoint: exact hits.total of a
    body's query, equal to the engine's count_matches lowering."""

    def test_match_count(self, idx):
        from search_engine_spark.query.dsl import execute_es_count

        body = {"query": {"match": {"content": "search engine"}}}
        assert execute_es_count(idx, body) == idx.count_matches(
            "search engine", mode="or"
        )

    def test_bool_filtered_count(self, idx):
        from search_engine_spark.query.dsl import execute_es_count

        body = {"query": {"bool": {
            "must": [{"match": {"content": {
                "query": "search engine", "operator": "and"}}}],
            "filter": [{"term": {"domain": "example.com"}}],
        }}}
        assert execute_es_count(idx, body) == idx.count_matches(
            "search engine", mode="and",
            predicate=F.col("domain") == "example.com",
        )

    def test_match_all_counts_live_corpus(self, idx):
        from search_engine_spark.query.dsl import execute_es_count

        n = idx.docs.count()  # fresh index: no tombstones
        assert execute_es_count(idx, {}) == n
        assert execute_es_count(idx, {"query": {"match_all": {}}}) == n

    def test_unsupported_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_count

        with pytest.raises(NotImplementedError):
            execute_es_count(idx, {"query": {"dis_max": {"queries": []}}})


class TestTermsMetricSubAggs:
    """terms agg with nested avg/sum/min/max sub-aggs lowers onto
    facet_terms_metrics; top_hits stays on its own path; mixes refuse."""

    def test_metric_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"by_domain": {
                "terms": {"field": "domain", "size": 5},
                "aggs": {"avg_dl": {"avg": {"field": "doclen"}},
                         "max_dl": {"max": {"field": "doclen"}}},
            }},
        }
        got = execute_es_aggs(idx, body)["by_domain"].collect()
        direct = idx.facet_terms_metrics(
            "search engine", "domain",
            {"avg_dl": ("avg", "doclen"), "max_dl": ("max", "doclen")},
            size=5,
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]

    def test_mixed_nested_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"x": {
                "terms": {"field": "domain"},
                "aggs": {"h": {"top_hits": {"size": 2}},
                         "a": {"avg": {"field": "doclen"}}},
            }},
        }
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, body)


class TestBareAndBucketMetricAggs:
    def test_bare_metric_aggs(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"m_avg": {"avg": {"field": "doclen"}},
                     "m_n": {"value_count": {"field": "doclen"}}},
        }
        out = execute_es_aggs(idx, body)
        stats = idx.facet_stats("search engine", "doclen").collect()[0]
        assert out["m_avg"].collect()[0]["value"] == stats["avg"]
        assert out["m_n"].collect()[0]["value"] == stats["count"]

    def test_histogram_nested_metrics(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"h": {
                "histogram": {"field": "doclen", "interval": 64},
                "aggs": {"avg_dl": {"avg": {"field": "doclen"}}},
            }},
        }
        got = execute_es_aggs(idx, body)["h"].collect()
        direct = idx.facet_histogram(
            "search engine", "doclen", 64.0,
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]

    def test_non_metric_nested_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"h": {
                "histogram": {"field": "doclen", "interval": 64},
                "aggs": {"t": {"top_hits": {"size": 2}}},
            }},
        }
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, body)


class TestNestedBucketAggs:
    """terms -> terms|histogram|date_histogram [-> metric leaves]
    lowers onto facet_terms_buckets; a three-deep bucket chain or a
    non-metric leaf refuses."""

    def test_terms_date_histogram_with_metric_leaf(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"by_domain": {
                "terms": {"field": "domain", "size": 4},
                "aggs": {"per_month": {
                    "date_histogram": {"field": "warc_ts",
                                       "calendar_interval": "month"},
                    "aggs": {"avg_dl": {"avg": {"field": "doclen"}}},
                }},
            }},
        }
        got = execute_es_aggs(idx, body)["by_domain"].collect()
        direct = idx.facet_terms_buckets(
            "search engine", "domain",
            ("date_histogram", "warc_ts", "month"), size=4,
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]

    def test_terms_terms_inner_size(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"x": {
                "terms": {"field": "domain", "size": 3},
                "aggs": {"g": {"terms": {
                    "field": "concat('g', pmod(doc_id, 2))", "size": 1
                }}},
            }},
        }
        got = execute_es_aggs(idx, body)["x"].collect()
        direct = idx.facet_terms_buckets(
            "search engine", "domain",
            ("terms", "concat('g', pmod(doc_id, 2))"),
            size=3, inner_size=1,
        ).collect()
        assert got and [r.asDict() for r in got] == [
            r.asDict() for r in direct
        ]

    def test_three_deep_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"x": {
                "terms": {"field": "domain"},
                "aggs": {"g": {
                    "terms": {"field": "domain"},
                    "aggs": {"h": {"terms": {"field": "domain"}}},
                }},
            }},
        }
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, body)


class TestMatchAllAggs:
    """Aggs with no query / match_all / filter-only bool foregrounds —
    the whole-live-corpus shapes ES serves without a scoring query."""

    def test_no_query_terms_agg(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        out = execute_es_aggs(
            idx, {"aggs": {"by_domain": {"terms": {"field": "domain",
                                                   "size": 100}}}}
        )["by_domain"].collect()
        direct = idx.facet_counts(None, "domain", size=100).collect()
        assert [r.asDict() for r in out] == [r.asDict() for r in direct]
        total = sum(r["doc_count"] for r in out)
        assert total == idx.count_matches(None)

    def test_match_all_stats(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        out = execute_es_aggs(
            idx, {"query": {"match_all": {}},
                  "aggs": {"s": {"stats": {"field": "doclen"}}}}
        )["s"].collect()[0]
        direct = idx.facet_stats(None, "doclen").collect()[0]
        assert out.asDict() == direct.asDict()

    def test_filter_only_bool(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs, \
            execute_es_count

        body = {
            "query": {"bool": {"filter": [
                {"term": {"domain": "example.com"}}
            ]}},
            "aggs": {"s": {"stats": {"field": "doclen"}}},
        }
        out = execute_es_aggs(idx, body)["s"].collect()[0]
        direct = idx.facet_stats(
            None, "doclen", predicate="domain = 'example.com'"
        ).collect()[0]
        assert out.asDict() == direct.asDict()
        assert execute_es_count(idx, body) == direct["count"]

    def test_match_all_top_hits(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        out = execute_es_aggs(
            idx, {"aggs": {"t": {
                "terms": {"field": "domain", "size": 2},
                "aggs": {"h": {"top_hits": {"size": 1}}},
            }}}
        )["t"].collect()
        assert out and all(r["score"] == 1.0 for r in out)


class TestFilterFamilyAggs:
    """filter / filters / missing / global agg nodes lower onto
    facet_filter/facet_filters/facet_missing and a match_all re-run."""

    def test_filter_node_with_metric_leaf(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"long_docs": {
                "filter": {"range": {"doclen": {"gte": 100}}},
                "aggs": {"avg_dl": {"avg": {"field": "doclen"}}},
            }},
        }
        got = execute_es_aggs(idx, body)["long_docs"].collect()[0]
        direct = idx.facet_filter(
            "search engine", "doclen >= 100",
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()[0]
        assert got.asDict() == direct.asDict()

    def test_filters_node(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"kinds": {"filters": {"filters": {
                "example": {"term": {"domain": "example.com"}},
                "short": {"range": {"doclen": {"lt": 100}}},
            }}}},
        }
        got = execute_es_aggs(idx, body)["kinds"].collect()
        direct = idx.facet_filters(
            "search engine",
            {"example": "domain = 'example.com'", "short": "doclen < 100"},
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]

    def test_missing_node(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"no_title": {"missing": {"field": "title"}}},
        }
        got = execute_es_aggs(idx, body)["no_title"].collect()[0]
        direct = idx.facet_missing("search engine", "title").collect()[0]
        assert got["doc_count"] == direct["doc_count"]

    def test_global_node(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"everything": {
                "global": {},
                "aggs": {"s": {"stats": {"field": "doclen"}}},
            }},
        }
        got = execute_es_aggs(idx, body)["everything"]["s"].collect()[0]
        direct = idx.facet_stats(None, "doclen").collect()[0]
        assert got.asDict() == direct.asDict()

    def test_global_without_subaggs_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        with pytest.raises(NotImplementedError):
            execute_es_aggs(
                idx,
                {"query": {"match": {"content": "x"}},
                 "aggs": {"g": {"global": {}}}},
            )


class TestSuggestSection:
    """execute_es_suggest lowers the body's suggest section onto
    suggest_terms / suggest_phrase with ES option names."""

    def test_term_suggester(self, idx):
        from search_engine_spark.query.dsl import execute_es_suggest

        body = {"suggest": {"fix": {
            "text": "pythn tutorail",
            "term": {"field": "content", "suggest_mode": "always",
                     "size": 3},
        }}}
        got = execute_es_suggest(idx, body)["fix"].collect()
        direct = idx.suggest_terms(
            "pythn tutorail", size=3, suggest_mode="always"
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]

    def test_phrase_suggester(self, idx):
        from search_engine_spark.query.dsl import execute_es_suggest

        body = {"suggest": {"dym": {
            "text": "pythn programming",
            "phrase": {"size": 4, "max_errors": 1, "confidence": 0.0,
                       "direct_generator": [
                           {"field": "content", "size": 3,
                            "prefix_length": 1}]},
        }}}
        got = execute_es_suggest(idx, body)["dym"].collect()
        direct = idx.suggest_phrase(
            "pythn programming", size=4, max_errors=1, confidence=0.0,
            num_candidates=3, prefix_length=1,
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]
        assert got  # misspelling over corpus vocabulary must suggest

    def test_refusals(self, idx):
        from search_engine_spark.query.dsl import execute_es_suggest

        with pytest.raises(NotImplementedError):
            execute_es_suggest(idx, {"suggest": {"x": {
                "text": "a", "fancy_suggester": {}}}})
        with pytest.raises(NotImplementedError):
            execute_es_suggest(idx, {"suggest": {"x": {
                "term": {"field": "content"}}}})
        with pytest.raises(NotImplementedError):
            execute_es_suggest(idx, {"suggest": {"x": {
                "text": "a", "term": {"field": "title"}}}})


class TestCompletionSection:
    def test_completion_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_suggest

        body = {"suggest": {"ac": {
            "prefix": "pro",
            "completion": {"field": "content", "size": 4},
        }}}
        got = execute_es_suggest(idx, body)["ac"].collect()
        direct = idx.suggest_completion("pro", size=4).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]
        assert got


class TestBareFilterQueries:
    """Bare filter-type top-level queries execute at constant score
    1.0 per match (ES semantics), identical to constant_score boost 1;
    match_all returns the first k live docs by id."""

    def test_bare_range(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        got = execute_es_query(
            idx, {"query": {"range": {"doclen": {"gte": 100}}}, "size": 7},
            join_docs=False,
        ).collect()
        want = execute_es_query(
            idx,
            {"query": {"constant_score": {
                "filter": [{"range": {"doclen": {"gte": 100}}}]}},
             "size": 7},
            join_docs=False,
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
        assert got and all(r["score"] == 1.0 for r in got)

    def test_bare_match_all(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        got = execute_es_query(
            idx, {"query": {"match_all": {}}, "size": 5}, join_docs=False
        ).collect()
        live = sorted(
            r["doc_id"]
            for r in idx._drop_tombstones(idx.docs.select("doc_id")).collect()
        )[:5]
        assert [r["doc_id"] for r in got] == live
        assert all(r["score"] == 1.0 for r in got)

    def test_bare_term(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        got = execute_es_query(
            idx, {"query": {"term": {"domain": "example.com"}}, "size": 4}
        ).collect()
        assert got and all(
            r["url"].startswith("https://example.com/") for r in got
        )


class TestMultiRareTermsAggs:
    def test_multi_terms_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"mt": {"multi_terms": {
                "terms": [{"field": "domain"},
                          {"field": "concat('g', pmod(doc_id, 2))"}],
                "size": 6,
            }}},
        }
        got = execute_es_aggs(idx, body)["mt"].collect()
        direct = idx.facet_multi_terms(
            "search engine", ["domain", "concat('g', pmod(doc_id, 2))"],
            size=6,
        ).collect()
        assert got and [r.asDict() for r in got] == [
            r.asDict() for r in direct
        ]

    def test_rare_terms_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"rare": {"rare_terms": {"field": "doclen",
                                             "max_doc_count": 2}}},
        }
        got = execute_es_aggs(idx, body)["rare"].collect()
        direct = idx.facet_rare_terms(
            "search engine", "doclen", max_doc_count=2
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]


class TestAdjacencyMatrixAgg:
    def test_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"adj": {"adjacency_matrix": {"filters": {
                "ex": {"term": {"domain": "example.com"}},
                "short": {"range": {"doclen": {"lt": 100}}},
            }}}},
        }
        got = execute_es_aggs(idx, body)["adj"].collect()
        direct = idx.facet_adjacency_matrix(
            "search engine",
            {"ex": "domain = 'example.com'", "short": "doclen < 100"},
        ).collect()
        assert got and [r.asDict() for r in got] == [
            r.asDict() for r in direct
        ]


class TestPhraseForegroundAggs:
    """Aggs (and _count) under a match_phrase query — the foreground is
    the positional conjunctive cut, consistent with _phrase_scored."""

    PHRASE = "machine learning"

    def test_stats_count_equals_phrase_matches(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs, \
            execute_es_count

        body = {
            "query": {"match_phrase": {"content": self.PHRASE}},
            "aggs": {"s": {"stats": {"field": "doclen"}}},
        }
        out = execute_es_aggs(idx, body)["s"].collect()[0]
        n = idx._phrase_scored(self.PHRASE).count()
        assert n > 0 and out["count"] == n
        assert execute_es_count(idx, body) == n

    def test_terms_under_phrase_with_filter(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"bool": {
                "must": [{"match_phrase": {"content": self.PHRASE}}],
                "filter": [{"range": {"doclen": {"gte": 50}}}],
            }},
            "aggs": {"d": {"terms": {"field": "domain", "size": 100}}},
        }
        out = execute_es_aggs(idx, body)["d"].collect()
        matched = idx._phrase_scored(self.PHRASE).select("doc_id")
        want = (
            matched.join(
                idx.docs.filter("doclen >= 50").select("doc_id", "domain"),
                "doc_id",
            ).count()
        )
        assert sum(r["doc_count"] for r in out) == want

    def test_top_hits_under_phrase_scores(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match_phrase": {"content": self.PHRASE}},
            "aggs": {"t": {
                "terms": {"field": "domain", "size": 3},
                "aggs": {"h": {"top_hits": {"size": 2}}},
            }},
        }
        rows = execute_es_aggs(idx, body)["t"].collect()
        scores = {
            r["doc_id"]: r["score"]
            for r in idx._phrase_scored(self.PHRASE).collect()
        }
        assert rows and all(
            abs(r["score"] - scores[r["doc_id"]]) < 1e-9 for r in rows
        )

    def test_sort_under_phrase_refused(self, idx):
        body = {
            "query": {"match_phrase": {"content": self.PHRASE}},
            "sort": [{"doclen": "desc"}],
        }
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, body)


class TestValidateAndMsearch:
    def test_validate(self, idx):
        from search_engine_spark.query.dsl import execute_es_validate

        ok = execute_es_validate(
            idx, {"query": {"match": {"content": "python"}}}
        )
        assert ok == {"valid": True}
        bad = execute_es_validate(
            idx, {"query": {"span_near": {"clauses": []}}}
        )
        assert bad["valid"] is False and "span_near" in bad["error"]
        malformed = execute_es_validate(idx, {"query": {"match": {}}})
        assert malformed["valid"] is False

    def test_msearch(self, idx):
        from search_engine_spark.query.dsl import execute_es_msearch

        bodies = [
            {"query": {"match": {"content": "python tutorial"}}, "size": 5},
            {"query": {"match_phrase": {"content": "machine learning"}},
             "size": 5},
        ]
        outs = execute_es_msearch(idx, bodies, join_docs=False)
        assert len(outs) == 2
        a = rows(outs[0])
        assert a == rows(idx.search("python tutorial", k=5,
                                    join_docs=False))
        b = rows(outs[1])
        assert b == rows(idx.search_phrase("machine learning", k=5,
                                           join_docs=False))


class TestFilterNestedBucket:
    def test_filter_with_nested_terms(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"long_docs": {
                "filter": {"range": {"doclen": {"gte": 100}}},
                "aggs": {"by_domain": {"terms": {"field": "domain",
                                                 "size": 100}}},
            }},
        }
        out = execute_es_aggs(idx, body)["long_docs"]
        dc = out["doc_count"].collect()[0]["doc_count"]
        buckets = out["by_domain"].collect()
        direct = idx.facet_counts(
            "search engine", "domain", size=100, predicate="doclen >= 100"
        ).collect()
        assert [r.asDict() for r in buckets] == [
            r.asDict() for r in direct
        ]
        assert dc == sum(r["doc_count"] for r in buckets)

    def test_filter_with_nested_date_histogram_metrics(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"recent": {
                "filter": {"range": {"doclen": {"gte": 50}}},
                "aggs": {"per_month": {
                    "date_histogram": {"field": "warc_ts",
                                       "calendar_interval": "month"},
                    "aggs": {"avg_dl": {"avg": {"field": "doclen"}}},
                }},
            }},
        }
        out = execute_es_aggs(idx, body)["recent"]
        direct = idx.facet_date_histogram(
            "search engine", "warc_ts", "month",
            predicate="doclen >= 50",
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect()
        assert [r.asDict() for r in out["per_month"].collect()] == [
            r.asDict() for r in direct
        ]


class TestExtendedStatsLowering:
    def test_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {
                "es": {"extended_stats": {"field": "doclen", "sigma": 2}},
                "wa": {"weighted_avg": {
                    "value": {"field": "doclen"},
                    "weight": {"field": "pmod(doc_id, 2) + 1"},
                }},
            },
        }
        out = execute_es_aggs(idx, body)
        d1 = idx.facet_extended_stats("search engine", "doclen",
                                      sigma=2.0).collect()
        d2 = idx.facet_weighted_avg(
            "search engine", "doclen", "pmod(doc_id, 2) + 1"
        ).collect()
        assert [r.asDict() for r in out["es"].collect()] == [
            r.asDict() for r in d1
        ]
        assert [r.asDict() for r in out["wa"].collect()] == [
            r.asDict() for r in d2
        ]


class TestSearchTemplate:
    def test_render_and_execute(self, idx):
        from search_engine_spark.query.dsl import (
            execute_es_search_template,
        )

        body = {
            "source": '{"query": {"match": {"content": "{{q}}"}},'
                      ' "size": "{{k}}"}',
            "params": {"q": "python tutorial", "k": 5},
        }
        got = rows(execute_es_search_template(idx, body, join_docs=False))
        assert got == rows(idx.search("python tutorial", k=5,
                                      join_docs=False))

    def test_tojson_and_inline(self, idx):
        from search_engine_spark.query.dsl import render_search_template

        out = render_search_template(
            '{"query": {"multi_match": {"query": "{{q}}",'
            ' "fields": {{#toJson}}flds{{/toJson}},'
            ' "type": "best_fields"}}, "size": "{{k}}"}',
            {"q": "x y", "flds": ["title^3", "content"], "k": 7},
        )
        assert out == {
            "query": {"multi_match": {
                "query": "x y", "fields": ["title^3", "content"],
                "type": "best_fields"}},
            "size": 7,
        }

    def test_missing_param_raises(self, idx):
        from search_engine_spark.query.dsl import render_search_template

        with pytest.raises(KeyError):
            render_search_template(
                '{"query": {"match": {"content": "{{q}}"}}}', {}
            )


class TestNoScoringBool:
    """Filter-only and must_not-only bools execute at ES's 0.0 score."""

    def test_filter_only_bool(self, idx):
        body = {"query": {"bool": {"filter": [
            {"term": {"domain": "example.com"}}
        ]}}, "size": 5}
        got = execute_es_query(idx, body).collect()
        assert got and all(r["score"] == 0.0 for r in got)
        assert all(
            r["url"].startswith("https://example.com/") for r in got
        )

    def test_must_not_only_bool(self, idx):
        body = {"query": {"bool": {"must_not": [
            {"match": {"content": "python"}}
        ]}}, "size": 2000}
        got = execute_es_query(idx, body, join_docs=False).collect()
        n_all = idx.count_matches(None)
        n_py = idx.count_matches("python")
        assert len(got) == n_all - n_py
        assert all(r["score"] == 0.0 for r in got)

    def test_must_not_phrase_only(self, idx):
        body = {"query": {"bool": {"must_not": [
            {"match_phrase": {"content": "machine learning"}}
        ]}}, "size": 2000}
        got = execute_es_query(idx, body, join_docs=False).collect()
        n_all = idx.count_matches(None)
        n_ph = idx._phrase_scored("machine learning").count()
        assert len(got) == n_all - n_ph


class TestKnnSection:
    """ES kNN search section over a supplied dense-vector table:
    exact cosine top-k vs Python, filter context, live-docs semi-join."""

    def _emb(self, spark, idx):
        import numpy as np

        ids = [r["doc_id"] for r in idx.docs.select("doc_id").collect()]
        rows = []
        for d in ids:
            rng = np.random.RandomState(d % (2**31 - 1))
            rows.append((d, [float(x) for x in rng.randn(8)]))
        return rows, spark.createDataFrame(
            rows, "doc_id long, embedding array<double>"
        )

    def test_exact_matches_python(self, spark, idx):
        import numpy as np

        from search_engine_spark.query.dsl import execute_es_knn

        rows, emb = self._emb(spark, idx)
        q = [1.0, 0.5, -0.25, 0.0, 2.0, -1.0, 0.75, 0.1]
        got = execute_es_knn(
            idx, {"knn": {"query_vector": q, "k": 5}}, emb,
            join_docs=False,
        ).collect()
        qv = np.asarray(q)

        def cos(v):
            v = np.asarray(v)
            return round(
                float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6
            )

        want = sorted(
            ((d, cos(v)) for d, v in rows), key=lambda x: (-x[1], x[0])
        )[:5]
        assert [(r["doc_id"], r["score"]) for r in got] == want

    def test_filtered(self, spark, idx):
        from search_engine_spark.query.dsl import execute_es_knn

        _, emb = self._emb(spark, idx)
        q = [0.1] * 8
        got = execute_es_knn(
            idx,
            {"knn": {"query_vector": q, "k": 100,
                     "filter": [{"term": {"domain": "example.com"}}]}},
            emb,
        ).collect()
        assert got and all(
            r["url"].startswith("https://example.com/") for r in got
        )

    def test_hybrid_sums_boosted_scores(self, spark, idx):
        """Hybrid knn + query: final score = query_score + knn_score *
        knn.boost over the union of the two top windows (ES hybrid
        search semantics), paged by from/size."""
        from search_engine_spark.query.dsl import execute_es_knn, execute_es_query

        _, emb = self._emb(spark, idx)
        q = [1.0, 0.5, -0.25, 0.0, 2.0, -1.0, 0.75, 0.1]
        size, boost = 8, 2.5
        body = {
            "query": {"match": {"content": "python programming"}},
            "knn": {"query_vector": q, "k": 5, "boost": boost},
            "size": size,
        }
        got = [
            (r["doc_id"], r["score"])
            for r in execute_es_knn(idx, body, emb, join_docs=False).collect()
        ]
        qside = {
            r["doc_id"]: r["score"]
            for r in execute_es_query(
                idx,
                {"query": body["query"], "size": size},
                join_docs=False,
            ).collect()
        }
        kside = {
            r["doc_id"]: r["score"] * boost
            for r in execute_es_knn(
                idx, {"knn": {"query_vector": q, "k": 5}}, emb,
                join_docs=False,
            ).collect()
        }
        union = {d: qside.get(d, 0.0) + kside.get(d, 0.0)
                 for d in set(qside) | set(kside)}
        want = sorted(union.items(), key=lambda x: (-x[1], x[0]))[:size]
        assert [(d, round(s, 9)) for d, s in got] == [
            (d, round(s, 9)) for d, s in want
        ]
        # from= pages through the SAME combined order
        page2 = [
            (r["doc_id"], r["score"])
            for r in execute_es_knn(
                idx, {**body, "from": 3, "size": 3}, emb, join_docs=False
            ).collect()
        ]
        want2 = sorted(union.items(), key=lambda x: (-x[1], x[0]))[3:6]
        assert [d for d, _ in page2] == [d for d, _ in want2]

    def test_persisted_ann_path_matches_brute(self, spark, idx, tmp_path):
        """ann= serves the knn section from the persisted IVF index;
        with nprobe == n_cells coverage is exhaustive so the top-k is
        identical to the brute-force scan."""
        from search_engine_spark.ops.ann_index import ann_build, ann_load
        from search_engine_spark.query.dsl import execute_es_knn

        _, emb = self._emb(spark, idx)
        d = str(tmp_path / "annidx")
        ann_build(emb, "doc_id", "embedding", d, kind="ivf", n_cells=4)
        ann = ann_load(spark, d)
        q = [1.0, 0.5, -0.25, 0.0, 2.0, -1.0, 0.75, 0.1]
        body = {"knn": {"query_vector": q, "k": 5}}
        brute = [
            (r["doc_id"], round(r["score"], 6))
            for r in execute_es_knn(idx, body, emb, join_docs=False).collect()
        ]
        via_ann = [
            (r["doc_id"], round(r["score"], 6))
            for r in execute_es_knn(
                idx, body, ann=ann, join_docs=False
            ).collect()
        ]
        # exhaustive probe: search() caps nprobe at n_cells
        import search_engine_spark.query.dsl as dslmod

        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in dslmod.execute_es_knn(
                idx,
                body,
                ann=type(
                    "W", (), {"search": lambda self, qv, k: ann.search(qv, k, nprobe=4)}
                )(),
                join_docs=False,
            ).collect()
        ]
        assert got == brute
        assert set(d for d, _ in via_ann) <= set(d for d, _ in brute) | set(
            d for d, _ in via_ann
        )  # ann with default nprobe is approximate but well-formed
        assert len(via_ann) == 5

    def test_knn_bad_boost_refused(self, spark, idx):
        from search_engine_spark.query.dsl import execute_es_knn

        _, emb = self._emb(spark, idx)
        with pytest.raises(ValueError, match="boost"):
            execute_es_knn(
                idx,
                {"knn": {"query_vector": [0.1] * 8, "k": 5, "boost": 0}},
                emb,
            )
        with pytest.raises(ValueError, match="embeddings"):
            execute_es_knn(idx, {"knn": {"query_vector": [0.1] * 8, "k": 5}})


class TestPipelineAggLowering:
    def test_cumulative_and_derivative_over_metric(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"per_month": {
                "date_histogram": {"field": "warc_ts",
                                   "calendar_interval": "month"},
                "aggs": {
                    "s": {"sum": {"field": "doclen"}},
                    "cum": {"cumulative_sum": {"buckets_path": "s"}},
                    "dv": {"derivative": {"buckets_path": "_count"}},
                    "mv": {"moving_fn": {"buckets_path": "s",
                                         "window": 2}},
                },
            }},
        }
        rows_ = execute_es_aggs(idx, body)["per_month"].collect()
        assert rows_
        run, prev_count = 0.0, None
        svals = [r["s"] for r in rows_]
        for i, r in enumerate(rows_):
            run += r["s"]
            assert abs(r["cum"] - run) < 1e-9
            assert r["dv"] == (
                None if i == 0
                else r["doc_count"] - rows_[i - 1]["doc_count"]
            )
            w = svals[max(0, i - 1): i + 1]
            assert abs(r["mv"] - sum(w) / len(w)) < 1e-9

    def test_bad_buckets_path_refused(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"h": {
                "histogram": {"field": "doclen", "interval": 64},
                "aggs": {"cum": {"cumulative_sum": {
                    "buckets_path": "nope"}}},
            }},
        }
        with pytest.raises(NotImplementedError):
            execute_es_aggs(idx, body)


class TestTermsOrderAndSignificantText:
    def test_order_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"d": {"terms": {
                "field": "domain", "size": 100,
                "order": {"_key": "asc"},
            }}},
        }
        got = execute_es_aggs(idx, body)["d"].collect()
        keys = [r["value"] for r in got]
        assert keys == sorted(keys)
        body["aggs"]["d"]["terms"]["order"] = {"avg_dl": "desc"}
        body["aggs"]["d"]["aggs"] = {"avg_dl": {"avg": {"field": "doclen"}}}
        got = execute_es_aggs(idx, body)["d"].collect()
        avgs = [r["avg_dl"] for r in got]
        assert avgs == sorted(avgs, reverse=True)

    def test_significant_text_alias(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        a = execute_es_aggs(idx, {
            "query": {"match": {"content": "python tutorial"}},
            "aggs": {"s": {"significant_text": {"field": "content",
                                                "size": 5}}},
        })["s"].collect()
        b = idx.significant_terms("python tutorial", size=5).collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]


class TestTopMetricsLowering:
    def test_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"tm": {"top_metrics": {
                "metrics": [{"field": "doclen"}],
                "sort": {"warc_ts": {"order": "desc"}},
                "size": 2,
            }}},
        }
        got = execute_es_aggs(idx, body)["tm"].collect()
        direct = idx.facet_top_metrics(
            "search engine", ["doclen"], ("warc_ts", "desc"), size=2
        ).collect()
        assert got and [r.asDict() for r in got] == [
            r.asDict() for r in direct
        ]


class TestBoxplotMadLowering:
    def test_lowering(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"b": {"boxplot": {"field": "doclen"}},
                     "m": {"median_absolute_deviation": {
                         "field": "doclen"}}},
        }
        out = execute_es_aggs(idx, body)
        b = idx.facet_boxplot("search engine", "doclen").collect()
        m = idx.facet_mad("search engine", "doclen").collect()
        assert [r.asDict() for r in out["b"].collect()] == [
            r.asDict() for r in b
        ]
        assert [r.asDict() for r in out["m"].collect()] == [
            r.asDict() for r in m
        ]


class TestRuntimeMappings:
    """ES runtime_mappings: script-defined fields usable in filter
    clauses and agg field positions (painless arithmetic subset)."""

    RT = {"dl2": {"type": "double", "script": {
        "source": "doc['doclen'].value * 2 + params.off",
        "params": {"off": 1}}}}

    def test_runtime_filter_matches_plain(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        # range on dl2 == range on doclen with transformed bounds
        body = {
            "query": {"bool": {
                "must": [{"match": {"content": "search engine"}}],
                "filter": [{"range": {"dl2": {"gte": 201}}}],
            }},
            "runtime_mappings": self.RT,
            "size": 10,
        }
        got = [
            (r["doc_id"], r["score"])
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        plain = {
            "query": {"bool": {
                "must": [{"match": {"content": "search engine"}}],
                "filter": [{"range": {"doclen": {"gte": 100}}}],
            }},
            "size": 10,
        }
        want = [
            (r["doc_id"], r["score"])
            for r in execute_es_query(
                idx, plain, join_docs=False
            ).collect()
        ]
        assert got == want and got

    def test_runtime_agg_field(self, idx):
        from search_engine_spark.query.dsl import execute_es_aggs

        body = {
            "query": {"match": {"content": "search engine"}},
            "runtime_mappings": self.RT,
            "aggs": {"s": {"stats": {"field": "dl2"}}},
        }
        row = execute_es_aggs(idx, body)["s"].collect()[0]
        plain = {
            "query": {"match": {"content": "search engine"}},
            "aggs": {"s": {"stats": {"field": "doclen"}}},
        }
        prow = execute_es_aggs(idx, plain)["s"].collect()[0]
        assert row["count"] == prow["count"]
        assert row["min"] == prow["min"] * 2 + 1
        assert row["max"] == prow["max"] * 2 + 1
        assert abs(row["avg"] - (prow["avg"] * 2 + 1)) < 1e-9

    def test_refusals(self, idx):
        from search_engine_spark.query.dsl import (
            execute_es_query as run,
        )

        with pytest.raises(NotImplementedError):
            run(idx, {
                "query": {"match": {"content": "x"}},
                "runtime_mappings": self.RT,
                "sort": [{"dl2": "desc"}],
            })
        with pytest.raises(NotImplementedError):
            run(idx, {
                "query": {"match": {"content": "x"}},
                "runtime_mappings": {"bad": {"script": {
                    "source": "_score * 2"}}},
            })


class TestWrapperQuery:
    def test_wrapper_decodes_and_recurses(self, idx):
        import base64
        import json

        from search_engine_spark.query.dsl import execute_es_query

        inner = {"match": {"content": "search engine"}}
        b64 = base64.b64encode(json.dumps(inner).encode()).decode()
        got = [
            (r["doc_id"], r["score"])
            for r in execute_es_query(
                idx, {"query": {"wrapper": {"query": b64}}, "size": 7},
                join_docs=False,
            ).collect()
        ]
        want = [
            (r["doc_id"], r["score"])
            for r in execute_es_query(
                idx, {"query": inner, "size": 7}, join_docs=False
            ).collect()
        ]
        assert got == want and got
        with pytest.raises(ValueError):
            execute_es_query(
                idx, {"query": {"wrapper": {"query": "!!notb64!!"}}}
            )


class TestMoreLikeThisDocRefs:
    """MLT like: [{"_id": n}] — the liked doc's tf map comes from
    term_vectors, the liked doc never appears in the results, and the
    lowering equals calling the engine with the recovered tf map."""

    def test_like_by_id(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        seed = idx.search("search engine", k=1, join_docs=False).collect()
        src = int(seed[0]["doc_id"])
        body = {"query": {"more_like_this": {
            "like": [{"_id": src}],
            "min_term_freq": 1, "min_doc_freq": 2,
            "max_query_terms": 10}}, "size": 10}
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        assert got, "a real doc must have neighbors"
        assert all(d != src for d, _ in got)
        tf = {}
        for r in idx.term_vectors(src).collect():
            tf[r["term"]] = int(r["tf"])
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.more_like_this(
                "", like_tf=tf, exclude_doc_id=[src], k=10,
                min_term_freq=1, min_doc_freq=2, max_query_terms=10,
                join_docs=False,
            ).collect()
        ]
        assert got == want

    def test_mixed_text_and_id(self, idx):
        from search_engine_spark.query.dsl import execute_es_query

        seed = idx.search("database", k=1, join_docs=False).collect()
        src = int(seed[0]["doc_id"])
        body = {"query": {"more_like_this": {
            "like": ["spark cluster partition", {"_id": src}],
            "min_term_freq": 1, "min_doc_freq": 2}}, "size": 5}
        got = execute_es_query(idx, body, join_docs=False).collect()
        assert got and all(int(r["doc_id"]) != src for r in got)
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"more_like_this": {
                "like": [{"_index": "x"}]}}})


class TestReviewRegressions:
    def test_string_source_keeps_column(self, idx):
        body = {"query": {"match": {"content": "python"}},
                "_source": "url", "size": 3}
        df = execute_es_query(idx, body)
        assert "url" in df.columns
        assert "title" not in df.columns

    def test_collapse_applies_source_and_refuses_script_fields(self, idx):
        body = {"query": {"match": {"content": "python"}},
                "collapse": {"field": "domain"}, "_source": ["url"]}
        df = execute_es_query(idx, body)
        assert "url" in df.columns and "title" not in df.columns
        import pytest as _pt

        with _pt.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "python"}},
                "collapse": {"field": "domain"},
                "script_fields": {"x": {"script": {"source": "_score * 2"}}},
            })

    def test_highlight_with_mlt_doc_reference(self, idx):
        body = {"query": {"more_like_this": {"like": [{"_id": 1}],
                                             "min_term_freq": 1,
                                             "min_doc_freq": 1}},
                "highlight": {"fields": {"title": {}}}, "size": 3}
        df = execute_es_query(idx, body)  # must not TypeError
        assert df.count() >= 0

    def test_composed_bool_refuses_fuzzy_match(self, idx):
        import pytest as _pt

        with _pt.raises(NotImplementedError, match="match options"):
            execute_es_query(idx, {"query": {"bool": {
                "must": [
                    {"match": {"content": {"query": "pythn",
                                           "fuzziness": 2}}},
                    {"match_phrase": {"content": "machine learning"}},
                ]}}})

    def test_rrf_standard_retriever_filter_is_applied(self, idx):
        from search_engine_spark.query.rrf import execute_es_retriever

        body = {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"content": "python"}},
                          "filter": [{"term": {"domain": "no-such.example"}}]}},
            {"standard": {"query": {"match": {"content": "python"}}}},
        ]}}, "size": 5}
        df = execute_es_retriever(idx, body, join_docs=False)
        # the filtered retriever matches nothing, so the fusion's rank
        # order equals the unfiltered query's own top order
        alone = execute_es_query(
            idx, {"query": {"match": {"content": "python"}}, "size": 5},
            join_docs=False,
        )
        assert [r["doc_id"] for r in df.collect()] == [
            r["doc_id"] for r in alone.collect()
        ]

    def test_significant_terms_excludes_field_namespace(self, idx):
        # the fixture index is fielded: no t!/d! buckets may appear
        out = idx.significant_terms("python", size=50)
        assert out.filter(F.col("term").contains("!")).count() == 0

    def test_top_metrics_sort_field_in_metrics(self, idx):
        # metrics == sort field: no dangling-comma DDL on any branch
        out = idx.facet_top_metrics(
            "zzzunindexedzzz", metrics=["doclen"], sort=("doclen", "desc")
        )
        assert out.count() == 0
