"""Compound queries — dis_max, boosting, function_score, rescore,
regexp, match_bool_prefix — engine vs pure-Python oracles.

These are the ES compound/rewrite query families layered over the same
posting machinery (reference delegates all of them to Elasticsearch;
the /search shape is backend/search_api/main.py:162-189): rank identity
with tie-break (score desc, doc_id asc), scores to 1e-9.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import PhraseOracle, PrefixOracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 200


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("compoundindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32,
        num_partitions=8, index_positions=True,
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle_docs = {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    raw_by_id = {id_by_url[r["url"]]: r["text"] for r in texts}
    doclen = {
        r["doc_id"]: r["doclen"]
        for r in spark.read.parquet(paths.docs).select(
            "doc_id", "doclen"
        ).collect()
    }
    idx = BM25Index(spark, root, seed_min_df=0)
    return idx, PhraseOracle(oracle_docs), PrefixOracle(oracle_docs), \
        raw_by_id, doclen


def _got(df):
    return [
        (r["doc_id"], r["score"])
        for r in df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
    ]


def _phrase_from(raw_by_id, doc_rank=0, sl=slice(3, 6)):
    """A guaranteed-hit phrase lifted from a corpus doc's raw words."""
    d = sorted(raw_by_id)[doc_rank]
    return " ".join(raw_by_id[d].split()[sl])


def _assert_rank_identical(got, want, ctx=""):
    assert [d for d, _ in got] == [d for d, _ in want], ctx
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9, abs=1e-9), ctx


class TestDisMax:
    @pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
    def test_two_match_clauses(self, corpus, tie):
        idx, oracle, _, _, _ = corpus
        q1, q2 = "python programming tutorial", "database transaction"
        got = _got(idx.search_dis_max([q1, q2], tie_breaker=tie,
                                      k=10, join_docs=False))
        want = oracle.topk_dis_max(
            [oracle.or_scores(q1), oracle.or_scores(q2)],
            tie_breaker=tie, k=10,
        )
        _assert_rank_identical(got, want, f"tie={tie}")

    def test_phrase_clause(self, corpus):
        idx, oracle, _, raw_by_id, _ = corpus
        phrase = _phrase_from(raw_by_id)
        q = "search engine ranking"
        got = _got(idx.search_dis_max(
            [q, ("phrase", phrase, 0)], tie_breaker=0.2, k=10,
            join_docs=False,
        ))
        want = oracle.topk_dis_max(
            [oracle.or_scores(q), oracle.phrase_scores(phrase)],
            tie_breaker=0.2, k=10,
        )
        _assert_rank_identical(got, want)

    def test_and_clause(self, corpus):
        idx, oracle, _, _, _ = corpus
        got = _got(idx.search_dis_max(
            [("match", "python programming", "and"), "fox database"],
            k=10, join_docs=False,
        ))
        want = oracle.topk_dis_max(
            [oracle.or_scores("python programming", mode="and"),
             oracle.or_scores("fox database")],
            k=10,
        )
        _assert_rank_identical(got, want)

    def test_unknown_terms_empty(self, corpus):
        idx, *_ = corpus
        assert idx.search_dis_max(
            ["zzzznotaterm", "qqqqnotaterm"], k=10, join_docs=False
        ).count() == 0


class TestBoosting:
    def test_term_negative(self, corpus):
        idx, oracle, _, _, _ = corpus
        pos, neg = "python programming tutorial", "database"
        got = _got(idx.search_boosting(pos, neg, negative_boost=0.4,
                                       k=10, join_docs=False))
        want = oracle.topk_boosting(pos, neg, negative_boost=0.4, k=10)
        _assert_rank_identical(got, want)

    def test_phrase_negative(self, corpus):
        idx, oracle, _, raw_by_id, _ = corpus
        phrase = _phrase_from(raw_by_id, doc_rank=1)
        pos = "search engine ranking relevance"
        got = _got(idx.search_boosting(
            pos, ("phrase", phrase, 0), negative_boost=0.1, k=10,
            join_docs=False,
        ))
        want = oracle.topk_boosting(
            pos, None, negative_boost=0.1, k=10,
            positive_scores=oracle.or_scores(pos),
            negative_ids=set(oracle.phrase_scores(phrase)),
        )
        _assert_rank_identical(got, want)

    def test_demotion_reorders(self, corpus):
        """The boosted order must differ from the plain order when the
        negative clause hits some of the top docs — guards against a
        no-op implementation."""
        idx, oracle, _, _, _ = corpus
        pos, neg = "python programming tutorial", "python"
        plain = [d for d, _ in oracle.topk(pos, k=10)]
        boosted = [
            r["doc_id"]
            for r in idx.search_boosting(
                pos, neg, negative_boost=0.01, k=10, join_docs=False
            ).collect()
        ]
        assert plain != boosted


class TestFunctionScore:
    @pytest.mark.parametrize("modifier,pyfn", [
        ("none", lambda v: v),
        ("log1p", lambda v: math.log10(v + 1.0)),
        ("sqrt", math.sqrt),
        ("reciprocal", lambda v: 1.0 / v),
    ])
    def test_field_value_factor(self, corpus, modifier, pyfn):
        idx, oracle, _, _, doclen = corpus
        q = "python programming tutorial"
        got = _got(idx.search_function_score(
            q,
            field_value_factor={"field": "doclen", "factor": 0.5,
                                "modifier": modifier},
            boost_mode="multiply", k=10, join_docs=False,
        ))
        fvalue = {d: pyfn(0.5 * doclen[d]) for d in doclen}
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want, modifier)

    @pytest.mark.parametrize("boost_mode", ["sum", "replace", "max", "avg"])
    def test_boost_modes(self, corpus, boost_mode):
        idx, oracle, _, _, doclen = corpus
        q = "database transaction"
        got = _got(idx.search_function_score(
            q, field_value_factor={"field": "doclen", "factor": 0.01},
            boost_mode=boost_mode, k=10, join_docs=False,
        ))
        fvalue = {d: 0.01 * doclen[d] for d in doclen}
        want = oracle.topk_function_score(q, fvalue, boost_mode, k=10)
        _assert_rank_identical(got, want, boost_mode)

    def test_weight_functions_with_filter(self, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "search engine ranking"
        med = sorted(doclen.values())[len(doclen) // 2]
        got = _got(idx.search_function_score(
            q,
            functions=[
                {"filter": f"doclen >= {med}", "weight": 3.0},
                {"weight": 1.5},
            ],
            score_mode="sum", boost_mode="multiply", k=10,
            join_docs=False,
        ))
        fvalue = {
            d: (3.0 if doclen[d] >= med else 0.0) + 1.5 for d in doclen
        }
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want)

    def test_unmatched_functions_keep_score(self, corpus):
        """Docs matching no function keep the raw query score."""
        idx, oracle, _, _, _ = corpus
        q = "fox database"
        got = _got(idx.search_function_score(
            q, functions=[{"filter": "doclen < 0", "weight": 99.0}],
            boost_mode="multiply", k=10, join_docs=False,
        ))
        want = oracle.topk(q, k=10)
        _assert_rank_identical(got, want)

    def test_max_boost_caps(self, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "python programming"
        got = _got(idx.search_function_score(
            q, field_value_factor={"field": "doclen", "factor": 1.0},
            boost_mode="multiply", max_boost=5.0, k=10, join_docs=False,
        ))
        fvalue = {d: min(float(doclen[d]), 5.0) for d in doclen}
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want)

    def test_no_functions_is_plain_search(self, corpus):
        idx, oracle, _, _, _ = corpus
        q = "machine learning data"
        got = _got(idx.search_function_score(q, k=10, join_docs=False))
        _assert_rank_identical(got, oracle.topk(q, k=10))


class TestRescore:
    def test_phrase_rescore(self, corpus):
        idx, oracle, _, raw_by_id, _ = corpus
        phrase = _phrase_from(raw_by_id)
        # first-pass query holds the phrase's own words so the window
        # actually contains phrase matches to promote
        q = phrase + " python database"
        got = _got(idx.search_rescore(
            q, ("phrase", phrase, 0), window_size=30,
            query_weight=1.0, rescore_query_weight=2.0, k=10,
            join_docs=False,
        ))
        want = oracle.topk_rescore(
            q, oracle.phrase_scores(phrase), window_size=30,
            query_weight=1.0, rescore_query_weight=2.0, k=10,
        )
        _assert_rank_identical(got, want)

    def test_match_rescore(self, corpus):
        idx, oracle, _, _, _ = corpus
        q, rq = "python programming tutorial", "database"
        got = _got(idx.search_rescore(
            q, rq, window_size=25, query_weight=0.7,
            rescore_query_weight=0.3, k=10, join_docs=False,
        ))
        want = oracle.topk_rescore(
            q, oracle.or_scores(rq), window_size=25,
            query_weight=0.7, rescore_query_weight=0.3, k=10,
        )
        _assert_rank_identical(got, want)

    def test_k_beyond_window_raises(self, corpus):
        idx, *_ = corpus
        with pytest.raises(ValueError, match="window_size"):
            idx.search_rescore("python", "database", window_size=5, k=10)


class TestRegexp:
    @pytest.mark.parametrize("pattern", [
        "progr.*",          # prefix-anchored (StartsWith pushdown)
        "dat(a|abas).*",    # alternation
        "[a-f]ox",          # char class, no literal prefix
        "qu.ck",            # '.' single char
    ])
    def test_rank_identity(self, corpus, pattern):
        idx, _, oracle, _, _ = corpus
        got = _got(idx.search_regexp(pattern, k=10, join_docs=False))
        want = oracle.topk_regexp(pattern, k=10)
        _assert_rank_identical(got, want, pattern)

    def test_lucene_only_operators_raise(self, corpus):
        idx, *_ = corpus
        with pytest.raises(NotImplementedError):
            idx.expand_regexp("foo~bar")

    def test_no_match_empty(self, corpus):
        idx, *_ = corpus
        assert idx.search_regexp("zzzz[0-9]+", k=10,
                                 join_docs=False).count() == 0


class TestBoolPrefix:
    @pytest.mark.parametrize("query", [
        "python progr",     # full term + prefix
        "database tran",
        "quick brown fo",   # two full terms + prefix
        "pyth",             # single incomplete token
    ])
    def test_rank_identity(self, corpus, query):
        idx, _, oracle, _, _ = corpus
        got = _got(idx.search_bool_prefix(query, k=10, join_docs=False))
        want = oracle.topk_bool_prefix(query, k=10)
        _assert_rank_identical(got, want, query)

    def test_order_free_vs_phrase_prefix(self, corpus):
        """bool_prefix must find docs where the tokens are NOT adjacent
        — it is strictly weaker than match_phrase_prefix."""
        idx, _, oracle, _, _ = corpus
        q = "fox databa"
        bool_ids = {
            r["doc_id"]
            for r in idx.search_bool_prefix(q, k=50, join_docs=False).collect()
        }
        phrase_ids = {
            r["doc_id"]
            for r in idx.search_phrase_prefix(q, k=50, join_docs=False).collect()
        }
        assert phrase_ids <= bool_ids

    def test_empty_query(self, corpus):
        idx, *_ = corpus
        assert idx.search_bool_prefix("  ", k=10, join_docs=False).count() == 0


def _md5_random(seed, doc_id, buckets=1_000_000):
    import hashlib

    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
    return (int(h[:15], 16) % buckets) / buckets


class TestFunctionScoreExtended:
    """random_score / decay function entries and the script_score +
    rank_feature query kinds — engine vs Python twins."""

    def test_random_score_deterministic(self, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "python programming tutorial"
        got = _got(idx.search_function_score(
            q, functions=[{"random_score": {"seed": 42}}],
            boost_mode="sum", k=10, join_docs=False,
        ))
        fvalue = {d: _md5_random(42, d) for d in doclen}
        want = oracle.topk_function_score(q, fvalue, "sum", k=10)
        _assert_rank_identical(got, want)
        # replayable: second run bit-identical
        again = _got(idx.search_function_score(
            q, functions=[{"random_score": {"seed": 42}}],
            boost_mode="sum", k=10, join_docs=False,
        ))
        assert got == again

    @pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
    def test_decay_numeric(self, corpus, kind):
        idx, oracle, _, _, doclen = corpus
        q = "database transaction"
        origin, scale, offset, decay = 100.0, 80.0, 10.0, 0.5
        got = _got(idx.search_function_score(
            q,
            functions=[{kind: {"doclen": {
                "origin": origin, "scale": scale,
                "offset": offset, "decay": decay}}}],
            boost_mode="multiply", k=10, join_docs=False,
        ))

        def _decay(v):
            dist = max(0.0, abs(v - origin) - offset)
            if kind == "gauss":
                sigma2 = -(scale ** 2) / (2.0 * math.log(decay))
                return math.exp(-(dist ** 2) / (2.0 * sigma2))
            if kind == "exp":
                return math.exp(math.log(decay) / scale * dist)
            s = scale / (1.0 - decay)
            return max(0.0, (s - dist) / s)

        fvalue = {d: _decay(float(doclen[d])) for d in doclen}
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want, kind)

    def test_decay_date_duration(self, spark, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "search engine ranking"
        ts = {
            r["doc_id"]: r["warc_ts"].timestamp()
            for r in idx.docs.select("doc_id", "warc_ts").collect()
        }
        origin = "2024-01-15T00:00:00"
        from datetime import datetime, timezone

        o = datetime.fromisoformat(origin).replace(
            tzinfo=timezone.utc
        ).timestamp()
        scale, offset = 10 * 86400.0, 86400.0
        got = _got(idx.search_function_score(
            q,
            functions=[{"gauss": {"warc_ts": {
                "origin": origin, "scale": "10d",
                "offset": "1d", "decay": 0.5}}}],
            boost_mode="multiply", k=10, join_docs=False,
        ))
        sigma2 = -(scale ** 2) / (2.0 * math.log(0.5))
        fvalue = {
            d: math.exp(
                -(max(0.0, abs(ts[d] - o) - offset) ** 2) / (2.0 * sigma2)
            )
            for d in ts
        }
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want)

    def test_decay_missing_field_scores_one(self, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "fox database"
        # field expression null for even doc_ids -> decay 1.0 there
        got = _got(idx.search_function_score(
            q,
            functions=[{"linear": {
                "if(pmod(doc_id, 2) = 1, doclen, null)": {
                    "origin": 0.0, "scale": 50.0, "decay": 0.5}}}],
            boost_mode="multiply", k=10, join_docs=False,
        ))

        def _lin(v):
            s = 50.0 / 0.5
            return max(0.0, (s - abs(v)) / s)

        fvalue = {
            d: (_lin(float(doclen[d])) if d % 2 == 1 else 1.0)
            for d in doclen
        }
        want = oracle.topk_function_score(q, fvalue, "multiply", k=10)
        _assert_rank_identical(got, want)

    def test_decay_validation(self, corpus):
        idx, *_ = corpus
        with pytest.raises(ValueError, match="decay"):
            idx.search_function_score(
                "python",
                functions=[{"gauss": {"doclen": {
                    "origin": 0, "scale": 10, "decay": 1.0}}}],
                k=5, join_docs=False,
            )
        with pytest.raises(ValueError, match="one function kind"):
            idx.search_function_score(
                "python",
                functions=[{"random_score": {"seed": 1},
                            "gauss": {"doclen": {
                                "origin": 0, "scale": 10}}}],
                k=5, join_docs=False,
            )


class TestScriptScore:
    def test_matches_python(self, corpus):
        idx, oracle, _, _, doclen = corpus
        q = "python programming tutorial"
        got = _got(idx.search_script_score(
            q,
            "_score * Math.log(2 + doc['doclen'].value) + params.b",
            params={"b": 1.5},
            k=10, join_docs=False,
        ))
        scores = oracle.or_scores(q)
        want = sorted(
            (
                (d, s * math.log(2 + doclen[d]) + 1.5)
                for d, s in scores.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        _assert_rank_identical(got, want)

    def test_min_score(self, corpus):
        idx, oracle, _, _, _ = corpus
        q = "database transaction"
        all_rows = idx.search_script_score(
            q, "_score * 2", k=100, join_docs=False
        ).collect()
        cut = sorted(r["score"] for r in all_rows)[len(all_rows) // 2]
        kept = idx.search_script_score(
            q, "_score * 2", min_score=cut, k=100, join_docs=False
        ).collect()
        assert all(r["score"] >= cut for r in kept)
        assert len(kept) == sum(1 for r in all_rows if r["score"] >= cut)

    def test_subset_refusals(self, corpus):
        idx, *_ = corpus
        from search_engine_spark.query.painless import painless_to_sql

        for bad in [
            "for (int i = 0; i < 10; i++) {}",
            "_score > 1 ? 2 : 3",
            "doc['doclen'].size()",
            "params.missing + 1",
            "System.exit(1)",
            "'a' + 'b'",
        ]:
            with pytest.raises(NotImplementedError):
                painless_to_sql(bad, {})
        with pytest.raises(ValueError, match="unknown doc fields"):
            idx.search_script_score(
                "python", "doc['nope_col'].value", k=5, join_docs=False
            )

    def test_translation_table(self):
        from search_engine_spark.query.painless import painless_to_sql

        sql, fields = painless_to_sql(
            "Math.pow(doc['doclen'].value, 2) + Math.max(_score, params.f)",
            {"f": 3.0},
        )
        assert sql == "power(doclen, 2) + greatest(_score, 3.0)"
        assert fields == ["doclen"]


class TestRankFeature:
    def _feats(self, idx):
        return {
            r["doc_id"]: float(r["doclen"])
            for r in idx.docs.select("doc_id", "doclen").collect()
        }

    def test_saturation_explicit_pivot(self, corpus):
        idx, *_ = corpus
        feats = self._feats(idx)
        got = _got(idx.search_rank_feature(
            "doclen", saturation={"pivot": 100.0}, boost=2.0,
            k=10, join_docs=False,
        ))
        want = sorted(
            ((d, 2.0 * s / (s + 100.0)) for d, s in feats.items() if s > 0),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        _assert_rank_identical(got, want)

    def test_saturation_default_pivot_geometric_mean(self, corpus):
        idx, *_ = corpus
        feats = {d: s for d, s in self._feats(idx).items() if s > 0}
        g = math.exp(sum(math.log(s) for s in feats.values()) / len(feats))
        got = _got(idx.search_rank_feature(
            "doclen", k=10, join_docs=False
        ))
        want = sorted(
            ((d, s / (s + g)) for d, s in feats.items()),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        # pivot travels through a float collect — compare at 1e-6
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-6)

    def test_log_and_sigmoid(self, corpus):
        idx, *_ = corpus
        feats = self._feats(idx)
        got = _got(idx.search_rank_feature(
            "doclen", log={"scaling_factor": 3.0}, k=10, join_docs=False,
        ))
        want = sorted(
            ((d, math.log(3.0 + s)) for d, s in feats.items() if s > 0),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        _assert_rank_identical(got, want)
        got = _got(idx.search_rank_feature(
            "doclen", sigmoid={"pivot": 120.0, "exponent": 2.0},
            k=10, join_docs=False,
        ))
        want = sorted(
            (
                (d, s ** 2 / (s ** 2 + 120.0 ** 2))
                for d, s in feats.items() if s > 0
            ),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        _assert_rank_identical(got, want)

    def test_nonpositive_docs_dont_match(self, corpus):
        idx, *_ = corpus
        feats = self._feats(idx)
        rows = idx.search_rank_feature(
            "doclen - 1000000", saturation={"pivot": 1.0},
            k=10, join_docs=False,
        ).collect()
        assert rows == []  # every doclen - 1e6 is negative
        assert all(s > 0 for s in feats.values())

    def test_one_shape_only(self, corpus):
        idx, *_ = corpus
        with pytest.raises(ValueError, match="one scoring shape"):
            idx.search_rank_feature(
                "doclen", saturation={"pivot": 1.0},
                log={"scaling_factor": 1.0},
            )


class TestNewDslLowering:
    def test_function_score_functions(self, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, *_ = corpus
        body = {"query": {"function_score": {
            "query": {"match": {"content": "python programming"}},
            "functions": [
                {"random_score": {"seed": 7}, "weight": 2.0},
                {"gauss": {"doclen": {"origin": 100, "scale": 50}},
                 "filter": {"range": {"doclen": {"gte": 50}}}},
            ],
            "score_mode": "sum", "boost_mode": "multiply",
        }}, "size": 10}
        got = execute_es_query(idx, body, join_docs=False).collect()
        want = idx.search_function_score(
            "python programming",
            functions=[
                {"random_score": {"seed": 7}, "weight": 2.0},
                {"gauss": {"doclen": {"origin": 100, "scale": 50}},
                 "filter": "doclen >= 50"},
            ],
            score_mode="sum", boost_mode="multiply",
            k=10, join_docs=False,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_script_score_node(self, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, *_ = corpus
        body = {"query": {"script_score": {
            "query": {"match": {"content": "database transaction"}},
            "script": {
                "source": "_score + params.w * Math.sqrt("
                          "doc['doclen'].value)",
                "params": {"w": 0.1},
            },
        }}, "size": 8}
        got = execute_es_query(idx, body, join_docs=False).collect()
        want = idx.search_script_score(
            "database transaction",
            "_score + params.w * Math.sqrt(doc['doclen'].value)",
            params={"w": 0.1}, k=8, join_docs=False,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_rank_feature_node(self, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, *_ = corpus
        body = {"query": {"rank_feature": {
            "field": "doclen", "saturation": {"pivot": 80},
            "boost": 1.5,
        }}, "size": 6}
        got = execute_es_query(idx, body, join_docs=False).collect()
        want = idx.search_rank_feature(
            "doclen", saturation={"pivot": 80}, boost=1.5,
            k=6, join_docs=False,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]


class TestPinned:
    """ES pinned query: request-ordered pins above organic results."""

    def test_pins_lead_in_request_order(self, spark, corpus):
        idx, oracle, _, raw, _ = corpus
        q = "search engine index"
        organic = sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )
        assert len(organic) >= 6
        pins = [organic[4][0], organic[1][0]]  # deliberately not rank order
        got = _got(idx.search_pinned(pins, q, k=8, join_docs=False))
        assert [d for d, _ in got[:2]] == pins
        assert got[0][1] > got[1][1] > 1e15  # anchor scores, descending
        want_tail = [d for d, _ in organic if d not in set(pins)][:6]
        assert [d for d, _ in got[2:]] == want_tail
        for (d, s), (wd, ws) in zip(
            got[2:], [x for x in organic if x[0] not in set(pins)][:6]
        ):
            assert s == pytest.approx(ws, rel=1e-9)

    def test_unknown_and_deleted_pins_skipped(self, spark, corpus):
        idx, oracle, _, _, _ = corpus
        q = "search engine index"
        top = sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )
        got = _got(
            idx.search_pinned([999999999, top[0][0]], q, k=5,
                              join_docs=False)
        )
        assert got[0][0] == top[0][0]
        assert all(d != 999999999 for d, _ in got)
        with pytest.raises(ValueError):
            idx.search_pinned([1, 1], q)

    def test_dsl_lowering(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, oracle, _, _, _ = corpus
        q = "search engine index"
        top = sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )
        pins = [top[3][0]]
        body = {"query": {"pinned": {
            "ids": pins, "organic": {"match": {"content": q}}}},
            "size": 4}
        got = _got(execute_es_query(idx, body, join_docs=False))
        direct = _got(idx.search_pinned(pins, q, k=4, join_docs=False))
        assert got == direct


class TestDistanceFeature:
    """ES distance_feature: boost * pivot / (pivot + |field - origin|)
    over date and numeric doc fields, vs Python recomputation."""

    def test_date_field(self, spark, corpus):
        idx, _, _, _, _ = corpus
        rows = idx.docs.select("doc_id", "warc_ts").collect()
        origin = "2024-01-05T00:00:00"
        import datetime as dt

        o = dt.datetime(2024, 1, 5)
        pivot_ms = 2 * 86400 * 1000.0
        want = sorted(
            (
                (
                    r["doc_id"],
                    2.0 * pivot_ms / (
                        pivot_ms
                        + abs((r["warc_ts"] - o).total_seconds() * 1000.0)
                    ),
                )
                for r in rows
                if r["warc_ts"] is not None
            ),
            key=lambda x: (-x[1], x[0]),
        )[:7]
        got = _got(
            idx.search_distance_feature(
                "warc_ts", origin, "2d", boost=2.0, k=7, join_docs=False
            )
        )
        _assert_rank_identical(got, want, "date distance_feature")

    def test_numeric_field_and_refusals(self, spark, corpus):
        idx, _, _, _, doclen = corpus
        origin, pivot = 150.0, 40.0
        want = sorted(
            (
                (d, pivot / (pivot + abs(float(l) - origin)))
                for d, l in doclen.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:6]
        got = _got(
            idx.search_distance_feature(
                "doclen", origin, pivot, k=6, join_docs=False
            )
        )
        _assert_rank_identical(got, want, "numeric distance_feature")
        with pytest.raises(ValueError):
            idx.search_distance_feature("nope", 0, 1)
        with pytest.raises(ValueError):
            idx.search_distance_feature("doclen", 0, "7d")

    def test_dsl_lowering(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, _, _, _, _ = corpus
        body = {"query": {"distance_feature": {
            "field": "warc_ts", "origin": "2024-01-03T00:00:00",
            "pivot": "12h"}}, "size": 5}
        got = _got(execute_es_query(idx, body, join_docs=False))
        direct = _got(
            idx.search_distance_feature(
                "warc_ts", "2024-01-03T00:00:00", "12h", k=5,
                join_docs=False,
            )
        )
        assert got == direct


class TestReviewRegressions:
    def test_pinned_docs_form(self, spark, corpus):
        """The ES 7.15+ pinned `docs` form must pin, not be ignored."""
        from search_engine_spark.query.dsl import execute_es_query

        idx, oracle, _, _, _ = corpus
        q = "search engine index"
        top = sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )
        pin = top[3][0]
        body = {"query": {"pinned": {
            "docs": [{"_id": pin}],
            "organic": {"match": {"content": q}}}}, "size": 4}
        got = _got(execute_es_query(idx, body, join_docs=False))
        assert got[0][0] == pin and got[0][1] > 1e15
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"pinned": {
                "organic": {"match": {"content": q}}}}})

    def test_duration_pivot_on_numeric_field_names_the_problem(
        self, spark, corpus
    ):
        idx, *_ = corpus
        with pytest.raises(ValueError, match="non-timestamp"):
            idx.search_distance_feature("doclen", 0, "7d")

    def test_fuzzy_match_msm_refused(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        idx, *_ = corpus
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"match": {"content": {
                "query": "a b", "fuzziness": 1,
                "minimum_should_match": 2}}}})
