"""_rank_eval metrics + _terms_enum dictionary walk vs Python oracles.

rank_eval's ranking side is the engine's own (already rank-identity-
tested everywhere); these tests pin the METRIC reduction (precision /
recall / MRR / DCG / NDCG / ERR) against independent recomputation over
the oracle's ranking, and the terms_enum cursor walk against the
oracle's term dictionary.
"""

import math

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.query.rankeval import rank_eval
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 150


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rankevalindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle = BM25Oracle(
        {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    )
    return oracle, BM25Index(spark, root, seed_min_df=0)


def _requests(oracle):
    """Judged requests whose ratings mix relevant top hits, judged-
    irrelevant hits, relevant NON-hits, and unjudged docs."""
    out = []
    for qid, q in [("q1", "search engine index"),
                   ("q2", "machine learning model"),
                   ("q3", "zzzznotaterm")]:
        top = [d for d, _ in sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )][:8]
        ratings = []
        for i, d in enumerate(top):
            if i % 2 == 0:
                ratings.append({"_id": d, "rating": 3 - (i % 3)})
        ratings.append({"_id": 999999999, "rating": 3})  # relevant miss
        out.append({
            "id": qid,
            "request": {"query": {"match": {"content": q}}},
            "ratings": ratings,
            "_expected_ranked": top,
        })
    return out


class TestRankEval:
    @pytest.mark.parametrize("metric", [
        {"precision": {"k": 5, "relevant_rating_threshold": 2}},
        {"recall": {"k": 5, "relevant_rating_threshold": 2}},
        {"mean_reciprocal_rank": {"k": 8}},
        {"dcg": {"k": 8}},
        {"dcg": {"k": 8, "normalize": True}},
        {"expected_reciprocal_rank": {"k": 8, "maximum_relevance": 3}},
    ])
    def test_metrics_match_python(self, spark, corpus, metric):
        oracle, idx = corpus
        reqs = _requests(oracle)
        got = rank_eval(
            idx, [{k: v for k, v in r.items()
                   if not k.startswith("_")} for r in reqs],
            metric=metric,
        )
        kind, spec = next(iter(metric.items()))
        k = spec.get("k", 10)
        thr = spec.get("relevant_rating_threshold", 1)
        per_q = []
        for r in reqs:
            ranked = r["_expected_ranked"][:k]
            ratings = {x["_id"]: x["rating"] for x in r["ratings"]}
            if kind == "precision":
                want = (sum(1 for d in ranked if ratings.get(d, 0) >= thr)
                        / len(ranked)) if ranked else 0.0
            elif kind == "recall":
                tot = sum(1 for v in ratings.values() if v >= thr)
                want = (sum(1 for d in ranked if ratings.get(d, 0) >= thr)
                        / tot) if tot else 0.0
            elif kind == "mean_reciprocal_rank":
                want = next(
                    (1.0 / i for i, d in enumerate(ranked, 1)
                     if ratings.get(d, 0) >= thr), 0.0)
            elif kind == "dcg":
                want = sum((2.0 ** ratings.get(d, 0) - 1)
                           / math.log2(i + 1)
                           for i, d in enumerate(ranked, 1))
                if spec.get("normalize"):
                    ideal = sorted(ratings.values(), reverse=True)[:k]
                    idcg = sum((2.0 ** v - 1) / math.log2(i + 1)
                               for i, v in enumerate(ideal, 1))
                    want = want / idcg if idcg else 0.0
            else:  # ERR
                mr = spec["maximum_relevance"]
                p, want = 1.0, 0.0
                for i, d in enumerate(ranked, 1):
                    rr = (2.0 ** ratings.get(d, 0) - 1) / 2.0 ** mr
                    want += p * rr / i
                    p *= 1 - rr
            per_q.append(want)
            assert got["details"][r["id"]]["metric_score"] == \
                pytest.approx(want, abs=1e-12), (kind, r["id"])
        assert got["metric_score"] == pytest.approx(
            sum(per_q) / len(per_q), abs=1e-12)

    def test_unknown_metric_refused(self, spark, corpus):
        _, idx = corpus
        with pytest.raises(NotImplementedError):
            rank_eval(idx, [], metric={"nope": {}})
        # empty request list -> defined zero, not a crash
        assert rank_eval(idx, [])["metric_score"] == 0.0


class TestTermsEnum:
    def test_prefix_walk_matches_dictionary(self, spark, corpus):
        oracle, idx = corpus
        terms = sorted(oracle.df)
        some = terms[len(terms) // 3]
        p = some[:2]
        want = [t for t in terms if t.startswith(p)]
        assert idx.terms_enum(p, size=5) == want[:5]
        # cursor pagination: walking pages == one big page
        walked, after = [], None
        while True:
            page = idx.terms_enum(p, size=3, search_after=after)
            if not page:
                break
            walked += page
            after = page[-1]
        assert walked == want

    def test_normalization_and_empty(self, spark, corpus):
        oracle, idx = corpus
        terms = sorted(oracle.df)
        p = terms[0][:2]
        assert idx.terms_enum(p.upper() + "!", size=4) == \
            idx.terms_enum(p, size=4)
        assert idx.terms_enum("zzzznotaprefix", size=5) == []
        assert idx.terms_enum(p, size=0) == []
        # empty prefix = dictionary walk from the start
        assert idx.terms_enum("", size=4) == terms[:4]


class TestScriptFieldsAndEndpoint:
    def test_execute_es_rank_eval_body(self, spark, corpus):
        from search_engine_spark.query.rankeval import execute_es_rank_eval

        oracle, idx = corpus
        q = "search engine index"
        top = [d for d, _ in sorted(
            oracle.or_scores(q).items(), key=lambda x: (-x[1], x[0])
        )][:3]
        body = {
            "requests": [{
                "id": "q1",
                "request": {"query": {"match": {"content": q}}},
                "ratings": [{"_id": top[0], "rating": 2}],
            }],
            "metric": {"precision": {"k": 3}},
        }
        res = execute_es_rank_eval(idx, body)
        assert res["metric_score"] == pytest.approx(1.0 / 3.0)

    def test_script_fields(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        oracle, idx = corpus
        body = {
            "query": {"match": {"content": "search engine index"}},
            "script_fields": {
                "boosted": {"script": {
                    "source": "_score * params.f + doc['doclen'].value",
                    "params": {"f": 2.5},
                }},
            },
            "size": 5,
        }
        rows = execute_es_query(idx, body, join_docs=False).collect()
        assert rows
        doclen = {
            r["doc_id"]: r["doclen"]
            for r in idx.docs.select("doc_id", "doclen").collect()
        }
        # ordering stays (score desc, doc_id asc) after the field join
        assert [r["doc_id"] for r in rows] == [
            d for d, _ in sorted(
                ((r["doc_id"], r["score"]) for r in rows),
                key=lambda x: (-x[1], x[0]),
            )
        ]
        for r in rows:
            want = r["score"] * 2.5 + doclen[r["doc_id"]]
            assert r["boosted"] == pytest.approx(want, rel=1e-12)
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "search"}},
                "script_fields": {"x": {"script": {
                    "source": "doc['doclen'].value"}}},
                "sort": [{"doclen": "desc"}],
            })


class TestReviewRegressions:
    def test_script_field_may_shadow_doc_column(self, spark, corpus):
        """A script field named after the doc column it references must
        survive in the response (it replaces the joined helper)."""
        from search_engine_spark.query.dsl import execute_es_query

        _, idx = corpus
        body = {
            "query": {"match": {"content": "search engine index"}},
            "script_fields": {"doclen": {"script": {
                "source": "doc['doclen'].value * 2"}}},
            "size": 4,
        }
        rows = execute_es_query(idx, body, join_docs=False).collect()
        assert rows and all(r["doclen"] is not None for r in rows)
        real = {
            r["doc_id"]: r["doclen"]
            for r in idx.docs.select("doc_id", "doclen").collect()
        }
        for r in rows:
            assert r["doclen"] == real[r["doc_id"]] * 2
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": "search"}},
                "script_fields": {"_score": {"script": {
                    "source": "1 + 1"}}},
            })

    def test_shadowing_script_field_does_not_feed_later_field(
        self, spark, corpus
    ):
        """ES evaluates script fields independently against the source
        doc: a field named `doclen` must NOT change what a later field
        reading doc['doclen'] sees (ADVICE round 1, dsl.py)."""
        from search_engine_spark.query.dsl import execute_es_query

        _, idx = corpus
        body = {
            "query": {"match": {"content": "search engine index"}},
            "script_fields": {
                "doclen": {"script": {"source": "doc['doclen'].value * 2"}},
                "plus_one": {"script": {"source": "doc['doclen'].value + 1"}},
            },
            "size": 4,
        }
        rows = execute_es_query(idx, body, join_docs=False).collect()
        assert rows
        real = {
            r["doc_id"]: r["doclen"]
            for r in idx.docs.select("doc_id", "doclen").collect()
        }
        for r in rows:
            assert r["doclen"] == real[r["doc_id"]] * 2
            # reads the SOURCE doclen, not the shadowing script field
            assert r["plus_one"] == real[r["doc_id"]] + 1

    def test_duplicate_request_ids_refused(self, spark, corpus):
        _, idx = corpus
        req = {"request": {"query": {"match": {"content": "x"}}},
               "ratings": []}
        with pytest.raises(ValueError):
            rank_eval(idx, [{"id": "q", **req}, {"id": "q", **req}])


def test_err_rejects_ratings_above_maximum_relevance():
    from search_engine_spark.query.rankeval import _metric_score

    with pytest.raises(ValueError, match="maximum_relevance"):
        _metric_score(
            "expected_reciprocal_rank", {"k": 5, "maximum_relevance": 4},
            ["a"], {"a": 5},
        )
