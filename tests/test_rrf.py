"""Reciprocal-rank fusion (query/rrf.py) vs Python recomputation.

The fused order must equal RRF computed in plain Python over the
engine's OWN per-retriever rankings (rank ties broken score desc,
doc_id asc; fused ties rrf desc, doc_id asc), for BM25+BM25 and
BM25+kNN retriever pairs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.rrf import execute_es_rrf, rrf_fuse
from search_engine_spark.synth import synth_pages

N_PAGES = 160


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rrfindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    build_index(
        spark, pages, root, num_buckets=16, block_size=32,
        num_partitions=8,
    )
    idx = BM25Index(spark, root, seed_min_df=0)
    # deterministic synthetic embeddings aligned to doc ids
    rng = np.random.RandomState(7)
    ids = [r["doc_id"] for r in idx.docs.select("doc_id").collect()]
    emb = spark.createDataFrame(
        [(int(i), rng.randn(8).astype(float).tolist()) for i in ids],
        "doc_id long, embedding array<double>",
    ).cache()
    return idx, emb


def _py_rrf(rankings, k, c):
    acc = {}
    for ranked in rankings:
        for rank, d in enumerate(ranked, 1):
            acc[d] = acc.get(d, 0.0) + 1.0 / (c + rank)
    out = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return out[:k]


class TestRRF:
    def test_fuse_matches_python(self, spark, corpus):
        idx, _ = corpus
        qa, qb = "search engine index", "database partition shuffle"
        window, c, k = 30, 60, 10
        fa = idx.search(qa, k=window, join_docs=False)
        fb = idx.search(qb, k=window, join_docs=False)
        ra = [r["doc_id"] for r in fa.collect()]
        rb = [r["doc_id"] for r in fb.collect()]
        want = _py_rrf([ra, rb], k, c)
        got = [
            (r["doc_id"], r["score"])
            for r in rrf_fuse(
                [fa, fb], k=k, rank_constant=c, window_size=window
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, g), (_, w) in zip(got, want):
            assert abs(g - w) < 1e-12
        # both retrievers' heads must actually contribute
        assert set(d for d, _ in got) & set(ra[:5])
        assert set(d for d, _ in got) & set(rb[:5])

    def test_retriever_body_bm25_plus_knn(self, spark, corpus):
        idx, emb = corpus
        qvec = emb.limit(1).collect()[0]["embedding"]
        body = {
            "retriever": {"rrf": {
                "retrievers": [
                    {"standard": {"query": {
                        "match": {"content": "search engine"}}}},
                    {"knn": {"query_vector": qvec}},
                ],
                "rank_constant": 60, "rank_window_size": 40,
            }},
            "size": 8,
        }
        got = execute_es_rrf(idx, body, embeddings=emb,
                             join_docs=False).collect()
        # python recomputation over the engine's own windows
        from search_engine_spark.query.dsl import execute_es_knn

        ra = [
            r["doc_id"]
            for r in idx.search(
                "search engine", k=40, join_docs=False
            ).collect()
        ]
        rb = [
            r["doc_id"]
            for r in execute_es_knn(
                idx, {"knn": {"query_vector": qvec, "k": 40}}, emb,
                join_docs=False,
            ).collect()
        ]
        want = _py_rrf([ra, rb], 8, 60)
        assert [r["doc_id"] for r in got] == [d for d, _ in want]
        for r, (_, w) in zip(got, want):
            assert abs(r["score"] - w) < 1e-12

    def test_join_docs_and_refusals(self, spark, corpus):
        idx, emb = corpus
        body = {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"content": "search"}}}},
            {"standard": {"query": {"match": {"content": "database"}}}},
        ]}}, "size": 5}
        rows = execute_es_rrf(idx, body).collect()
        assert rows and set(rows[0].asDict()) == {
            "doc_id", "score", "url", "title"
        }
        with pytest.raises(NotImplementedError):
            execute_es_rrf(idx, {"retriever": {"rrf": {
                "retrievers": [{"standard": {"query": {
                    "match": {"content": "x"}}}}]}}})
        with pytest.raises(NotImplementedError):
            execute_es_rrf(idx, {"retriever": {"rrf": {"retrievers": [
                {"knn": {"query_vector": [0.0] * 8}},
                {"standard": {"query": {"match": {"content": "x"}}}},
            ]}}})  # knn without embeddings
        with pytest.raises(ValueError):
            rrf_fuse([], k=5, rank_constant=0)


class TestLinearRetriever:
    """ES linear retriever: weighted normalized score blend vs Python
    recomputation (per-entry weight + normalizer)."""

    def _py_linear(self, windows, weights, norms, k):
        acc = {}
        for ranked, wt, nm in zip(windows, weights, norms):
            scores = [s for _, s in ranked]
            if nm == "minmax":
                mn, mx = min(scores), max(scores)
                f = (lambda s: (s - mn) / (mx - mn)) if mx > mn \
                    else (lambda s: 1.0)
            elif nm == "l2_norm":
                l2 = sum(s * s for s in scores) ** 0.5
                f = (lambda s: s / l2) if l2 > 0 else (lambda s: 0.0)
            else:
                f = lambda s: s
            for d, s in ranked:
                acc[d] = acc.get(d, 0.0) + wt * f(s)
        return sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]

    @pytest.mark.parametrize("norms", [
        ("minmax", "minmax"), ("l2_norm", "l2_norm"),
        ("minmax", "l2_norm"), ("none", "none"),
    ])
    def test_matches_python(self, spark, corpus, norms):
        idx, _ = corpus
        from search_engine_spark.query.rrf import linear_fuse

        qa, qb = "search engine index", "database partition shuffle"
        window, k = 30, 10
        fa = idx.search(qa, k=window, join_docs=False)
        fb = idx.search(qb, k=window, join_docs=False)
        wa = [(r["doc_id"], r["score"]) for r in fa.collect()]
        wb = [(r["doc_id"], r["score"]) for r in fb.collect()]
        weights = [2.0, 0.5]
        want = self._py_linear([wa, wb], weights, list(norms), k)
        got = [
            (r["doc_id"], r["score"])
            for r in linear_fuse(
                [fa, fb], weights=weights, normalizer=list(norms),
                k=k, window_size=window,
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], norms
        for (_, g), (_, w) in zip(got, want):
            assert abs(g - w) < 1e-9

    def test_retriever_body(self, spark, corpus):
        from search_engine_spark.query.rrf import (
            execute_es_retriever,
            linear_fuse,
        )

        idx, emb = corpus
        body = {"retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {
                    "match": {"content": "search engine"}}}},
                 "weight": 3.0, "normalizer": "minmax"},
                {"retriever": {"standard": {"query": {
                    "match": {"content": "database"}}}},
                 "weight": 1.0, "normalizer": "l2_norm"},
            ],
            "rank_window_size": 25,
        }}, "size": 6}
        got = execute_es_retriever(idx, body, join_docs=False).collect()
        fa = idx.search("search engine", k=25, join_docs=False)
        fb = idx.search("database", k=25, join_docs=False)
        direct = linear_fuse(
            [fa, fb], weights=[3.0, 1.0],
            normalizer=["minmax", "l2_norm"], k=6, window_size=25,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in direct
        ]
        with pytest.raises(ValueError):
            linear_fuse([fa], normalizer="nope")
        with pytest.raises(NotImplementedError):
            execute_es_retriever(idx, {"retriever": {"nope": {
                "retrievers": [{}, {}]}}})

    def test_linear_normalizer_defaults_to_none(self, spark, corpus):
        """An entry omitting `normalizer` must score like ES: raw
        (unnormalized) scores, i.e. normalizer "none" — not minmax
        (ADVICE round 1, rrf.py)."""
        from search_engine_spark.query.rrf import (
            execute_es_retriever,
            linear_fuse,
        )

        idx, _ = corpus
        body = {"retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {
                    "match": {"content": "search engine"}}}},
                 "weight": 2.0},
                {"retriever": {"standard": {"query": {
                    "match": {"content": "database"}}}}},
            ],
            "rank_window_size": 25,
        }}, "size": 6}
        got = execute_es_retriever(idx, body, join_docs=False).collect()
        fa = idx.search("search engine", k=25, join_docs=False)
        fb = idx.search("database", k=25, join_docs=False)
        direct = linear_fuse(
            [fa, fb], weights=[2.0, 1.0],
            normalizer=["none", "none"], k=6, window_size=25,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in direct
        ]
