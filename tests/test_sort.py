"""search_sorted (ES request-body `sort` section) vs a pure-Python
oracle: the matched set comes from BM25Oracle.or_scores, the order from
docs-table metadata.  Pins ES scoring semantics (field-only sorts skip
scoring — null score — unless track_scores / a _score key forces it),
filter composition, AND-mode, and the DSL lowering incl. pagination
through the sort order and loud refusals.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_query
from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 250
QUERY = "python programming tutorial"
K_ALL = 10_000  # larger than any match count: full ordering comparisons


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sort_idx"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
    )
    idx = BM25Index(spark, paths.root, seed_min_df=0)
    meta = {
        r["doc_id"]: r.asDict()
        for r in idx.docs.select(
            "doc_id", "url", "domain", "warc_ts", "doclen"
        ).collect()
    }
    id_by_url = {m["url"]: d for d, m in meta.items()}
    texts = pages.select("url", "text").collect()
    oracle = BM25Oracle(
        {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    )
    return idx, oracle, meta


def _oracle_order(oracle, meta, sort, mode="or", pred=None, k=K_ALL):
    """Expected doc_id order: python sort of the oracle's matched set
    by the (field, dir) keys with doc_id asc tie-break."""
    scores = oracle.or_scores(QUERY, mode=mode)
    ids = [d for d in scores if pred is None or pred(meta[d])]

    def key(d):
        out = []
        for f, direction in sort:
            v = scores[d] if f == "_score" else meta[d][f]
            out.append(_neg(v) if direction == "desc" else v)
        out.append(d)
        return tuple(out)

    return [d for d in sorted(ids, key=key)][:k], scores


class _neg:
    """Order-reversing wrapper so desc works for non-numeric keys."""

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


class TestSearchSorted:
    def test_field_sort_skips_scoring(self, corpus):
        idx, oracle, meta = corpus
        got = idx.search_sorted(
            QUERY, [("warc_ts", "desc")], k=K_ALL, join_docs=False
        ).collect()
        want, _ = _oracle_order(oracle, meta, [("warc_ts", "desc")])
        assert [r["doc_id"] for r in got] == want and want
        assert all(r["score"] is None for r in got)  # ES: no scoring

    def test_multi_key(self, corpus):
        idx, oracle, meta = corpus
        sort = [("domain", "asc"), ("doclen", "desc")]
        got = [
            r["doc_id"]
            for r in idx.search_sorted(
                QUERY, sort, k=K_ALL, join_docs=False
            ).collect()
        ]
        want, _ = _oracle_order(oracle, meta, sort)
        assert got == want

    def test_score_key_forces_scoring(self, corpus):
        idx, oracle, meta = corpus
        sort = [("domain", "asc"), ("_score", "desc")]
        got = idx.search_sorted(
            QUERY, sort, k=K_ALL, join_docs=False
        ).collect()
        want, scores = _oracle_order(oracle, meta, sort)
        assert [r["doc_id"] for r in got] == want
        for r in got:
            assert abs(r["score"] - scores[r["doc_id"]]) < 1e-9

    def test_track_scores(self, corpus):
        idx, oracle, meta = corpus
        got = idx.search_sorted(
            QUERY, [("doclen", "asc")], k=K_ALL, join_docs=False,
            track_scores=True,
        ).collect()
        want, scores = _oracle_order(oracle, meta, [("doclen", "asc")])
        assert [r["doc_id"] for r in got] == want
        for r in got:
            assert abs(r["score"] - scores[r["doc_id"]]) < 1e-9

    def test_predicate_and_mode(self, corpus):
        idx, oracle, meta = corpus
        sort = [("warc_ts", "asc")]
        got = [
            r["doc_id"]
            for r in idx.search_sorted(
                QUERY, sort, k=K_ALL, mode="and",
                predicate="domain = 'example.com'", join_docs=False,
            ).collect()
        ]
        and_scores = oracle.or_scores(QUERY, mode="and")
        want = sorted(
            (
                d for d in and_scores
                if meta[d]["domain"] == "example.com"
            ),
            key=lambda d: (meta[d]["warc_ts"], d),
        )
        assert got == want

    def test_join_docs_keeps_order_and_fields(self, corpus):
        idx, oracle, meta = corpus
        df = idx.search_sorted(QUERY, [("warc_ts", "desc")], k=5)
        rows = df.collect()
        want, _ = _oracle_order(oracle, meta, [("warc_ts", "desc")], k=5)
        assert [r["doc_id"] for r in rows] == want
        assert "url" in df.columns and "warc_ts" in df.columns

    def test_unknown_field(self, corpus):
        idx, _, _ = corpus
        with pytest.raises(ValueError):
            idx.search_sorted(QUERY, [("nope", "asc")], k=5)


class TestSortDSL:
    def test_sort_lowering(self, corpus):
        idx, _, _ = corpus
        body = {
            "query": {"match": {"content": QUERY}},
            "sort": [{"warc_ts": {"order": "desc"}}],
            "size": 8,
        }
        got = [
            r["doc_id"]
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        want = [
            r["doc_id"]
            for r in idx.search_sorted(
                QUERY, [("warc_ts", "desc")], k=8, join_docs=False
            ).collect()
        ]
        assert got == want and got

    def test_sort_string_and_secondary_score(self, corpus):
        idx, _, _ = corpus
        body = {
            "query": {"match": {"content": QUERY}},
            "sort": ["domain", "_score"],
            "size": 8,
        }
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_sorted(
                QUERY, [("domain", "asc"), ("_score", "desc")],
                k=8, join_docs=False,
            ).collect()
        ]
        assert got == want and got

    def test_sort_pagination(self, corpus):
        idx, _, _ = corpus
        base = {
            "query": {"match": {"content": QUERY}},
            "sort": [{"doclen": "desc"}],
        }
        full = [
            r["doc_id"]
            for r in execute_es_query(
                idx, {**base, "size": 10}, join_docs=False
            ).collect()
        ]
        page2 = [
            r["doc_id"]
            for r in execute_es_query(
                idx, {**base, "from": 5, "size": 5}, join_docs=False
            ).collect()
        ]
        assert page2 == full[5:]

    def test_sort_under_bool_filter(self, corpus):
        idx, _, _ = corpus
        body = {
            "query": {"bool": {
                "must": [{"match": {"content": QUERY}}],
                "filter": [{"term": {"domain": "example.com"}}],
            }},
            "sort": [{"warc_ts": "asc"}],
            "size": 20,
        }
        got = [
            r["doc_id"]
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        want = [
            r["doc_id"]
            for r in idx.search_sorted(
                QUERY, [("warc_ts", "asc")], k=20,
                predicate=F.col("domain") == "example.com",
                join_docs=False,
            ).collect()
        ]
        assert got == want

    def test_explicit_score_sort_is_default_path(self, corpus):
        idx, _, _ = corpus
        q = {"query": {"match": {"content": QUERY}}, "size": 10}
        plain = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_es_query(idx, q, join_docs=False).collect()
        ]
        scored = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_es_query(
                idx, {**q, "sort": ["_score"]}, join_docs=False
            ).collect()
        ]
        assert scored == plain

    def test_refusals(self, corpus):
        idx, _, _ = corpus
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": QUERY}},
                "sort": [{"warc_ts": {"order": "asc", "mode": "min"}}],
            })
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {
                "query": {"match": {"content": QUERY}},
                "sort": [{"warc_ts": "asc"}],
                "collapse": {"field": "domain"},
            })


class TestSortMatchAll:
    """Field sorts over match_all / filter-only foregrounds — the ES
    newest-first-over-everything feed shape; track_scores under
    match_all yields the constant 1.0."""

    def test_sort_all_newest_first(self, spark, corpus):
        idx, *_ = corpus
        rows = idx.search_sorted(
            None, [("warc_ts", "desc")], k=5, join_docs=False
        ).collect()
        ts = [r["warc_ts"] for r in rows]
        assert len(ts) == 5 and ts == sorted(ts, reverse=True)
        assert all(r["score"] is None for r in rows)

    def test_sort_all_track_scores_constant(self, spark, corpus):
        idx, *_ = corpus
        rows = idx.search_sorted(
            None, [("doclen", "desc")], k=5, track_scores=True,
            join_docs=False,
        ).collect()
        assert rows and all(r["score"] == 1.0 for r in rows)

    def test_sort_filter_only(self, spark, corpus):
        idx, *_ = corpus
        rows = idx.search_sorted(
            None, [("doclen", "asc")], k=100,
            predicate="domain = 'example.com'", join_docs=True,
        ).collect()
        assert rows and all(
            r["url"].startswith("https://example.com/") for r in rows
        )
