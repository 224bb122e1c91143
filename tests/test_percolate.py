"""percolate (query/percolate.py) — the ES percolator's reverse-search
semantics vs a pure-Python oracle: OR/AND/minimum_should_match per
stored query, analyzed with the canonical tokenizer, stopword-only
queries match nothing."""

import pytest

from search_engine_spark.query.percolate import percolate
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 120

QUERIES = [
    (1, "python programming tutorial", "or", 0),
    (2, "python programming tutorial", "and", 0),
    (3, "machine learning", "and", 0),
    (4, "the of and", "or", 0),            # stopword-only -> no matches
    (5, "spark data cluster engine", "or", 3),  # msm 3
    (6, "zzzznotaterm", "or", 0),
]


@pytest.fixture(scope="module")
def data(spark):
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    docs = pages.select("url", "text")
    texts = {r["url"]: tokenize_py(r["text"]) for r in docs.collect()}
    qdf = spark.createDataFrame(
        QUERIES, "query_id int, query string, op string, msm int"
    )
    return docs, qdf, texts


def _oracle(texts):
    out = set()
    for qid, qtext, op, msm in QUERIES:
        terms = set(tokenize_py(qtext))
        if not terms:
            continue
        need = msm if msm > 0 else (len(terms) if op == "and" else 1)
        for url, toks in texts.items():
            have = len(terms & set(toks))
            if have >= need:
                out.add((url, qid))
    return out


class TestPercolate:
    def test_matches_oracle(self, spark, data):
        docs, qdf, texts = data
        got = {
            (r["doc_id"], r["query_id"])
            for r in percolate(
                docs, qdf, id_col="url", operator_col="op",
                min_should_match_col="msm",
            ).collect()
        }
        assert got == _oracle(texts)

    def test_counts_and_threshold_columns(self, spark, data):
        docs, qdf, texts = data
        rows = percolate(
            docs, qdf, id_col="url", operator_col="op",
            min_should_match_col="msm",
        ).collect()
        for r in rows:
            qid = r["query_id"]
            qtext = next(q[1] for q in QUERIES if q[0] == qid)
            terms = set(tokenize_py(qtext))
            assert r["n_terms"] == len(terms)
            assert r["matched_terms"] == len(
                terms & set(texts[r["doc_id"]])
            )

    def test_or_default_without_operator_col(self, spark, data):
        docs, qdf, texts = data
        got = {
            (r["doc_id"], r["query_id"])
            for r in percolate(docs, qdf, id_col="url").collect()
        }
        want = set()
        for qid, qtext, _, _ in QUERIES:
            terms = set(tokenize_py(qtext))
            if not terms:
                continue
            for url, toks in texts.items():
                if terms & set(toks):
                    want.add((url, qid))
        assert got == want

    def test_unbroadcast_path_identical(self, spark, data):
        docs, qdf, texts = data
        a = {
            (r["doc_id"], r["query_id"])
            for r in percolate(
                docs, qdf, id_col="url", operator_col="op",
                min_should_match_col="msm", broadcast_queries=False,
            ).collect()
        }
        assert a == _oracle(texts)


def test_and_operator_wins_over_msm(spark):
    """operator=and requires EVERY term even when min_should_match is
    also present — matching the engine's search and ES, where msm
    applies only to OR modes."""
    from search_engine_spark.query.percolate import percolate

    queries = spark.createDataFrame(
        [(1, "big data spark", "and", 2)],
        "query_id long, query string, operator string, min_should_match int",
    )
    docs = spark.createDataFrame(
        [(10, "big data here"), (11, "big data spark works")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            docs, queries, text_col="text", id_col="doc_id",
            operator_col="operator",
            min_should_match_col="min_should_match",
        ).collect()
    }
    assert got == {(11, 1)}  # 2-of-3 doc 10 must NOT fire the AND query
