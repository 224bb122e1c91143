"""Span query family vs the brute-force SpanOracle.

The engine evaluates spans with backward DP / minimal-window sweeps
inside one Arrow UDF (query/spans.py); the oracle enumerates every
chain/window combination (query/oracle.py:SpanOracle) — two genuinely
different algorithms that must be rank-identical (tie-break score desc,
doc_id asc; scores to 1e-9).  Span queries are derived FROM the corpus
token streams (guaranteed hits) plus fixed negative/refusal cases.
"""

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_query
from search_engine_spark.query.oracle import SpanOracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 160


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spanindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root,
        num_buckets=16, block_size=32, num_partitions=8,
        index_positions=True,
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle_docs = {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    raw_by_id = {id_by_url[r["url"]]: r["text"] for r in texts}
    idx = BM25Index(spark, root, seed_min_df=0)
    return SpanOracle(oracle_docs), idx, raw_by_id


def _word_triples(raw_by_id):
    """(w1, w2, w3) raw-word triples from doc texts — each word
    normalizes to exactly ONE token and the three tokens are distinct,
    so span_term values round-trip the analyzer unambiguously."""
    out = []
    for d in sorted(raw_by_id):
        words = raw_by_id[d].split()
        cands = []
        for w in words[:40]:
            t = tokenize_py(w)
            if len(t) == 1:
                cands.append((w, t[0]))
            if len(cands) == 3 and len({t for _, t in cands}) == 3:
                out.append(tuple(w for w, _ in cands))
                break
            if len(cands) == 3:
                cands.pop(0)
        if len(out) == 4:
            break
    return out


def _t(w):
    return {"span_term": {"content": w}}


def _queries(raw_by_id):
    triples = _word_triples(raw_by_id)
    assert len(triples) >= 3
    a, b, c = triples[0]
    d, e, f = triples[1]
    qs = [
        _t(a),
        {"span_near": {"clauses": [_t(a), _t(b)], "slop": 0,
                       "in_order": True}},
        {"span_near": {"clauses": [_t(a), _t(c)], "slop": 3,
                       "in_order": True}},
        {"span_near": {"clauses": [
            _t(a),
            {"span_or": {"clauses": [_t(b), _t(c)]}},
        ], "slop": 2, "in_order": True}},
        # unordered: clauses given in REVERSED text order still match
        {"span_near": {"clauses": [_t(b), _t(a)], "slop": 5}},
        {"span_or": {"clauses": [_t(a), _t(f)]}},
        {"span_not": {
            "include": {"span_near": {"clauses": [_t(d), _t(e)],
                                      "slop": 4, "in_order": True}},
            "exclude": _t(f), "pre": 1, "post": 1}},
        {"span_first": {"match": _t(a), "end": 8}},
        {"span_containing": {
            "big": {"span_near": {"clauses": [_t(a), _t(c)], "slop": 6,
                                  "in_order": True}},
            "little": _t(b)}},
        {"span_within": {
            "little": _t(b),
            "big": {"span_near": {"clauses": [_t(a), _t(c)], "slop": 6,
                                  "in_order": True}}}},
        {"span_near": {"clauses": [
            {"span_or": {"clauses": [_t(a), _t(d)]}},
            {"span_or": {"clauses": [_t(b), _t(e)]}},
        ], "slop": 4, "in_order": True}},
        # unknown term inside an OR — the other branch still matches
        {"span_or": {"clauses": [_t("zzzznotaterm"), _t(a)]}},
        # nested not inside near
        {"span_near": {"clauses": [
            {"span_not": {"include": _t(a), "exclude": _t(f)}},
            _t(b),
        ], "slop": 1, "in_order": True}},
    ]
    return qs, (a, b, c)


class TestSpanRankIdentity:
    def test_matches_oracle(self, spark, corpus):
        oracle, idx, raw = corpus
        qs, _ = _queries(raw)
        n_nonempty = 0
        for q in qs:
            expected = oracle.topk_spans(q, k=10)
            got = [
                (r["doc_id"], r["score"])
                for r in idx.search_spans(q, k=10, join_docs=False).collect()
            ]
            assert [x for x, _ in got] == [x for x, _ in expected], q
            for (_, x), (_, y) in zip(got, expected):
                assert abs(x - y) < 1e-9, q
            n_nonempty += bool(expected)
        # the battery must exercise real matches, not vacuous ties
        assert n_nonempty >= 8

    def test_ordered_near_slop0_equals_phrase(self, spark, corpus):
        """span_near(in_order, slop=0) over two adjacent-normalizing
        words == match_phrase of the same words (same pseudo-term
        scoring convention) — always, matches or not."""
        _, idx, raw = corpus
        _, (a, b, _c) = _queries(raw)
        near = {"span_near": {"clauses": [_t(a), _t(b)], "slop": 0,
                              "in_order": True}}
        sp = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_spans(near, k=20, join_docs=False).collect()
        ]
        ph = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_phrase(
                f"{a} {b}", k=20, join_docs=False
            ).collect()
        ]
        assert sp == ph

    def test_provably_empty(self, spark, corpus):
        _, idx, _ = corpus
        for q in [
            _t("zzzznotaterm"),
            _t("the"),  # stopword analyzes to zero tokens
            {"span_near": {"clauses": [_t("zzzznotaterm"), _t("the")],
                           "slop": 2, "in_order": True}},
        ]:
            assert idx.search_spans(q, k=5, join_docs=False).count() == 0

    def test_join_docs_shape(self, spark, corpus):
        _, idx, raw = corpus
        qs, _ = _queries(raw)
        rows = idx.search_spans(qs[0], k=3).collect()
        assert rows
        assert set(rows[0].asDict()) == {"doc_id", "score", "url", "title"}

    def test_span_multi_prefix(self, spark, corpus):
        """span_multi wrapping a prefix query == span_or of its
        dictionary expansions (Lucene SpanMultiTermQueryWrapper);
        rank-identity vs the oracle on the rewritten tree, and the
        rewrite composes inside span_near."""
        oracle, idx, raw = corpus
        _, (a, b, _c) = _queries(raw)
        stem = tokenize_py(a)[0]
        prefix = stem[:3]
        q = {"span_multi": {"match": {"prefix": {"content": prefix}}}}
        rewritten = idx.rewrite_span_multi(q)
        assert "span_or" in rewritten or "span_raw_term" in rewritten
        expected = oracle.topk_spans(rewritten, k=10)
        assert expected  # the prefix of a corpus term must match
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_spans(q, k=10, join_docs=False).collect()
        ]
        assert [x for x, _ in got] == [x for x, _ in expected]
        for (_, x), (_, y) in zip(got, expected):
            assert abs(x - y) < 1e-9

        near = {"span_near": {"clauses": [q, _t(b)], "slop": 3,
                              "in_order": True}}
        got2 = [
            (r["doc_id"], r["score"])
            for r in idx.search_spans(
                near, k=10, join_docs=False
            ).collect()
        ]
        exp2 = oracle.topk_spans(idx.rewrite_span_multi(near), k=10)
        assert [x for x, _ in got2] == [x for x, _ in exp2]

        # no expansions -> provably empty, not an error
        none = {"span_multi": {"match": {"prefix": {
            "content": "zzzznotaprefix"}}}}
        assert idx.search_spans(none, k=5, join_docs=False).count() == 0

    def test_refusals(self, spark, corpus):
        _, idx, _ = corpus
        with pytest.raises(NotImplementedError):
            idx.search_spans({"span_multi": {"match": {}}})
        with pytest.raises(NotImplementedError):
            idx.search_spans({"span_near": {"clauses": [
                _t("fox"),
                {"span_near": {"clauses": [_t("dog"), _t("river")],
                               "slop": 1, "in_order": True}},
            ], "slop": 2}})  # unordered over non-term clauses
        with pytest.raises(NotImplementedError):
            idx.search_spans(
                {"span_term": {"content": "quick brown"}}
            )  # multi-token value
        with pytest.raises(NotImplementedError):
            idx.search_spans({"span_term": {"lang": "en"}})

    def test_dsl_lowering(self, spark, corpus):
        oracle, idx, raw = corpus
        qs, _ = _queries(raw)
        body = {"query": qs[2], "size": 7}
        got = [
            (r["doc_id"], r["score"])
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        expected = oracle.topk_spans(qs[2], k=7)
        assert [x for x, _ in got] == [x for x, _ in expected]


class TestSpanEvaluatorProperties:
    """Hypothesis: the engine's DP/sweep evaluator (query/spans.py:
    eval_spans) must agree with the oracle's brute-force enumeration on
    random position lists and random span trees — no Spark involved,
    so edge cases run by the thousand."""

    def test_random_trees_agree_with_brute(self):
        import random

        from search_engine_spark.query.oracle import SpanOracle
        from search_engine_spark.query.spans import (
            eval_spans,
            parse_span_query,
        )

        rng = random.Random(20260819)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]

        def rand_tree(depth):
            roll = rng.random()
            if depth <= 0 or roll < 0.35:
                return {"span_term": {"content": rng.choice(words)}}
            if roll < 0.5:
                return {"span_or": {"clauses": [
                    rand_tree(depth - 1)
                    for _ in range(rng.randint(2, 3))
                ]}}
            if roll < 0.7:
                return {"span_near": {
                    "clauses": [rand_tree(depth - 1)
                                for _ in range(rng.randint(2, 3))],
                    "slop": rng.randint(0, 4), "in_order": True}}
            if roll < 0.8:
                return {"span_not": {
                    "include": rand_tree(depth - 1),
                    "exclude": rand_tree(depth - 1),
                    "pre": rng.randint(0, 2),
                    "post": rng.randint(0, 2)}}
            if roll < 0.9:
                return {"span_first": {"match": rand_tree(depth - 1),
                                       "end": rng.randint(1, 12)}}
            big, little = rand_tree(depth - 1), rand_tree(depth - 1)
            kind = rng.choice(["span_containing", "span_within"])
            return {kind: {"big": big, "little": little}}

        # brute-force via a tiny SpanOracle over one random doc at a
        # time (its span_scores path uses the independent evaluator)
        n_checked = 0
        for trial in range(300):
            doc = [rng.choice(words) for _ in range(rng.randint(4, 18))]
            tree = rand_tree(2)
            try:
                parse = parse_span_query(tree)
            except NotImplementedError:
                continue
            oracle = SpanOracle({0: list(doc)})
            # oracle tf via its own brute evaluation
            oscores = oracle.span_scores(tree)
            # engine evaluator tf on the same positions
            pos = [[] for _ in parse.terms]
            by_term = {t: i for i, t in enumerate(parse.terms)}
            for i, t in enumerate(doc):
                o = by_term.get(t)
                if o is not None:
                    pos[o].append(i)
            spans = eval_spans(parse.tree, pos)
            ptf = len(spans)
            if parse.required is None or not parse.positive_terms:
                assert not oscores
                continue
            req_ok = all(
                any(doc[p] == parse.terms[o] for p in range(len(doc)))
                for o in parse.required
            )
            if not req_ok or ptf == 0:
                assert 0 not in oscores, (tree, doc)
            else:
                # same tf => same score; compare through the score map
                assert 0 in oscores, (tree, doc)
                dl = len(doc)
                from search_engine_spark.index.scoring import B, K1

                idf_sum = sum(
                    oracle.idf(t)
                    for t in sorted(parse.positive_terms)
                    if oracle.df.get(t, 0) > 0
                )
                want = idf_sum * (ptf * (K1 + 1.0)) / (
                    ptf + K1 * (1.0 - B + B * dl / oracle.avgdl)
                )
                assert abs(oscores[0] - want) < 1e-9, (tree, doc)
            n_checked += 1
        assert n_checked > 200


class TestSpanMultiFuzzyAuto:
    def test_fuzzy_auto_inside_span_multi(self, spark, corpus):
        """fuzziness AUTO (the ES fuzzy default) must expand by the
        length tiers, not crash on int('AUTO')."""
        oracle, idx, raw = corpus
        _, (a, _b, _c) = _queries(raw)
        stem = tokenize_py(a)[0]
        typo = stem[:-1] + "x" if len(stem) >= 6 else stem
        q = {"span_multi": {"match": {"fuzzy": {"content": {
            "value": typo, "fuzziness": "AUTO"}}}}}
        rewritten = idx.rewrite_span_multi(q)
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_spans(q, k=10, join_docs=False).collect()
        ]
        exp = oracle.topk_spans(rewritten, k=10)
        assert [x for x, _ in got] == [x for x, _ in exp]
        assert got, "the AUTO expansion must recover the typo"
