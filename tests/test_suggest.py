"""ES term suggester ("did you mean") vs a pure-Python oracle.

The reference delegates spelling/suggestion to the ES surface; here
`BM25Index.suggest_terms` replicates the ES `term` suggester defaults
(max_edits 2, prefix_length 1, min_word_length 4, suggest_mode
missing/popular/always, score = normalized Levenshtein similarity,
order score desc → df desc → term asc) in one broadcast theta-join
pass over the dictionary.
"""

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 300


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sugg"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8,
        index_shingles=True,
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle = BM25Oracle(
        {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    )
    return paths, oracle


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _suggest_oracle(
    df_map,
    text,
    size=5,
    max_edits=2,
    prefix_length=1,
    min_word_length=4,
    suggest_mode="missing",
):
    toks = sorted(
        {t for t in set(tokenize_py(text)) if len(t) >= min_word_length}
    )
    out = []
    for tok in toks:
        tdf = df_map.get(tok, 0)
        if suggest_mode == "missing" and tdf > 0:
            continue
        cands = []
        for term, df in df_map.items():
            if term == tok or abs(len(term) - len(tok)) > max_edits:
                continue
            if prefix_length and term[:prefix_length] != tok[:prefix_length]:
                continue
            d = _lev(term, tok)
            if d > max_edits:
                continue
            if suggest_mode == "popular" and df <= tdf:
                continue
            cands.append(
                (tok, term, 1.0 - d / max(len(term), len(tok)), df)
            )
        cands.sort(key=lambda x: (-x[2], -x[3], x[1]))
        out.extend(cands[:size])
    return out


def _collect(df):
    return [
        (r["token"], r["suggestion"], round(r["score"], 9), r["df"])
        for r in df.collect()
    ]


class TestSuggestTerms:
    @pytest.mark.parametrize(
        "text",
        [
            "pythoon programing tutorail",
            "databse transacton",
            "machne lerning",
        ],
    )
    def test_missing_mode_matches_oracle(self, spark, corpus, text):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = _collect(idx.suggest_terms(text))
        want = [
            (t, s, round(sc, 9), df)
            for t, s, sc, df in _suggest_oracle(dict(oracle.df), text)
        ]
        assert got == want, text

    def test_missing_skips_indexed_tokens(self, spark, corpus):
        """A correctly-spelled (indexed) token yields no suggestions in
        the default missing mode."""
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        term = tokenize_py("python")[0]
        assert oracle.df.get(term, 0) > 0
        assert _collect(idx.suggest_terms("python")) == []

    def test_always_mode_never_suggests_the_input(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = _collect(idx.suggest_terms("python", suggest_mode="always"))
        want = [
            (t, s, round(sc, 9), df)
            for t, s, sc, df in _suggest_oracle(
                dict(oracle.df), "python", suggest_mode="always"
            )
        ]
        assert rows == want
        term = tokenize_py("python")[0]
        assert all(s != term for _, s, _, _ in rows)

    def test_popular_mode_requires_higher_df(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        text = "python database"
        rows = _collect(idx.suggest_terms(text, suggest_mode="popular"))
        want = [
            (t, s, round(sc, 9), df)
            for t, s, sc, df in _suggest_oracle(
                dict(oracle.df), text, suggest_mode="popular"
            )
        ]
        assert rows == want
        for tok, _, _, df in rows:
            assert df > oracle.df.get(tok, 0)

    def test_min_word_length_gate(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        # tokens shorter than min_word_length are never suggested for
        assert _collect(idx.suggest_terms("fx zz", min_word_length=4)) == []

    def test_bad_mode_raises(self, spark, corpus):
        paths, *_ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError):
            idx.suggest_terms("python", suggest_mode="nope")


# ---------------------------------------------------------------------------
# phrase suggester
# ---------------------------------------------------------------------------

# misspellings of corpus vocabulary (synth topics: python/spark/search/
# web terms) — one error, two errors, already-correct, and garbage
PHRASE_QUERIES = [
    "pythn programming tutorial",
    "machne learnin model",
    "python programming",          # fully correct input
    "qzqzqz wwwwqq",               # no dictionary candidates
    "distributed processng cluster",
]


class TestPhraseSuggester:
    def _oracle(self, oracle):
        from search_engine_spark.query.oracle import PhraseSuggestOracle

        return PhraseSuggestOracle(oracle.docs)

    @pytest.mark.parametrize("q", PHRASE_QUERIES)
    def test_rank_identity(self, spark, corpus, q):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        got = [
            (r["suggestion"], r["score"])
            for r in idx.suggest_phrase(q, size=5).collect()
        ]
        want = self._oracle(oracle).suggest(q, size=5)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    def test_max_errors_two(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = "pythn programing tutorial"
        got = [
            (r["suggestion"], r["score"])
            for r in idx.suggest_phrase(q, size=8, max_errors=2).collect()
        ]
        want = self._oracle(oracle).suggest(q, size=8, max_errors=2)
        assert [g[0] for g in got] == [w[0] for w in want]

    def test_confidence_gate(self, spark, corpus):
        """confidence=0 returns every candidate beating score 0; a huge
        confidence returns nothing for an already-likely input."""
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        lo = idx.suggest_phrase(
            "python programming", size=5, confidence=0.0
        ).count()
        hi = idx.suggest_phrase(
            "python programming", size=5, confidence=1e9
        ).count()
        assert lo >= hi
        assert hi == 0

    def test_correct_input_never_suggested(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = idx.suggest_phrase(
            "python programming", size=10, confidence=0.0
        ).collect()
        assert "python program" not in []  # placeholder sanity
        assert all(
            r["suggestion"] != " ".join(tokenize_py("python programming"))
            for r in rows
        )

    def test_requires_shingles(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("nosh"))
        pages = synth_pages(spark, 40, num_partitions=2)
        paths = build_index(
            spark, pages, root, num_buckets=4, block_size=32,
            num_partitions=2,
        )
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        with pytest.raises(ValueError, match="shingle"):
            idx.suggest_phrase("pythn tutorial")

    def test_empty_text(self, spark, corpus):
        paths, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        df = idx.suggest_phrase("the of and")  # stopword-only -> no tokens
        assert df.columns == ["suggestion", "score"]
        assert df.count() == 0


class TestCompletionSuggester:
    def test_matches_df_order(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        rows = [
            (r["suggestion"], r["weight"])
            for r in idx.suggest_completion("pro", size=5).collect()
        ]
        want = sorted(
            (
                (t, df)
                for t, df in oracle.df.items()
                if t.startswith("pro") and "!" not in t
            ),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        assert rows == want

    def test_last_token_completed(self, spark, corpus):
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        a = idx.suggest_completion("machine le", size=5).collect()
        b = idx.suggest_completion("le", size=5).collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]

    def test_empty_prefix(self, spark, corpus):
        paths, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        df = idx.suggest_completion("the")  # stopword-only
        assert df.columns == ["suggestion", "weight"] and df.count() == 0


class TestPhraseCollate:
    def test_collate_prunes_non_matching(self, spark, corpus):
        """Every collated suggestion has at least one live doc
        containing ALL its terms; collated output is a subset of the
        uncollated cut in the same order (the ES prune semantics)."""
        paths, oracle = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = "machne learnin model"
        plain = [
            (r["suggestion"], r["score"])
            for r in idx.suggest_phrase(q, size=5, max_errors=2).collect()
        ]
        coll = [
            (r["suggestion"], r["score"])
            for r in idx.suggest_phrase(
                q, size=5, max_errors=2, collate=True
            ).collect()
        ]
        assert [c for c in plain if c in coll] == coll  # ordered subset
        for s, _ in coll:
            terms = s.split(" ")
            docs_with_all = [
                d for d, tf in oracle.tf.items()
                if all(t in tf for t in terms)
            ]
            assert docs_with_all, s
        # and anything pruned really had no AND-match
        for s, _ in plain:
            if (s, dict(plain)[s]) not in coll:
                terms = s.split(" ")
                assert not any(
                    all(t in tf for t in terms) for tf in oracle.tf.values()
                ), s

    def test_collate_via_dsl(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_suggest

        paths, _ = corpus
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        body = {"suggest": {"dym": {
            "text": "machne learnin model",
            "phrase": {"size": 3, "max_errors": 2,
                       "collate": {"prune": True}},
        }}}
        got = execute_es_suggest(idx, body)["dym"].collect()
        direct = idx.suggest_phrase(
            "machne learnin model", size=3, max_errors=2, collate=True
        ).collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in direct]
