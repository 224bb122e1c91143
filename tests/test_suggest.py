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
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
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
