"""Boolean query parsing (reference QueryProcessor.parse_query shape,
tfidf.py:589-626) and the pure-Python boolean-ranking oracle.

Spark-free: engine-vs-oracle rank identity for search_boolean lives in
tests/test_index_and_query.py (shares the built-index fixture)."""

from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.query.parse import parse_query
from search_engine_spark.text.tokenizer import tokenize_py


class TestParse:
    def test_simple_query(self):
        p = parse_query("python programming tutorial")
        assert p.terms == tokenize_py("python programming tutorial")
        assert p.not_terms == [] and p.phrases == []
        assert p.operators == {"and": False, "or": False, "not": False}

    def test_phrase_extraction(self):
        # reference shape: phrases pulled out, remainder tokenized
        p = parse_query('machine learning "neural networks" tutorial')
        assert p.phrases == ["neural networks"]
        assert p.terms == tokenize_py("machine learning tutorial")

    def test_operator_flags(self):
        assert parse_query("cats AND dogs").operators["and"]
        assert parse_query("cats OR dogs").operators["or"]
        assert parse_query("cats NOT dogs").operators["not"]
        # reference detects via .upper() -> case-insensitive
        assert parse_query("cats and dogs").operators["and"]
        assert parse_query("cats not dogs").operators["not"]
        # no false positives on substrings ("android" holds "and")
        ops = parse_query("android brandy").operators
        assert ops == {"and": False, "or": False, "not": False}

    def test_not_splits_operands(self):
        p = parse_query("python tutorial NOT snake")
        assert p.terms == tokenize_py("python tutorial")
        assert p.not_terms == tokenize_py("snake")

    def test_multiple_not_segments(self):
        p = parse_query("python NOT snake NOT reptile venom")
        assert p.terms == tokenize_py("python")
        assert sorted(p.not_terms) == sorted(tokenize_py("snake reptile venom"))

    def test_operator_words_never_leak_as_terms(self):
        # "or" is NOT in the pinned stopword list -> must be stripped
        # explicitly or it would leak into the term list
        p = parse_query("cats OR dogs")
        assert p.terms == tokenize_py("cats dogs")
        assert "or" not in p.terms

    def test_pure_negation(self):
        p = parse_query("NOT spam")
        assert p.terms == []
        assert p.not_terms == tokenize_py("spam")

    def test_phrase_plus_boolean(self):
        p = parse_query('"exact phrase" alpha AND beta NOT gamma')
        assert p.phrases == ["exact phrase"]
        assert p.terms == tokenize_py("alpha beta")
        assert p.not_terms == tokenize_py("gamma")
        assert p.operators["and"] and p.operators["not"]
        assert p.positive_and  # the AND sits between positive operands

    def test_negated_phrase_lands_in_not_phrases(self):
        p = parse_query('python NOT "snake venom"')
        assert p.terms == tokenize_py("python")
        assert p.phrases == [] and p.not_phrases == ["snake venom"]
        assert p.operators["not"]

    def test_not_inside_quotes_does_not_split(self):
        p = parse_query('"do not go" beta')
        assert p.phrases == ["do not go"]
        assert p.not_phrases == [] and p.not_terms == []
        assert not p.operators["not"]  # reference: flags on phrase-free rest

    def test_and_between_negated_operands_is_not_positive_and(self):
        p = parse_query("spark flink NOT hadoop AND hive")
        assert p.operators["and"]  # reference-faithful global flag
        assert not p.positive_and  # but execution must stay disjunctive
        assert p.terms == tokenize_py("spark flink")
        assert sorted(p.not_terms) == sorted(tokenize_py("hadoop hive"))

    def test_mixed_polarity_phrases(self):
        p = parse_query('"alpha beta" gamma NOT "delta epsilon" zeta')
        assert p.phrases == ["alpha beta"]
        assert p.not_phrases == ["delta epsilon"]
        assert p.terms == tokenize_py("gamma")
        assert p.not_terms == tokenize_py("zeta")


def _mk_oracle():
    docs = {
        1: tokenize_py("python programming language tutorial guide"),
        2: tokenize_py("python snake reptile venom danger"),
        3: tokenize_py("programming tutorial for java developers"),
        4: tokenize_py("python programming snake handling tutorial"),
        5: tokenize_py("cooking recipes pasta dinner"),
    }
    return BM25Oracle(docs)


class TestBooleanOracle:
    def test_not_excludes(self):
        o = _mk_oracle()
        got = {d for d, _ in o.topk_boolean("python NOT snake", k=10)}
        assert got == {1}  # 2 and 4 hold "snake", 3/5 lack "python"

    def test_or_default_matches_topk(self):
        o = _mk_oracle()
        assert o.topk_boolean("python tutorial", k=10) == o.topk(
            "python tutorial", k=10
        )

    def test_and_conjunctive(self):
        o = _mk_oracle()
        got = {d for d, _ in o.topk_boolean("python AND tutorial", k=10)}
        assert got == {1, 4}
        assert o.topk_boolean("python AND tutorial", k=10) == o.topk_and(
            "python tutorial", k=10
        )

    def test_and_with_not(self):
        o = _mk_oracle()
        got = {d for d, _ in o.topk_boolean("python AND tutorial NOT snake", k=10)}
        assert got == {1}

    def test_scores_ignore_negation(self):
        # must_not is filter context: surviving docs score exactly as
        # the plain positive-terms query
        o = _mk_oracle()
        plain = dict(o.topk("python tutorial", k=10))
        for d, s in o.topk_boolean("python tutorial NOT java", k=10):
            assert abs(s - plain[d]) < 1e-12

    def test_pure_negation_empty(self):
        assert _mk_oracle().topk_boolean("NOT python", k=10) == []

    def test_negated_phrase_excludes_matching_docs(self):
        o = _mk_oracle()
        # docs 2 and 4 contain the contiguous (filtered) token pair
        # "python snake"... doc 2: python snake reptile; doc 4: python
        # programming snake (NOT contiguous) -> only doc 2 excluded
        got = {d for d, _ in o.topk_boolean('python NOT "python snake"', k=10)}
        assert 2 not in got and 4 in got and 1 in got

    def test_unindexed_negated_phrase_excludes_nothing(self):
        o = _mk_oracle()
        assert o.topk_boolean(
            'python NOT "zzzz qqqq"', k=10
        ) == o.topk("python", k=10)

    def test_and_in_not_segment_stays_disjunctive(self):
        o = _mk_oracle()
        # AND binds the two negated operands' segment, not the positives
        got = {
            d for d, _ in o.topk_boolean(
                "python tutorial NOT cooking AND pasta", k=10
            )
        }
        assert got == {1, 2, 4, 3}  # OR semantics; only doc 5 excluded
