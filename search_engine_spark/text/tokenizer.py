"""Canonical tokenizer — the reference's TF-IDF text pipeline, Spark-first.

Semantics (backend/ranking_service/tfidf.py:111-144):
  1. lowercase
  2. replace every char not in [a-z0-9\\s] with a space
  3. split on whitespace
  4. drop stopwords (pinned list, stopwords.py)
  5. drop tokens shorter than 2 chars
  6. Porter-stem each token

Steps 1-5 are pure Spark column expressions (JVM-side, codegen'd).
Step 6 (stemming) is the only Python step; at scale we do NOT stem the
token stream — we stem the *vocabulary* (distinct raw terms) with an
Arrow-vectorized pandas UDF and join the mapping back.  The token stream
at 10^12-doc scale is ~10^15 tokens; the vocabulary is ~10^8 — stemming
the vocab is 10^7x less Python work.

`tokenize_py` is the byte-for-byte pure-Python equivalent used by the
driver-side query normalizer and the ranking oracle in tests.
"""

from __future__ import annotations

import re
from typing import Iterable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from search_engine_spark.text.porter import porter_stem
from search_engine_spark.text.stopwords import STOPWORDS, STOPWORDS_SORTED

_NON_ALNUM = re.compile(r"[^a-z0-9\s]")

# ---------------------------------------------------------------------------
# Pure-Python oracle / driver-side path
# ---------------------------------------------------------------------------


def tokenize_py(text: str, stem: bool = True) -> List[str]:
    """Reference-semantics tokenizer (tfidf.py:111-144), pure Python."""
    if not text:
        return []
    text = _NON_ALNUM.sub(" ", text.lower())
    tokens = [t for t in text.split() if t not in STOPWORDS and len(t) >= 2]
    if stem:
        tokens = [porter_stem(t) for t in tokens]
    return tokens


def tokenize_py_cached(text: str, stem_cache: dict) -> List[str]:
    """tokenize_py with a caller-owned stem memo — the hot path inside
    the fused extract+tokenize Arrow UDF (text.extract): each distinct
    term is Porter-stemmed once per worker, every repeat is a dict hit.
    Output is identical to tokenize_py(text)."""
    if not text:
        return []
    text = _NON_ALNUM.sub(" ", text.lower())
    out = []
    get = stem_cache.get
    for t in text.split():
        if len(t) < 2 or t in STOPWORDS:
            continue
        s = get(t)
        if s is None:
            s = porter_stem(t)
            stem_cache[t] = s
        out.append(s)
    return out


def analyze(text: str, explain: bool = False):
    """The ES `_analyze` API over the canonical pipeline: how a piece
    of text analyzes, token by token — the introspection endpoint an
    ES user debugs analyzers with (the reference's index relies on
    ES's `english` analyzer for the same stages, main.py:68-70).

    Default shape (ES `tokens` list): one dict per emitted token —
    `token` (stemmed), `start_offset`/`end_offset` (char span of the
    ORIGINAL surface form; spans are computed on the lowercased,
    punctuation-blanked text, whose char positions map 1:1 to the
    input for ASCII), `position` (0-based offset in the FILTERED
    stream — the convention positional postings and phrase search
    use, i.e. stopwords consume no position increment).

    explain=True (ES `explain` detail): dict of per-stage outputs —
    `charfilter` (lowercase + pattern-blank), `tokenizer` (whitespace
    split), `stop_filter`, `length_filter`, `porter_stem` — each the
    surviving token list after that stage, so a missing query hit can
    be blamed on the exact stage that ate the token.

    Invariant: [t["token"] for t in analyze(x)] == tokenize_py(x) —
    pinned in tests, since a drift here would make the debugging API
    lie about the real pipeline."""
    cleaned = _NON_ALNUM.sub(" ", (text or "").lower())
    raw = [(m.group(0), m.start(), m.end()) for m in re.finditer(r"\S+", cleaned)]
    post_stop = [r for r in raw if r[0] not in STOPWORDS]
    post_len = [r for r in post_stop if len(r[0]) >= 2]
    tokens = [
        {
            "token": porter_stem(t),
            "start_offset": s,
            "end_offset": e,
            "position": i,
        }
        for i, (t, s, e) in enumerate(post_len)
    ]
    if not explain:
        return tokens
    return {
        "charfilter": cleaned,
        "tokenizer": [t for t, _, _ in raw],
        "stop_filter": [t for t, _, _ in post_stop],
        "length_filter": [t for t, _, _ in post_len],
        "porter_stem": [d["token"] for d in tokens],
        "tokens": tokens,
    }


# ---------------------------------------------------------------------------
# Spark-native path (steps 1-5; no Python in the row path)
# ---------------------------------------------------------------------------


def raw_tokens_col(text: Column) -> Column:
    """Steps 1-5 as native column expressions.

    Returns array<string> of lowercased, punctuation-stripped,
    stopword-free tokens of length >= 2 — duplicates preserved (TF needs
    multiplicity, so no array_except, which would dedup).
    """
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_SORTED])
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    toks = F.split(F.trim(F.regexp_replace(cleaned, r"\s+", " ")), " ")
    toks = F.filter(
        toks,
        lambda t: (F.length(t) >= 2) & ~F.array_contains(stop_arr, t),
    )
    # split("") yields [""] — normalize empties away via the length filter
    return toks


def tokens_col(text: Column) -> Column:
    """Full pipeline including stemming, as an array column.

    Convenience for small/medium flows and tests.  Large index builds
    should instead explode `raw_tokens_col` and stem the distinct-term
    dimension (see index.builder) so Python touches only the vocabulary.
    """
    return stem_tokens_udf(raw_tokens_col(text))


# Arrow-vectorized stemming over token arrays (convenience path).
@F.pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tok_arrays: pd.Series) -> pd.Series:
    cache: dict = {}

    def stem_list(toks: Iterable[str]) -> List[str]:
        out = []
        for t in toks:
            s = cache.get(t)
            if s is None:
                s = porter_stem(t)
                cache[t] = s
            out.append(s)
        return out

    return tok_arrays.map(lambda a: stem_list(a) if a is not None else None)


# Arrow-vectorized stemming over a scalar term column (vocabulary path).
@F.pandas_udf(StringType())
def stem_terms_udf(terms: pd.Series) -> pd.Series:
    cache: dict = {}

    def stem_one(t):
        if t is None:
            return None
        s = cache.get(t)
        if s is None:
            s = porter_stem(t)
            cache[t] = s
        return s

    return terms.map(stem_one)
