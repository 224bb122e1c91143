"""BM25 scoring math — single source of truth.

The reference never configures Elasticsearch similarity, so its BM25 is
Lucene's default (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)));
we pin exactly that (SURVEY.md §3.4).  Three synchronized implementations:

- numpy (block packer / block-max metadata / WAND scorer)
- pyspark Column expressions (exhaustive DataFrame scoring mode)
- pure-Python scalar (the hermetic ranking oracle in tests)

A drift between them corrupts block-max pruning silently, so
tests/test_bm25.py asserts all three agree to 1e-9.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


# ---- idf ----------------------------------------------------------------

def idf_py(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_np(n_docs: int, df: np.ndarray) -> np.ndarray:
    df = df.astype(np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def idf_col(n_docs: Column | int, df: Column) -> Column:
    n = F.lit(n_docs) if not isinstance(n_docs, Column) else n_docs
    return F.log1p((n - df + F.lit(0.5)) / (df + F.lit(0.5)))


TFIDF_IDF_METHODS = ("standard", "smooth", "probabilistic", "max")


def tfidf_idf_py(
    method: str, n_docs: int, df: int, max_df: int | None = None
) -> float:
    """The reference's four TF-IDF IDF variants (tfidf.py:301-360),
    log10-based like everything in its TF-IDF ranker:

    - standard:       log10(N / df), 0 for unseen terms (tfidf.py:303-314)
    - smooth:         log10((N+1) / (df+1))            (tfidf.py:316-329)
    - probabilistic:  log10((N-df) / df), 0 when df==0 or df>=N
                      (Robertson-Sparck Jones; can be negative for
                      common terms — the B5 positive-score filter
                      drops those docs, same as the reference)
                      (tfidf.py:331-345)
    - max:            log10(max_df / (1+df)) where max_df is the
                      corpus-wide maximum document frequency
                      (tfidf.py:347-360)
    """
    if method == "standard":
        if df == 0 or n_docs == 0:
            return 0.0
        return math.log10(n_docs / df)
    if method == "smooth":
        return math.log10((n_docs + 1.0) / (df + 1.0))
    if method == "probabilistic":
        if df == 0 or df >= n_docs:
            return 0.0
        return math.log10((n_docs - df) / df)
    if method == "max":
        if not max_df:
            return 0.0
        return math.log10(max_df / (1.0 + df))
    raise ValueError(
        f"unknown tfidf idf method {method!r}; one of {TFIDF_IDF_METHODS}"
    )


# ---- tf normalization + full score --------------------------------------

def score_py(tf: int, dl: int, idf: float, avgdl: float) -> float:
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_np(
    tf: np.ndarray, dl: np.ndarray, idf: np.ndarray | float, avgdl: float
) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_col(tf: Column, dl: Column, idf: Column, avgdl: Column | float) -> Column:
    avg = F.lit(avgdl) if not isinstance(avgdl, Column) else avgdl
    return idf * (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / avg)
    )


def saturation_col(tf: Column, dl: Column, avgdl: float) -> Column:
    """The df-free factor of BM25: score = idf(df) * saturation(tf, dl).

    idf is constant within a term, so max(score) over a term's postings
    = idf * max(saturation) — term_stats computes df AND max_score in
    ONE aggregation pass instead of groupBy(df) -> join -> score ->
    groupBy(max), saving a full shuffle+join over the tf table."""
    return (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.lit(avgdl))
    )


def score_sql(tf: str, dl: str, df: str, n_docs: str, avgdl: str) -> str:
    """ANSI-SQL BM25 expression (DuckDB oracle parity)."""
    idf = f"ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"
    return (
        f"({idf}) * ({tf} * {K1 + 1.0}) / "
        f"({tf} + {K1} * (1.0 - {B} + {B} * {dl} / {avgdl}))"
    )
