"""ES percolator as a batch operator — reverse search.

The percolate API (ES `percolate` query over an index of stored
queries) answers "which saved queries match this document?" — the
alerting/saved-search use case.  The reference owns no percolator; it
is part of the ES surface its indexer builds against
(backend/indexer_service/indexer.py:163-206).  In batch form it is a
natural Spark join: N incoming documents × Q stored queries in ONE
pass, where ES would percolate document-by-document.

Physical shape (designed for huge `docs`, modest `queries` — the
alerting norm of millions of docs × thousands of rules):

  queries → analyze (same canonical tokenizer as the index) →
            explode distinct terms → (query_id, term, n_terms, op)
  docs    → analyze → explode distinct terms → (doc_id, term)
  ⋈ on term (queries side BROADCAST by default — no doc shuffle)
  → groupBy(doc_id, query_id) count            [partial agg map-side]
  → keep count == n_terms (AND) / count ≥ 1 (OR) / count ≥ msm

The join output is bounded by Σ over query terms of df(term) — the
same posting mass a per-document ES percolation would touch, paid once
for the whole batch.  Stopwords are already stripped by the analyzer,
so Zipf-head terms never reach the join from the query side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.text.tokenizer import tokens_col


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    operator_col: str | None = None,
    min_should_match_col: str | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Match every document against every stored query in one pass.

    docs: (id_col, text_col, ...); queries: (query_id_col, query_col
    [, operator_col with 'or'/'and' per row][, min_should_match_col
    int, 0 = unset]).  Returns (doc_id, query_id, matched_terms,
    n_terms, operator) — one row per (document, matching query), in no
    particular order (add orderBy at the call site for determinism).

    Matching mirrors the engine's match semantics: a query's analyzed
    DISTINCT terms; 'or' needs ≥1 present in the doc, 'and' needs all,
    a positive min_should_match needs that many (clause-count
    semantics, like search(min_should_match=)).  Queries whose text
    analyzes to nothing (stopword-only) match nothing, like an ES
    match query with an empty analyzed token list.
    """
    op = (
        F.lower(F.col(operator_col))
        if operator_col
        else F.lit("or")
    )
    msm = (
        F.coalesce(F.col(min_should_match_col), F.lit(0))
        if min_should_match_col
        else F.lit(0)
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.array_distinct(tokens_col(F.col(query_col))).alias("_qterms"),
            op.alias("operator"),
            msm.cast("int").alias("_msm"),
        )
        .withColumn("n_terms", F.size("_qterms"))
        .filter(F.col("n_terms") > 0)
        .select(
            "query_id",
            "operator",
            "n_terms",
            "_msm",
            F.explode("_qterms").alias("term"),
        )
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    )
    qj = F.broadcast(q) if broadcast_queries else q
    pairs = d.join(qj, "term").groupBy("doc_id", "query_id").agg(
        F.count(F.lit(1)).alias("matched_terms"),
        F.first("n_terms").alias("n_terms"),
        F.first("operator").alias("operator"),
        F.first("_msm").alias("_msm"),
    )
    # operator=and wins over min_should_match — the engine's search
    # (and ES) applies msm only to OR modes, so an AND query requires
    # EVERY term even when a msm is also present
    required = (
        F.when(F.col("operator") == "and", F.col("n_terms"))
        .when(F.col("_msm") > 0, F.col("_msm"))
        .otherwise(F.lit(1))
    )
    return pairs.filter(F.col("matched_terms") >= required).select(
        "doc_id", "query_id", "matched_terms", "n_terms", "operator"
    )
