"""Reciprocal-rank fusion — the ES `retriever`/`rrf` hybrid API.

Modern ES (8.14+) fuses heterogeneous retrievers — typically BM25 and
kNN — by RANK rather than score, sidestepping incomparable score
scales: each retriever contributes 1 / (rank_constant + rank) for every
doc in its top `rank_window_size`, and docs are ordered by the summed
contribution (Cormack & Clarke 2009; ES defaults rank_constant=60,
window=100... ES calls it rank_window_size).  The reference's hybrid
re-rank (backend/search_api/main.py:243-267, 0.7·BM25 + 0.3·PageRank)
is the score-blend ancestor of this rank-blend.

Spark shape: each retriever's frame is already a k-bounded top-window
(TakeOrderedAndProject); ranking within a window is a row_number over
window-sized rows, the union is retriever-count × window rows, and ONE
groupBy(doc_id) sums the contributions — all tiny, serving-shaped work
on top of whatever each retriever's own plan cost.

Determinism: per-retriever ranks break ties (score desc, doc_id asc) —
the engine's total order — and the fused list breaks ties
(rrf desc, doc_id asc).
"""
from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    frames: List[DataFrame],
    k: int = 10,
    rank_constant: int = 60,
    window_size: int = 100,
) -> Optional[DataFrame]:
    """Fuse (doc_id, score)-shaped frames by reciprocal rank.

    Each frame is cut to its top `window_size` by (score desc, doc_id
    asc); a doc's fused score sums 1/(rank_constant + rank) over the
    frames whose window contains it.  Returns the top-k fused
    (doc_id, score) or None when every frame is None/empty."""
    if rank_constant < 1:
        raise ValueError("rank_constant must be >= 1")
    if window_size < 1:
        raise ValueError("window_size must be >= 1")
    parts = []
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    for f in frames:
        if f is None:
            continue
        parts.append(
            f.select("doc_id", "score")
            .withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= int(window_size))
            .select(
                "doc_id",
                (1.0 / (F.lit(float(rank_constant)) + F.col("_rank")))
                .alias("_c"),
            )
        )
    if not parts:
        return None
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("doc_id")
        .agg(F.sum("_c").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def execute_es_rrf(
    idx,
    body: Dict,
    embeddings: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    join_docs: bool = True,
) -> DataFrame:
    """Run an ES retriever-API body with an `rrf` root:

        {"retriever": {"rrf": {
             "retrievers": [{"standard": {"query": {...}}},
                            {"knn": {"query_vector": [...],
                                     "k": n, "filter": [...]}}],
             "rank_constant": 60, "rank_window_size": 100}},
         "size": 10}

    standard retrievers lower through execute_es_query (any supported
    query shape); knn retrievers need the `embeddings` table (the
    index stores no vectors — same contract as execute_es_knn).
    """
    from search_engine_spark.query.dsl import (
        _unsupported,
        execute_es_knn,
        execute_es_query,
    )

    retr = body.get("retriever")
    if not isinstance(retr, dict) or set(retr) != {"rrf"}:
        _unsupported("retriever body without an rrf root")
    spec = retr["rrf"]
    rlist = spec.get("retrievers") or []
    if len(rlist) < 2:
        _unsupported("rrf needs at least two retrievers")
    rank_constant = int(spec.get("rank_constant", 60))
    window = int(spec.get("rank_window_size", 100))
    k = int(body.get("size", 10))

    frames = []
    for node in rlist:
        if not isinstance(node, dict) or len(node) != 1:
            _unsupported("retriever entry must be a single-key object")
        kind, rbody = next(iter(node.items()))
        if kind == "standard":
            frames.append(
                execute_es_query(
                    idx,
                    {"query": rbody["query"], "size": window},
                    join_docs=False,
                )
            )
        elif kind == "knn":
            if embeddings is None:
                _unsupported("knn retriever without an embeddings table")
            frames.append(
                execute_es_knn(
                    idx,
                    {"knn": {**rbody, "k": window}},
                    embeddings,
                    id_col=id_col,
                    vec_col=vec_col,
                    join_docs=False,
                )
            )
        else:
            _unsupported(f"retriever kind {kind!r} (standard/knn)")
    fused = rrf_fuse(
        frames, k=k, rank_constant=rank_constant, window_size=window
    )
    if fused is None:
        return idx._empty_scored(join_docs)
    return idx._join_docs(fused) if join_docs else fused
