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


def linear_fuse(
    frames: List[DataFrame],
    weights: Optional[List[float]] = None,
    normalizer: str = "minmax",
    k: int = 10,
    window_size: int = 100,
) -> Optional[DataFrame]:
    """Weighted score blend — the ES `linear` retriever (8.16+), the
    score-space sibling of rrf_fuse: fused = Σ_i w_i · norm_i(score_i)
    over each retriever's top window, docs absent from a window
    contribute 0 there.  Normalizers (per retriever window):

      minmax  (s − min) / (max − min); a degenerate window (all equal)
              normalizes to 1.0 — every doc is equally "best" (pinned;
              ES leaves this case underspecified)
      l2_norm s / sqrt(Σ s²)
      none    raw scores (only sane when scales already agree)

    One window pass per retriever for ranks + one tiny aggregate for
    the normalization constants, then the same union + groupBy(doc_id)
    shape as rrf_fuse."""
    if window_size < 1:
        raise ValueError("window_size must be >= 1")
    alive = [f for f in frames if f is not None]
    if not alive:
        return None
    norms = (
        [normalizer] * len(alive)
        if isinstance(normalizer, str)
        else list(normalizer)
    )
    if len(norms) != len(alive):
        raise ValueError("one normalizer per retriever")
    for nm in norms:
        if nm not in ("minmax", "l2_norm", "none"):
            raise ValueError(f"unknown normalizer {nm!r}")
    weights = (
        [1.0] * len(alive)
        if weights is None
        else [float(w) for w in weights]
    )
    if len(weights) != len(alive):
        raise ValueError("one weight per retriever")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    parts = []
    for f, wt, normalizer in zip(alive, weights, norms):
        win = (
            f.select("doc_id", "score")
            .withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= int(window_size))
            .drop("_rank")
        )
        if normalizer == "minmax":
            full = Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            mn = F.min("score").over(full)
            mx = F.max("score").over(full)
            norm = F.when(mx != mn, (F.col("score") - mn) / (mx - mn)) \
                .otherwise(F.lit(1.0))
        elif normalizer == "l2_norm":
            full = Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            l2 = F.sqrt(F.sum(F.col("score") * F.col("score")).over(full))
            norm = F.when(l2 > 0.0, F.col("score") / l2).otherwise(
                F.lit(0.0)
            )
        else:
            norm = F.col("score")
        parts.append(
            win.select(
                "doc_id", (F.lit(wt) * norm).alias("_c")
            )
        )
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
    return execute_es_retriever(
        idx, body, embeddings=embeddings, id_col=id_col,
        vec_col=vec_col, join_docs=join_docs,
    )


def _retriever_frame(idx, node, window, embeddings, id_col, vec_col):
    """Lower ONE retriever entry ({"standard": ...} | {"knn": ...}) to
    its top-window (doc_id, score) frame."""
    from search_engine_spark.query.dsl import (
        _as_list,
        _unsupported,
        execute_es_knn,
        execute_es_query,
    )

    if not isinstance(node, dict) or len(node) != 1:
        _unsupported("retriever entry must be a single-key object")
    kind, rbody = next(iter(node.items()))
    if kind == "standard":
        q = rbody["query"]
        filt = rbody.get("filter")
        if filt is not None:
            # ES applies the retriever-level filter to the standard
            # retriever's window — compose it as a bool filter so the
            # fusion never sees unfiltered candidates (shapes the bool
            # lowering can't take refuse loudly there)
            q = {"bool": {"must": [q], "filter": _as_list(filt)}}
        return execute_es_query(
            idx, {"query": q, "size": window},
            join_docs=False,
        )
    if kind == "knn":
        if embeddings is None:
            _unsupported("knn retriever without an embeddings table")
        return execute_es_knn(
            idx, {"knn": {**rbody, "k": window}}, embeddings,
            id_col=id_col, vec_col=vec_col, join_docs=False,
        )
    _unsupported(f"retriever kind {kind!r} (standard/knn)")


def execute_es_retriever(
    idx,
    body: Dict,
    embeddings: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    join_docs: bool = True,
) -> DataFrame:
    """Run an ES retriever-API body — `rrf` (rank fusion) or `linear`
    (weighted normalized score blend, per-entry weight/normalizer:
    {"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {...}}, "weight": 2.0,
         "normalizer": "minmax"}, ...]}}})."""
    from search_engine_spark.query.dsl import _unsupported

    retr = body.get("retriever")
    if not isinstance(retr, dict) or len(retr) != 1:
        _unsupported("body without a single-key retriever root")
    root, spec = next(iter(retr.items()))
    k = int(body.get("size", 10))
    window = int(spec.get("rank_window_size", 100))
    rlist = spec.get("retrievers") or []
    if len(rlist) < 2:
        _unsupported(f"{root} needs at least two retrievers")

    if root == "rrf":
        frames = [
            _retriever_frame(idx, n, window, embeddings, id_col, vec_col)
            for n in rlist
        ]
        fused = rrf_fuse(
            frames, k=k,
            rank_constant=int(spec.get("rank_constant", 60)),
            window_size=window,
        )
    elif root == "linear":
        frames, weights, norms = [], [], []
        for entry in rlist:
            if not isinstance(entry, dict) or "retriever" not in entry:
                _unsupported("linear entry without a retriever")
            frames.append(
                _retriever_frame(
                    idx, entry["retriever"], window, embeddings,
                    id_col, vec_col,
                )
            )
            weights.append(float(entry.get("weight", 1.0)))
            # ES's linear retriever defaults normalizer to "none"
            # (no rescaling) when the entry omits it.
            norms.append(entry.get("normalizer", "none"))
        fused = linear_fuse(
            frames, weights=weights, normalizer=norms, k=k,
            window_size=window,
        )
    else:
        _unsupported(f"retriever root {root!r} (rrf/linear)")
    if fused is None:
        return idx._empty_scored(join_docs)
    return idx._join_docs(fused) if join_docs else fused
