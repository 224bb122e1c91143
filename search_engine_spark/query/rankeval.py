"""Ranking evaluation — the ES `_rank_eval` API, Spark-first.

The reference serves its index through Elasticsearch 8.11
(docker-compose.yml:6-36), whose `_rank_eval` endpoint scores a set of
(query, judged-documents) requests against the live ranking; the
reference itself never calls it, but a search team migrating from the
reference would.  This runs the SAME shape as a batch job:

    requests = [{"id": "q1",
                 "request": {"query": {"match": {"content": "..."}}},
                 "ratings": [{"_id": 7, "rating": 3}, ...]}, ...]
    rank_eval(idx, requests, metric={"precision": {"k": 10}})

Metrics (ES's set, pinned semantics):

- precision {k, relevant_rating_threshold}: fraction of the top-k that
  is judged relevant (rating >= threshold, default 1).  Unjudged docs
  count as NOT relevant (ES default ignore_unlabeled=false).
- recall {k, relevant_rating_threshold}: fraction of all judged-
  relevant docs that appear in the top-k.
- mean_reciprocal_rank {k, relevant_rating_threshold}: 1/rank of the
  first relevant hit in the top-k, 0 if none.
- dcg {k, normalize}: Σ (2^rating − 1) / log2(rank + 1) over the
  top-k (unjudged = rating 0); normalize=True divides by the ideal
  DCG over the request's OWN ratings (NDCG).
- expected_reciprocal_rank {k, maximum_relevance}: ERR with
  R_i = (2^rating − 1) / 2^max_rel (Chapelle et al. 2009), the ES
  err metric.

Each request's top-k is ONE engine query (any shape execute_es_query
lowers); the judged-ratings list is tiny and evaluated driver-side —
exactly where ES's coordinating node does this reduction.  Returns
{"metric_score": mean over requests, "details": {id: {"metric_score",
"hits": [(doc_id, rating|None)]}}}.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple


def _metric_score(
    kind: str,
    spec: Dict,
    ranked: List[int],
    ratings: Dict[int, int],
) -> float:
    k = int(spec.get("k", 10))
    top = ranked[:k]
    thr = int(spec.get("relevant_rating_threshold", 1))
    if kind == "precision":
        if not top:
            return 0.0
        rel = sum(1 for d in top if ratings.get(d, 0) >= thr)
        return rel / len(top)
    if kind == "recall":
        total_rel = sum(1 for r in ratings.values() if r >= thr)
        if total_rel == 0:
            return 0.0
        rel = sum(1 for d in top if ratings.get(d, 0) >= thr)
        return rel / total_rel
    if kind == "mean_reciprocal_rank":
        for i, d in enumerate(top, 1):
            if ratings.get(d, 0) >= thr:
                return 1.0 / i
        return 0.0
    if kind == "dcg":
        dcg = sum(
            (2.0 ** ratings.get(d, 0) - 1.0) / math.log2(i + 1)
            for i, d in enumerate(top, 1)
        )
        if not spec.get("normalize", False):
            return dcg
        ideal = sorted(ratings.values(), reverse=True)[:k]
        idcg = sum(
            (2.0 ** r - 1.0) / math.log2(i + 1)
            for i, r in enumerate(ideal, 1)
        )
        return dcg / idcg if idcg > 0 else 0.0
    if kind == "expected_reciprocal_rank":
        max_rel = int(spec.get("maximum_relevance", 4))
        bad = [v for v in ratings.values() if v > max_rel]
        if bad:
            # ES rejects ratings above maximum_relevance; letting one
            # through yields a stop-"probability" > 1 and a negative
            # carry that silently corrupts the averaged score
            raise ValueError(
                f"rating(s) {sorted(set(bad))} exceed "
                f"maximum_relevance={max_rel}"
            )
        p_stop = 1.0
        err = 0.0
        for i, d in enumerate(top, 1):
            r = (2.0 ** ratings.get(d, 0) - 1.0) / (2.0 ** max_rel)
            err += p_stop * r / i
            p_stop *= 1.0 - r
        return err
    raise NotImplementedError(f"rank_eval metric {kind!r}")


def rank_eval(
    idx,
    requests: List[Dict],
    metric: Optional[Dict] = None,
) -> Dict:
    """Evaluate judged queries against the engine's live ranking.

    One engine query per request (the request body runs through
    execute_es_query — any supported query shape); metric reduction is
    O(k) driver-side math.  See the module docstring for the request
    and metric grammar."""
    from search_engine_spark.query.dsl import execute_es_query

    metric = metric or {"precision": {"k": 10}}
    if len(metric) != 1:
        raise ValueError("exactly one metric per rank_eval call")
    kind, spec = next(iter(metric.items()))
    if kind not in ("precision", "recall", "mean_reciprocal_rank",
                    "dcg", "expected_reciprocal_rank"):
        raise NotImplementedError(f"rank_eval metric {kind!r}")
    spec = spec or {}
    k = int(spec.get("k", 10))

    ids = [str(r.get("id", f"req_{i}")) for i, r in enumerate(requests)]
    if len(set(ids)) != len(ids):
        dup = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate rank_eval request ids {dup}")
    details: Dict[str, Dict] = {}
    scores: List[float] = []
    for rid, req in zip(ids, requests):
        ratings: Dict[int, int] = {
            int(r["_id"]): int(r["rating"])
            for r in req.get("ratings", [])
        }
        body = dict(req.get("request") or {})
        body["size"] = k
        rows = execute_es_query(idx, body, join_docs=False).collect()
        ranked = [int(r["doc_id"]) for r in rows]
        s = _metric_score(kind, spec, ranked, ratings)
        scores.append(s)
        details[rid] = {
            "metric_score": s,
            "hits": [
                (d, ratings.get(d)) for d in ranked
            ],
        }
    return {
        "metric_score": (sum(scores) / len(scores)) if scores else 0.0,
        "details": details,
    }


def execute_es_rank_eval(idx, body: Dict) -> Dict:
    """Run an ES `_rank_eval` request body verbatim:
    {"requests": [...], "metric": {...}} — the endpoint twin of
    rank_eval()."""
    return rank_eval(
        idx, body.get("requests") or [], metric=body.get("metric")
    )
