"""Multi-index search — the ES `GET /idx1,idx2/_search` surface.

The reference's Elasticsearch serves every query against an index list
(its single index `web_pages` is created indexer.py:163-206 and queried
main.py:162-189, but the ES API the service sits on is inherently
multi-index).  Two ES search types, both reproduced exactly:

- **query_then_fetch** (ES default): each index scores with its OWN
  statistics (df, N, avgdl) — cheap, but scores are not comparable
  across indices when their stats diverge.  Here: per-index top-k
  (block-max WAND and every gate each index already has), one union,
  one global (score desc, _index asc, doc_id asc) k-cut.  The union of
  per-index top-k provably contains the global top-k, so the merge is
  driver-cheap — the exact scatter-gather ES's coordinating node does
  over shards.

- **dfs_query_then_fetch**: a first phase pools GLOBAL term statistics
  (df summed, N summed, avgdl over the pooled token count), then every
  index scores with them — scores ARE comparable, and the ranking is
  RANK-IDENTICAL to one combined index over the union of the corpora
  (pinned in tests/test_multi.py).  The stats pool is driver-side
  arithmetic over each index's tiny per-term stats lookup (the same
  pre-flight ES's DFS phase pays); scoring is one bucket-pruned decode
  per index with the global (idf, avgdl) injected, ONE groupBy(doc_id)
  per index bounded by that index's Σ df over the query terms, then
  the same union + k-cut.  No WAND pruning: per-index block_max
  metadata upper-bounds LOCAL-stats scores, not global-stats ones, so
  the exhaustive pass is the exact plan (dfs is ES's documented
  slower-but-consistent mode for the same reason).

Doc ids are per-index dense ids and collide across indices; results
carry `_index` (the caller-supplied name, like ES `_index`) and are
unique on (_index, doc_id).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.index.scoring import idf_py
from search_engine_spark.text.tokenizer import tokenize_py

from .bm25 import _CONTRIB_SCHEMA, BM25Index, _decode_and_score


def _terms(query) -> List[str]:
    return sorted(
        set(query) if isinstance(query, list) else set(tokenize_py(query))
    )


def _with_index(df: DataFrame, name: str) -> DataFrame:
    return df.select(F.lit(name).alias("_index"), "*")


def _merge_topk(parts: List[DataFrame], k: int) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(
        F.desc("score"), F.asc("_index"), F.asc("doc_id")
    ).limit(k)


def _empty_multi(indices) -> DataFrame:
    spark = indices[0][1].spark
    return spark.createDataFrame(
        [], "_index string, doc_id long, score double, url string,"
        " title string"
    )


def pooled_stats(
    indices: List[Tuple[str, BM25Index]], terms: List[str]
) -> Tuple[int, float, Dict[str, int], List[Dict]]:
    """The DFS phase: (N_global, avgdl_global, df_global per term,
    per-index stats lookups).  Driver-side arithmetic over each
    index's per-term stats point lookup — O(indices × query terms)."""
    per_index = [idx._query_stats(terms) for _, idx in indices]
    n_global = sum(idx.n_docs for _, idx in indices)
    total_tokens = sum(idx.total_tokens for _, idx in indices)
    avgdl_global = (total_tokens / n_global) if n_global else 0.0
    df_global: Dict[str, int] = {}
    for st in per_index:
        for t, row in st.items():
            df_global[t] = df_global.get(t, 0) + row[0]
    return n_global, avgdl_global, df_global, per_index


def search_multi(
    indices: List[Tuple[str, BM25Index]],
    query,
    k: int = 10,
    search_type: str = "query_then_fetch",
    mode: str = "or",
    indices_boost: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """Top-k BM25 over several indices — ES `GET /i1,i2/_search`.

    `indices` is [(name, BM25Index), ...]; names label `_index` in the
    result (ES response `_index` field) and break score ties (then
    doc_id asc).  `search_type` picks the ES consistency/cost
    trade-off documented in the module docstring; `mode` is the usual
    "or"/"and" operator (AND in dfs mode requires every GLOBALLY
    indexed query term, exactly like one combined index would).

    `indices_boost` — the ES request-body `indices_boost` section:
    {index_name: factor} multiplies that index's scores BEFORE the
    coordinating merge (unnamed indices boost 1.0).  Boosting is
    per-index monotonic, so each shard's top-k stays valid and only
    the merge order changes — zero extra work."""
    if not indices:
        raise ValueError("need at least one index")
    if search_type not in ("query_then_fetch", "dfs_query_then_fetch"):
        raise ValueError(f"unknown search_type: {search_type!r}")
    if mode not in ("or", "and"):
        raise ValueError(f"unknown mode: {mode!r}")
    boosts = indices_boost or {}
    unknown = set(boosts) - {name for name, _ in indices}
    if unknown:
        raise ValueError(f"indices_boost names unknown indices {sorted(unknown)}")
    # boosts multiply AFTER per-index top-k, which is only order-safe
    # for monotonic (positive) factors — refuse the rest loudly
    bad = {n: b for n, b in boosts.items() if float(b) <= 0.0}
    if bad:
        raise ValueError(f"indices_boost factors must be > 0: {bad}")
    if k <= 0:
        return _empty_multi(indices)

    def _boosted(df: DataFrame, name: str) -> DataFrame:
        b = float(boosts.get(name, 1.0))
        if b == 1.0:
            return df
        return df.withColumn("score", F.col("score") * F.lit(b))

    if search_type == "query_then_fetch":
        parts = [
            _boosted(
                _with_index(
                    idx.search(
                        query, k=k,
                        mode="and" if mode == "and" else "blockmax",
                    ),
                    name,
                ),
                name,
            )
            for name, idx in indices
        ]
        return _merge_topk(parts, k)

    terms = _terms(query)
    n_g, avgdl_g, df_g, per_index = pooled_stats(indices, terms)
    live = [t for t in terms if df_g.get(t, 0) > 0]
    if not live:
        return _empty_multi(indices)
    idf_g = {t: idf_py(n_g, df_g[t]) for t in live}
    parts = []
    for (name, idx), st in zip(indices, per_index):
        terms_i = [t for t in live if t in st]
        if not terms_i:
            continue
        if mode == "and" and len(terms_i) < len(live):
            # a doc lives in exactly one index; missing any globally
            # indexed term there means no doc of this index can match
            continue
        buckets = sorted({st[t][2] for t in terms_i})
        blocks = idx.postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms_i)
        )
        contribs = blocks.select(
            "term", "count", "doc_ids", "tfs", "doclens"
        ).mapInPandas(
            _decode_and_score({t: idf_g[t] for t in terms_i}, avgdl_g),
            schema=_CONTRIB_SCHEMA,
        )
        if mode == "and":
            scored = (
                contribs.groupBy("doc_id")
                .agg(
                    F.sum("contrib").alias("score"),
                    F.count(F.lit(1)).alias("_nt"),
                )
                .filter(F.col("_nt") == len(live))
                .drop("_nt")
            )
        else:
            scored = contribs.groupBy("doc_id").agg(
                F.sum("contrib").alias("score")
            )
        scored = idx._drop_tombstones(scored)
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        parts.append(_boosted(_with_index(idx._join_docs(topk), name), name))
    if not parts:
        return _empty_multi(indices)
    return _merge_topk(parts, k)


def count_multi(
    indices: List[Tuple[str, BM25Index]],
    query,
    mode: str = "or",
    predicate=None,
) -> int:
    """Multi-index hits.total — ES `GET /i1,i2/_count`: exact live
    match counts summed across indices (doc spaces are disjoint)."""
    return sum(
        idx.count_matches(query, mode=mode, predicate=predicate)
        for _, idx in indices
    )
