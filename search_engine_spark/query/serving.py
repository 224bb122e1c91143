"""Serving-layer helpers around the BM25 engine.

Covers the reference's search-API post-processing that is still
data-shaped (the HTTP/Redis plumbing itself is out of scope per the
north rule):

- highlight snippets (backend/search_api/main.py:175-186, F16): the ES
  highlighter becomes a native regexp_replace + fragment substring —
  whole-word, case-insensitive ``<mark>`` wrapping and a ~150-char
  fragment around the first hit.
- query sanitizer (backend/shared/utils.py:57-64, F14): backslash-escape
  of the 19 ES special characters — kept as a parity function (our
  engine needs no escaping; tests pin the semantics).
- query log (backend/search_api/main.py:270-279; schema.sql:53-61): an
  append-only parquet table (query, results_count, response_time_ms,
  cache_hit, queried_at) written per search, plus the /stats 24h
  analytics over it (main.py:620-629, D9).

Everything here is native column expressions; the only Python runs
driver-side on the query string.
"""

from __future__ import annotations

import os
import re
import time
from datetime import datetime, timezone
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import schemas

FRAGMENT_SIZE = 150  # main.py:181 fragment_size
HIGHLIGHT_PRE = "<mark>"  # main.py:178-179
HIGHLIGHT_POST = "</mark>"

# utils.py:57-64 — the ES reserved characters, escaped in order.
_ES_SPECIAL = [
    "\\", "+", "-", "=", "&&", "||", ">", "<", "!", "(", ")", "{", "}",
    "[", "]", "^", '"', "~", "*", "?", ":", "/",
]


def sanitize_query(q: str) -> str:
    """F14 parity: backslash-escape ES special sequences (utils.py:57-64)."""
    for ch in _ES_SPECIAL:
        q = q.replace(ch, "\\" + ch)
    return q


def _terms_pattern(terms: Sequence[str]) -> str:
    """Case-insensitive whole-word alternation for canonical tokens.

    Canonical tokens are [a-z0-9]+ so no regex-escaping is needed; order
    longest-first so overlapping alternatives prefer the longer match in
    both Java regex (Spark) and RE2 (DuckDB) left-to-right alternation.
    """
    ordered = sorted(set(terms), key=lambda t: (-len(t), t))
    return r"(?i)\b(" + "|".join(ordered) + r")\b"


def highlight_col(
    text: Column,
    terms: Sequence[str],
    pre: str = HIGHLIGHT_PRE,
    post: str = HIGHLIGHT_POST,
) -> Column:
    """F16: wrap every whole-word query-term occurrence in <mark> tags
    (pre/post overridable — the ES highlighter's pre_tags/post_tags)."""
    if not terms:
        return text
    return F.regexp_replace(text, _terms_pattern(terms), f"{pre}$1{post}")


def highlight_sql(text_expr: str, terms: Sequence[str]) -> str:
    """DuckDB twin of highlight_col (RE2 uses \\1 backreferences)."""
    if not terms:
        return text_expr
    # DuckDB '...' literals keep backslashes verbatim — no doubling.
    pat = _terms_pattern(terms).replace("'", "''")
    return (
        f"regexp_replace({text_expr}, '{pat}', "
        f"'{HIGHLIGHT_PRE}\\1{HIGHLIGHT_POST}', 'g')"
    )


def fragment_col(
    text: Column, terms: Sequence[str], size: int = FRAGMENT_SIZE
) -> Column:
    """First-hit fragment: `size` chars starting ~size/3 before the first
    WHOLE-WORD occurrence of any query term (head of the doc when no
    term occurs) — the ES highlighter's fragment, deterministically.

    Whole-word matters: a bare substring instr() would center the
    fragment on 'cat' inside 'concatenated' while the highlighter's
    \\b gate marks nothing there.  Position stays instr-based for
    engine parity: non-alphanumerics map to spaces (length-preserving,
    one char -> one space) and the padded ' term ' search yields the
    term's exact character position in the ORIGINAL text."""
    if not terms:
        return F.substring(text, 1, size)
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(text), r"[^a-z0-9]", " "),
        F.lit(" "),
    )
    positions = [
        F.nullif(F.instr(norm, f" {t.lower()} "), F.lit(0))
        for t in sorted(set(terms))
    ]
    pos = F.coalesce(F.least(*positions) if len(positions) > 1 else positions[0], F.lit(1))
    start = F.greatest(F.lit(1), pos - F.lit(size // 3))
    return F.substring(text, start, size)


def fragment_sql(
    text_expr: str, terms: Sequence[str], size: int = FRAGMENT_SIZE
) -> str:
    """DuckDB twin of fragment_col."""
    if not terms:
        return f"substr({text_expr}, 1, {size})"
    norm = (
        f"(' ' || regexp_replace(lower({text_expr}), '[^a-z0-9]', ' ', 'g')"
        f" || ' ')"
    )
    positions = ", ".join(
        f"nullif(strpos({norm}, ' {t.lower()} '), 0)"
        for t in sorted(set(terms))
    )
    pos = f"coalesce(least({positions}), 1)"
    return f"substr({text_expr}, greatest(1, ({pos}) - {size // 3}), {size})"


# ---------------------------------------------------------------------------
# query parse (tfidf.py:589-626, F17)
# ---------------------------------------------------------------------------

_PHRASE = re.compile(r'"([^"]+)"')


def parse_query(query: str) -> dict:
    """F17 parity: extract quoted phrases and AND/OR/NOT flags, tokenize
    the rest with the canonical pipeline (tfidf.py:589-626).

    NOTE (documented reference behavior, SURVEY §2.F17): the boolean
    flags are parsed but never consumed by any downstream scorer in the
    reference — they are informational here too.  Conjunctive semantics
    are provided explicitly via BM25Index.search(mode="and")."""
    from search_engine_spark.text.tokenizer import tokenize_py

    query = query.strip()
    phrases = _PHRASE.findall(query)
    remaining = _PHRASE.sub("", query)
    upper = remaining.upper()
    return {
        "raw": query,
        "terms": tokenize_py(remaining),
        "phrases": phrases,
        "operators": {
            "and": " AND " in upper,
            "or": " OR " in upper,
            "not": " NOT " in upper,
        },
    }


# ---------------------------------------------------------------------------
# query log (schema.sql:53-61; main.py:270-279, 620-629)
# ---------------------------------------------------------------------------


def log_query(
    spark: SparkSession,
    log_dir: str,
    query: str,
    results_count: int,
    response_time_ms: int,
    cache_hit: bool = False,
    queried_at: Optional[datetime] = None,
) -> None:
    """Append one row to the query_logs table (main.py:270-279).

    `queried_at` defaults to now() — serving-side telemetry, not the
    deterministic data path (index/query results never read this table).
    """
    ts = queried_at or datetime.now(timezone.utc).replace(tzinfo=None)
    rec = [(query, results_count, response_time_ms, cache_hit, ts)]
    # 1-slice parallelize: createDataFrame(...).coalesce(1) costs seconds
    # at high core counts (see index.builder._Manifest.mark_done)
    (
        spark.createDataFrame(
            spark.sparkContext.parallelize(rec, 1), schema=schemas.QUERY_LOG
        )
        .write.mode("append")
        .parquet(log_dir)
    )


def read_query_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.schema(schemas.QUERY_LOG).parquet(log_dir)


def query_log_stats(logs: DataFrame, window_hours: int = 24) -> DataFrame:
    """/stats analytics (main.py:620-629, D9): totals, avg latency, and
    cache-hit % over the trailing window, anchored on max(queried_at) so
    the computation is deterministic for a fixed table."""
    anchor = logs.agg(F.max("queried_at").alias("mx"))
    return (
        logs.crossJoin(F.broadcast(anchor))
        .filter(
            F.col("queried_at")
            >= F.col("mx") - F.expr(f"INTERVAL {int(window_hours)} HOURS")
        )
        .agg(
            F.count(F.lit(1)).alias("total_queries"),
            F.round(F.avg("response_time_ms"), 2).alias("avg_response_time_ms"),
            F.round(
                F.avg(F.when(F.col("cache_hit"), 1.0).otherwise(0.0)) * 100.0, 2
            ).alias("cache_hit_rate_pct"),
        )
    )


def search_with_log(index, query: str, k: int = 10, log_dir: Optional[str] = None):
    """Run a BM25 search and append a query-log row (count + wall ms)."""
    t0 = time.time()
    result = index.search(query, k=k)
    rows = result.collect()
    ms = int((time.time() - t0) * 1000)
    if log_dir:
        log_query(index.spark, log_dir, query, len(rows), ms, cache_hit=False)
    return rows


# ---------------------------------------------------------------------------
# Query-result cache (A15): backend/search_api/main.py:146-158,235 and
# backend/shared/utils.py:16-18.  The reference caches the whole JSON
# search response in Redis under md5(f"{q}:{page}:{size}") with SETEX
# TTL 3600 (config.py:51).  Here the cache is an append-only parquet
# table (cache_key, response_json, cached_at); a GET is a key-pushdown
# point lookup taking the newest unexpired row.  Append-only + newest-
# wins gives Redis's last-SETEX-wins without any read-modify-write, so
# concurrent writers never conflict; `compact_cache` folds the table
# down to live rows (the SETEX expiry made physical).

CACHE_TTL_S = 3600  # config.py:51 cache_ttl


def cache_key(q: str, page: int = 1, size: int = 10) -> str:
    """md5 cache key (utils.py:16-18; main.py:146 — sans the 'search:'
    Redis namespace prefix, which is storage addressing, not key
    identity)."""
    import hashlib

    return hashlib.md5(f"{q}:{page}:{size}".encode()).hexdigest()


class QueryResultCache:
    """Parquet-backed GET-or-compute response cache.

    `now` is always an explicit parameter: expiry is computed from
    caller-supplied clocks so tests (and replays) are deterministic —
    the engine's no-now()-in-the-data-path rule (SURVEY.md F12) holds.

    Scale: the table is tiny relative to the corpus (one row per
    distinct (q,page,size) per TTL window) and the key filter pushes
    to the parquet scan, so a GET reads only row groups whose key-range
    statistics can match — no shuffle, no full scan.
    """

    def __init__(self, spark: SparkSession, cache_dir: str,
                 ttl_s: int = CACHE_TTL_S):
        self.spark = spark
        self.cache_dir = cache_dir
        self.ttl_s = int(ttl_s)

    def _table(self) -> Optional[DataFrame]:
        from search_engine_spark.index.merge import _fs_exists

        if not _fs_exists(self.spark, self.cache_dir):
            return None  # no cache table yet
        return self.spark.read.schema(schemas.QUERY_CACHE).parquet(
            self.cache_dir
        )

    def get(self, key: str, now: datetime) -> Optional[str]:
        """Newest unexpired response_json for key, or None (= miss)."""
        t = self._table()
        if t is None:
            return None
        rows = (
            t.filter(
                (F.col("cache_key") == key)
                & (F.col("cached_at")
                   > F.lit(now) - F.expr(f"INTERVAL {self.ttl_s} SECONDS"))
            )
            .orderBy(F.desc("cached_at"))
            .limit(1)
            .collect()
        )
        return rows[0]["response_json"] if rows else None

    def put(self, key: str, response_json: str, now: datetime) -> None:
        rec = [(key, response_json, now)]
        (
            self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(rec, 1),
                schema=schemas.QUERY_CACHE,
            )
            .write.mode("append")
            .parquet(self.cache_dir)
        )

    def compact_cache(self, now: datetime) -> None:
        """Drop expired and superseded rows (SETEX expiry + last-write-
        wins made physical).  Rewrites the table in place."""
        t = self._table()
        if t is None:
            return
        from pyspark.sql import Window

        live = (
            t.filter(
                F.col("cached_at")
                > F.lit(now) - F.expr(f"INTERVAL {self.ttl_s} SECONDS")
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("cache_key").orderBy(
                        F.desc("cached_at")
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        rows = live.collect()  # cache tables are small by construction
        (
            self.spark.createDataFrame(rows, schema=schemas.QUERY_CACHE)
            if rows
            else self.spark.createDataFrame([], schema=schemas.QUERY_CACHE)
        ).coalesce(1).write.mode("overwrite").parquet(self.cache_dir)


def search_cached(
    index,
    q: str,
    page: int = 1,
    size: int = 10,
    cache: Optional[QueryResultCache] = None,
    log_dir: Optional[str] = None,
    now: Optional[datetime] = None,
    ranks: Optional[DataFrame] = None,
    pages: Optional[DataFrame] = None,
    highlight: bool = True,
    exact_total: bool = False,
) -> dict:
    """GET-or-compute search response — the full /search handler shape
    (main.py:125-240): query, total, page, size, total_pages,
    has_next/has_prev, took_ms, cached, and per-result url, title +
    description (``<mark>``-highlighted, main.py:175-186), snippet
    (content fragment when a `pages` DataFrame supplies text, else the
    reference's description[:200] fallback, main.py:203), score,
    crawled_at, and — when a `ranks` (id, r) table is given — the
    PageRank boost 0.7·score + 0.3·r·100 applied WITHIN the returned
    page then re-sorted, exactly the reference's post-slice boost
    (main.py:243-267; unranked urls stay unboosted).

    `total` is the number of hits the top-k engine surfaced at the
    requested depth (page*size) — the engine prunes, it does not count
    the full match set by default.  Pass exact_total=True for the
    reference's ES `hits.total` semantics (main.py:218): an ids-only
    `count_matches` pass reports the true OR-match count (and drives
    total_pages / has_next), while the returned page still comes from
    the pruned top-(page*size) ranking.  Pagination is the
    from=(page-1)*size slice (G3) applied to one deterministic
    top-(page*size) ranking, so page 2 never disagrees with page 1
    about order.
    """
    import json
    import re as _re

    t0 = time.time()
    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    key = cache_key(q, page, size)
    if cache is not None:
        hit = cache.get(key, now)
        if hit is not None:
            resp = json.loads(hit)
            resp["cached"] = True
            resp["took_ms"] = int((time.time() - t0) * 1000)
            if log_dir:
                log_query(index.spark, log_dir, q, resp["total"],
                          resp["took_ms"], cache_hit=True, queried_at=now)
            return resp

    hterms = _re.findall(r"[a-z0-9]+", q.lower())
    topk = index.search(q, k=page * size, join_docs=False)
    joined = index._join_docs(topk, extra_cols=("description", "warc_ts"))
    title_c = F.coalesce(F.col("title"), F.lit(""))
    desc_c = F.coalesce(F.col("description"), F.lit(""))
    title_out, desc_out = title_c, desc_c
    if highlight and hterms:
        title_out = highlight_col(title_c, hterms)
        desc_out = highlight_col(desc_c, hterms)
    if pages is not None and hterms:
        joined = joined.join(pages.select("url", "text"), "url", "left")
        text_c = F.coalesce(F.col("text"), F.lit(""))
        snippet = F.when(
            text_c.rlike(_terms_pattern(hterms)),
            highlight_col(fragment_col(text_c, hterms), hterms),
        ).otherwise(F.substring(desc_c, 1, 200))
    else:
        snippet = F.substring(desc_c, 1, 200)
    rows = (
        joined.select(
            "doc_id",
            "score",
            "url",
            title_out.alias("title"),
            desc_out.alias("description"),
            snippet.alias("snippet"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias(
                "crawled_at"
            ),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    start = (page - 1) * size
    results = [
        {
            "doc_id": r["doc_id"],
            "url": r["url"],
            "title": r["title"],
            "description": r["description"],
            "snippet": r["snippet"],
            "score": r["score"],
            "crawled_at": r["crawled_at"],
        }
        for r in rows[start:start + size]
    ]
    if ranks is not None and results:
        ids = [r["doc_id"] for r in results]
        prmap = {
            row["id"]: float(row["r"])
            for row in ranks.filter(F.col("id").isin(ids)).collect()
        }
        for r in results:
            pr = prmap.get(r["doc_id"])
            if pr is not None:
                r["score"] = 0.7 * r["score"] + 0.3 * pr * 100.0
                r["pagerank"] = pr
        results.sort(key=lambda x: x["score"], reverse=True)
    total = index.count_matches(q) if exact_total else len(rows)
    total_pages = (total + size - 1) // size
    resp = {
        "query": q,
        "total": total,
        "page": page,
        "size": size,
        "total_pages": total_pages,
        "has_next": page < total_pages,
        "has_prev": page > 1,
        "results": results,
        "took_ms": int((time.time() - t0) * 1000),
        "cached": False,
    }
    if cache is not None:
        cache.put(key, json.dumps(resp), now)
    if log_dir:
        log_query(index.spark, log_dir, q, total, resp["took_ms"],
                  cache_hit=False, queried_at=now)
    return resp


def engine_stats(
    index,
    frontier: Optional[DataFrame] = None,
    log_dir: Optional[str] = None,
    pages_crawled: Optional[int] = None,
) -> dict:
    """The composite GET /stats response (main.py:606-641): index
    stats (ES indices.stats -> BM25Index.stats), crawler state (the
    Redis frontier ZCARD / pages-crawled counter -> the frontier
    DataFrame's count and a caller-supplied crawl total), and the 24h
    query-log aggregates (D9) — exactly the reference's keys."""
    s = index.stats()
    out = {
        "indexed_pages": s["indexed_docs"],
        "index_size_mb": s["index_size_mb"],
        "crawler_queue_size": int(frontier.count()) if frontier is not None else 0,
        "pages_crawled": int(pages_crawled or 0),
        "queries_24h": 0,
        "avg_response_time_ms": 0.0,
        "cache_hit_rate": 0.0,
    }
    if log_dir:
        logs = read_query_log(index.spark, log_dir)
        if logs.limit(1).count():
            row = query_log_stats(logs).collect()[0]
            out["queries_24h"] = int(row["total_queries"])
            out["avg_response_time_ms"] = float(row["avg_response_time_ms"])
            out["cache_hit_rate"] = float(row["cache_hit_rate_pct"])
    return out
