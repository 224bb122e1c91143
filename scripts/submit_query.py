#!/usr/bin/env python
"""Cluster driver for BM25 queries over a built index (spark-submit
--py-files entry point; see submit_index_build.py for packaging).

    spark-submit --py-files dist/search_engine_spark.zip \
        scripts/submit_query.py --index /data/index \
        --query "python tutorial" --k 10 --mode blockmax

Prints one JSON line per query with latency and the top-k results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append",
                    help="repeatable; one search per flag")
    ap.add_argument("--es-body", action="append",
                    help="raw ES request-body JSON (string or @file) — "
                         "executed via query/dsl.py; repeatable")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="blockmax",
                    choices=["blockmax", "exhaustive", "and", "tfidf",
                             "boolean", "phrase", "prefix", "wildcard",
                             "fuzzy", "fields"])
    ap.add_argument("--slop", type=int, default=0,
                    help="ordered proximity for --mode phrase")
    ap.add_argument("--explain", action="store_true",
                    help="per-term score contributions (blockmax/"
                         "exhaustive/and/tfidf modes)")
    ap.add_argument("--log-dir", help="append query_logs rows here")
    ap.add_argument("--master", default=None)
    ap.add_argument("--count-body", action="append",
                    help="ES _count: request-body JSON (string or "
                         "@file) -> exact live hits.total; repeatable")
    ap.add_argument("--term-vectors", action="append",
                    help="ES _termvectors: url or doc_id; repeatable")
    ap.add_argument("--positions", action="store_true",
                    help="include positions in --term-vectors")
    ap.add_argument("--explain-doc", action="append", metavar="QUERY:DOC",
                    help="ES _explain: 'query text:url_or_id'; repeatable")
    ap.add_argument("--mget", action="append",
                    help="ES _mget: url or doc_id; repeatable")
    args = ap.parse_args()

    from search_engine_spark.session import submit_or_local

    spark = submit_or_local("sgs-query", args.master)

    from search_engine_spark.query.bm25 import BM25Index
    from search_engine_spark.query.serving import log_query

    if not any([args.query, args.es_body, args.count_body,
                args.term_vectors, args.explain_doc, args.mget]):
        ap.error("at least one --query/--es-body/--count-body/"
                 "--term-vectors/--explain-doc/--mget is required")

    idx = BM25Index(spark, args.index)

    def _doc_arg(s: str):
        return int(s) if s.lstrip("-").isdigit() else s

    def _body_json(spec: str):
        raw = spec
        if spec.startswith("@"):
            with open(spec[1:]) as fh:
                raw = fh.read()
        return json.loads(raw)

    for spec in args.count_body or []:
        from search_engine_spark.query.dsl import execute_es_count

        body = _body_json(spec)
        t0 = time.time()
        n = execute_es_count(idx, body)
        print(json.dumps({
            "count_body": body, "count": n,
            "took_ms": int((time.time() - t0) * 1000),
        }))

    for d in args.term_vectors or []:
        t0 = time.time()
        rows = idx.term_vectors(
            _doc_arg(d), with_positions=args.positions,
            term_statistics=True,
        ).collect()
        print(json.dumps({
            "term_vectors": d,
            "took_ms": int((time.time() - t0) * 1000),
            "terms": [r.asDict() for r in rows],
        }, default=str))

    for spec in args.explain_doc or []:
        # split at the FIRST colon: the doc side may be a url (which
        # contains colons); the query side's colons are punctuation the
        # tokenizer strips anyway
        q, _, d = spec.partition(":")
        if not d:
            ap.error("--explain-doc wants 'query text:url_or_id'")
        t0 = time.time()
        exp = idx.explain_doc(q, _doc_arg(d))
        exp["took_ms"] = int((time.time() - t0) * 1000)
        print(json.dumps({"explain": spec, **exp}))

    for d in args.mget or []:
        t0 = time.time()
        rows = idx.get_docs(_doc_arg(d)).collect()
        print(json.dumps({
            "mget": d, "found": bool(rows),
            "took_ms": int((time.time() - t0) * 1000),
            "docs": [r.asDict() for r in rows],
        }, default=str))

    def _ser(v):
        """DataFrame(s) / ints / nested dicts -> JSON-able."""
        if isinstance(v, dict):
            return {k: _ser(x) for k, x in v.items()}
        if hasattr(v, "collect"):
            return [
                {k: (round(x, 6) if isinstance(x, float) else x)
                 for k, x in r.asDict().items()}
                for r in v.collect()
            ]
        return v

    for spec in args.es_body or []:
        from search_engine_spark.query.dsl import (
            execute_es_aggs,
            execute_es_query,
            execute_es_search_template,
            execute_es_suggest,
        )

        raw = spec[1:] if spec.startswith("@") else spec
        if spec.startswith("@"):
            with open(raw) as fh:
                raw = fh.read()
        body = json.loads(raw)
        t0 = time.time()
        # dispatch like ES _search: template bodies render-and-run;
        # suggest and aggs sections execute alongside (or instead of)
        # the hits when present; size 0 = aggs-only, no hits
        out = {"es_body": body}
        if "source" in body:
            out["results"] = _ser(execute_es_search_template(idx, body))
        else:
            has_aggs = "aggs" in body or "aggregations" in body
            if "suggest" in body:
                out["suggest"] = _ser(execute_es_suggest(idx, body))
            if has_aggs:
                out["aggregations"] = _ser(execute_es_aggs(idx, body))
            if "query" in body and int(body.get("size", 10)) != 0:
                out["results"] = _ser(
                    execute_es_query(idx, body)
                    if not has_aggs
                    else execute_es_query(
                        idx, {k: v for k, v in body.items()
                              if k not in ("aggs", "aggregations")}
                    )
                )
        out["took_ms"] = int((time.time() - t0) * 1000)
        print(json.dumps(out, default=str))

    for q in args.query or []:
        t0 = time.time()
        if args.mode == "boolean":
            rows = idx.search_boolean(q, k=args.k).collect()
        elif args.mode == "phrase":
            rows = idx.search_phrase(q, k=args.k, slop=args.slop).collect()
        elif args.mode == "prefix":
            rows = idx.search_prefix(q, k=args.k).collect()
        elif args.mode == "wildcard":
            rows = idx.search_wildcard(q, k=args.k).collect()
        elif args.mode == "fuzzy":
            rows = idx.search_fuzzy(q, k=args.k).collect()
        elif args.mode == "fields":
            rows = idx.search_fields(q, k=args.k).collect()
        elif args.explain:
            rows = idx.search(q, k=args.k, mode=args.mode,
                              explain=True).collect()
        else:
            rows = idx.search(q, k=args.k, mode=args.mode).collect()
        ms = int((time.time() - t0) * 1000)
        if args.log_dir:
            log_query(spark, args.log_dir, q, len(rows), ms)

        def _result(r):
            d = {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
            if "url" in r.__fields__:
                d.update(url=r["url"], title=r["title"])
            if "term_scores" in r.__fields__:
                d["term_scores"] = {
                    t: round(v, 6) for t, v in sorted(r["term_scores"].items())
                }
            return d

        print(json.dumps({
            "query": q,
            "mode": args.mode,
            "took_ms": ms,
            "results": [_result(r) for r in rows],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
