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
    args = ap.parse_args()

    if args.master:
        from search_engine_spark.session import get_spark

        spark = get_spark(app_name="sgs-query", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("sgs-query").getOrCreate()

    from search_engine_spark.query.bm25 import BM25Index
    from search_engine_spark.query.serving import log_query

    if not args.query and not args.es_body:
        ap.error("at least one --query or --es-body is required")

    idx = BM25Index(spark, args.index)

    for spec in args.es_body or []:
        from search_engine_spark.query.dsl import execute_es_query

        raw = spec[1:] if spec.startswith("@") else spec
        if spec.startswith("@"):
            with open(raw) as fh:
                raw = fh.read()
        body = json.loads(raw)
        t0 = time.time()
        rows = execute_es_query(idx, body).collect()
        ms = int((time.time() - t0) * 1000)
        print(json.dumps({
            "es_body": body,
            "took_ms": ms,
            "results": [
                {k: (round(v, 6) if isinstance(v, float) else v)
                 for k, v in r.asDict().items()}
                for r in rows
            ],
        }, default=str))

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
