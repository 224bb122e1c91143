#!/usr/bin/env python
"""Full-lifecycle demo — every reference capability in one run.

Chains the whole engine the way the reference's services compose
(SURVEY.md §3): synthesize a Common-Crawl-shaped corpus → crawl waves
from seeds → build the inverted index → instant crawl+index of a late
batch (merge upsert) → PageRank over the extracted link graph → a
hybrid-boosted, highlighted, cached /search response → the composite
/stats. Prints one JSON summary line; non-zero exit if any stage's
sanity assertion fails.

Usage:
    python scripts/demo_pipeline.py [--pages N] [--master local[8]]
    spark-submit --py-files dist/search_engine_spark.zip \
        scripts/demo_pipeline.py --workdir /data/demo
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--workdir", help="default: a temp dir, removed after")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--query", default="python data tutorial")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark

    spark = get_spark(app_name="sgs-demo", master=args.master,
                      shuffle_partitions=16)

    from pyspark.sql import functions as F

    from search_engine_spark.graph.pagerank import pagerank_fixed
    from search_engine_spark.index.builder import build_index
    from search_engine_spark.query import serving
    from search_engine_spark.query.bm25 import BM25Index
    from search_engine_spark.query.dsl import execute_es_aggs, execute_es_query
    from search_engine_spark.synth import synth_pages
    from search_engine_spark.web.crawl import crawl_and_index, simulate_crawl
    from search_engine_spark.web.links import edges_from_pages

    work = args.workdir or tempfile.mkdtemp(prefix="sgs_demo_")
    t0 = time.time()
    stages = {}

    try:
        # 0) the "web": pre-fetched pages table
        pages = synth_pages(spark, args.pages, num_partitions=8)
        pages.write.mode("overwrite").parquet(f"{work}/pages")
        pages = spark.read.parquet(f"{work}/pages")
        t = time.time()

        # 1) crawl waves from seeds (§3.2)
        seeds = [r["url"] for r in pages.select("url").orderBy("url")
                 .limit(5).collect()]
        crawled, edges_crawl, frontier = simulate_crawl(
            spark, pages, seeds, waves=3, batch_size=50
        )
        n_crawled = crawled.count()
        assert n_crawled >= 5
        stages["crawl_s"] = round(time.time() - t, 2); t = time.time()

        # 2) index the first 80% (fields + positions on)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        cut = int(args.pages * 0.8)
        build_index(
            spark, pages.filter(ordinal < cut), f"{work}/index",
            index_fields=True, index_positions=True, index_shingles=True,
        )
        stages["build_s"] = round(time.time() - t, 2); t = time.time()

        # 3) instant crawl+index of the late batch (§3.2 -> A9 upsert)
        late = [r["url"] for r in pages.filter(ordinal >= cut)
                .select("url").orderBy("url").limit(20).collect()]
        results, job = crawl_and_index(spark, f"{work}/index", pages, late)
        assert job["completed"] == len(late)
        stages["merge_s"] = round(time.time() - t, 2); t = time.time()

        # 4) PageRank over the real link graph (§3.3)
        edges = edges_from_pages(pages)
        ranks = pagerank_fixed(edges, n_iter=5)
        docs = spark.read.parquet(f"{work}/index/docs").select("doc_id", "url")
        doc_ranks = ranks.join(docs, ranks.id == docs.url).select(
            F.col("doc_id").alias("id"), "r"
        )
        stages["pagerank_s"] = round(time.time() - t, 2); t = time.time()

        # 5) the flagship query path (§3.1): BM25 + boost + highlight +
        #    cache + log, exact totals
        idx = BM25Index(spark, f"{work}/index")
        cache = serving.QueryResultCache(spark, f"{work}/qcache")
        resp1 = serving.search_cached(
            idx, args.query, page=1, size=10, cache=cache,
            log_dir=f"{work}/qlog", ranks=doc_ranks, pages=pages,
            exact_total=True,
        )
        resp2 = serving.search_cached(
            idx, args.query, page=1, size=10, cache=cache,
            log_dir=f"{work}/qlog",
        )
        assert resp1["results"] and not resp1["cached"] and resp2["cached"]
        # the query-family sweep on the same index
        family = {
            "boolean": idx.search_boolean(
                'python AND data NOT zebra', k=5
            ).count(),
            "phrase": idx.search_phrase("machine learning", k=5).count(),
            "prefix": idx.search_prefix("pyth", k=5).count(),
            "wildcard": idx.search_wildcard("py*on", k=5).count(),
            "fuzzy": idx.search_fuzzy("pythn", k=5).count(),
            "fields": idx.search_fields("python data", k=5).count(),
            "explain": idx.search("python", k=5, explain=True).count(),
            "filtered": idx.search_filtered(
                "python data", "domain = 'example.com'", k=5
            ).count(),
            "facets": idx.facet_counts("python data", "domain", size=5).count(),
            "mlt": idx.more_like_this(
                pages.select("text").first()["text"], k=5,
                min_term_freq=1, min_doc_freq=2,
            ).count(),
            "cross_fields": idx.search_cross_fields(
                "python data", k=5
            ).count(),
            "suggest": idx.suggest_terms(
                "pythoon", suggest_mode="always"
            ).count(),
            "significant": idx.significant_terms(
                "python data", size=5, min_doc_count=2
            ).count(),
            "top_hits": idx.facet_top_hits(
                "python data", "domain", size=3, hits_per_bucket=2
            ).count(),
            "nested_buckets": idx.facet_terms_buckets(
                "python data", "domain",
                ("date_histogram", "warc_ts", "month"), size=3,
                metrics={"avg_dl": ("avg", "doclen")},
            ).count(),
            "filters_agg": idx.facet_filters(
                "python data",
                {"short": "doclen < 100", "long": "doclen >= 100"},
            ).count(),
            "match_all_facet": idx.facet_counts(None, "domain",
                                                size=100).count(),
            "did_you_mean": idx.suggest_phrase(
                "pythn data tutorail", size=3, max_errors=2
            ).count(),
            "completion": idx.suggest_completion("pro", size=5).count(),
        }
        # doc-inspection APIs compose with the same live index: one
        # winner's _termvectors / _explain / _mget must agree with its
        # search-path score and metadata
        win = idx.search(args.query, k=1, join_docs=False).collect()[0]
        exp = idx.explain_doc(args.query, int(win["doc_id"]))
        assert exp["matched"] and abs(exp["score"] - win["score"]) < 1e-9
        tv = idx.term_vectors(int(win["doc_id"]), term_statistics=True)
        family["term_vectors"] = tv.count()
        assert family["term_vectors"] > 0
        assert idx.get_docs(int(win["doc_id"])).count() == 1
        # _count agrees with the response's exact total
        from search_engine_spark.query.dsl import execute_es_count
        assert execute_es_count(
            idx, {"query": {"match": {"content": args.query}}}
        ) == resp1["total"]
        # the ES Query-DSL path: the reference's flagship request body
        # (main.py:162-189) must rank identically to search_fields
        dsl_rows = execute_es_query(idx, {
            "query": {"multi_match": {
                "query": args.query,
                "fields": ["title^3", "description^2", "content"],
                "type": "best_fields",
            }},
            "from": 0, "size": 10,
        }, join_docs=False).collect()
        direct = idx.search_fields(args.query, k=10, join_docs=False).collect()
        assert [r["doc_id"] for r in dsl_rows] == [
            r["doc_id"] for r in direct
        ], "DSL lowering must match search_fields"
        dsl_aggs = execute_es_aggs(idx, {
            "query": {"match": {"content": args.query}},
            "aggs": {"by_domain": {"terms": {"field": "domain", "size": 5}},
                     "len_stats": {"stats": {"field": "doclen"}}},
        })
        assert dsl_aggs["by_domain"].count() > 0
        assert dsl_aggs["len_stats"].collect()[0]["count"] > 0
        family["dsl"] = len(dsl_rows)

        # 5a-bis) continuation surface: spans, fuzzy match, pinned,
        # terms_enum, rank_eval — each must return sane results on the
        # live index
        w0, w1 = args.query.split()[0], args.query.split()[-1]
        span_rows = execute_es_query(idx, {"query": {"span_near": {
            "clauses": [{"span_term": {"content": w0}},
                        {"span_term": {"content": w1}}],
            "slop": 5, "in_order": True}}, "size": 5},
            join_docs=False).collect()
        family["span_near"] = len(span_rows)
        fz = idx.search_match_fuzzy(
            w0[:-1] + "x " + w1, fuzziness="AUTO", k=5, join_docs=False
        ).collect()
        assert fz, "fuzzy match must recover the misspelled query"
        family["match_fuzzy"] = len(fz)
        pin_target = direct[-1]["doc_id"]
        pinned = idx.search_pinned(
            [pin_target], args.query, k=5, join_docs=False
        ).collect()
        assert pinned[0]["doc_id"] == pin_target
        te = idx.terms_enum(w0[:2], size=5)
        assert te == sorted(te)
        from search_engine_spark.query.rankeval import rank_eval
        rq = {"query": {"match": {"content": args.query}}}
        # judge the SAME ranking rank_eval will run (plain match, not
        # best_fields): its own top-2 rated ideal must score NDCG 1
        mtop = execute_es_query(
            idx, {**rq, "size": 2}, join_docs=False
        ).collect()
        ndcg = rank_eval(idx, [{
            "id": "demo", "request": rq,
            "ratings": [{"_id": int(mtop[0]["doc_id"]), "rating": 3},
                        {"_id": int(mtop[1]["doc_id"]), "rating": 2}],
        }], metric={"dcg": {"k": 10, "normalize": True}})["metric_score"]
        assert ndcg == 1.0, "engine's own top-2 judged ideal => NDCG 1"
        family["rank_eval_ndcg"] = ndcg
        stages["query_s"] = round(time.time() - t, 2); t = time.time()

        # 5b) delete-by-query (ES _delete_by_query -> Lucene tombstones):
        # deleted docs vanish from search immediately, pre-compaction
        from search_engine_spark.index.merge import delete_pages

        gone = "blog.sample.net"
        n_del = delete_pages(spark, f"{work}/index",
                             predicate=f"domain = '{gone}'")
        idx = BM25Index(spark, f"{work}/index")
        assert n_del > 0
        assert idx.facet_counts(args.query, "domain", size=100).filter(
            F.col("value") == gone
        ).count() == 0
        stages["delete_s"] = round(time.time() - t, 2); t = time.time()

        # 5c) reindex (ES _reindex): fold the deletions into a fresh
        # index with a different layout; live counts and the live-corpus
        # facet must carry over exactly
        from search_engine_spark.index.merge import reindex

        live_before = idx.count_matches(None)
        reindex(spark, f"{work}/index", f"{work}/index2", num_buckets=8)
        idx2 = BM25Index(spark, f"{work}/index2")
        assert idx2.count_matches(None) == live_before
        assert idx2.tombstones is None
        stages["reindex_s"] = round(time.time() - t, 2); t = time.time()

        # 6) composite /stats
        stats = serving.engine_stats(
            idx, frontier=frontier, log_dir=f"{work}/qlog",
            pages_crawled=n_crawled,
        )
        assert stats["queries_24h"] == 2 and stats["cache_hit_rate"] == 50.0
        stages["stats_s"] = round(time.time() - t, 2)

        print(json.dumps({
            "pages": args.pages,
            "crawled": n_crawled,
            "indexed": stats["indexed_pages"],
            "top_hit": resp1["results"][0]["url"],
            "exact_total": resp1["total"],
            "deleted": n_del,
            "family_hits": family,
            "stats": stats,
            "stages_s": stages,
            "total_s": round(time.time() - t0, 2),
        }))
    finally:
        if not args.workdir:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
