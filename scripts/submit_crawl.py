#!/usr/bin/env python
"""Crawl-wave driver — spark-submit entry for the batch crawl loop.

Runs the reference's crawl lifecycle (crawler.py:487-559) as
deterministic waves over a pre-fetched pages table (web/crawl.py), and
optionally upserts every fetched page straight into an existing index
(the POST /crawl-index flow, main.py:450-512).

Usage (cluster):
    spark-submit --py-files dist/search_engine_spark.zip \
        scripts/submit_crawl.py --pages /data/pages \
        --seed https://a.com/ --seed https://b.com/ --waves 3 \
        --out /data/crawl_run1
    spark-submit ... scripts/submit_crawl.py --pages /data/pages \
        --seed https://a.com/ --index /data/index --follow-links

Usage (sandbox / local):
    python scripts/submit_crawl.py --master local[8] --synth 500 \
        --seed-first 3 --waves 2
Prints one JSON summary line.
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
    ap.add_argument("--pages", help="pages table (parquet dir)")
    ap.add_argument("--synth", type=int,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--seed", action="append", default=[],
                    help="repeatable seed url")
    ap.add_argument("--seed-first", type=int, default=0,
                    help="also seed the first N urls of the pages table")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--robots",
                    help="(domain, path_prefix) disallow rules parquet")
    ap.add_argument("--index",
                    help="existing index root: upsert fetched pages into "
                         "it (crawl_and_index instead of simulate_crawl)")
    ap.add_argument("--follow-links", action="store_true",
                    help="with --index: follow links --max-depth waves")
    ap.add_argument("--out", help="write crawled/edges/frontier under here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from search_engine_spark.session import submit_or_local

    spark = submit_or_local("sgs-crawl", args.master)

    from search_engine_spark.web.crawl import crawl_and_index, simulate_crawl

    if args.synth:
        from search_engine_spark.synth import synth_pages

        pages = synth_pages(spark, args.synth)
    else:
        if not args.pages:
            ap.error("one of --pages / --synth is required")
        pages = spark.read.parquet(args.pages)

    seeds = list(args.seed)
    if args.seed_first:
        seeds += [
            r["url"]
            for r in pages.select("url").orderBy("url")
            .limit(args.seed_first).collect()
        ]
    if not seeds:
        ap.error("no seeds (--seed / --seed-first)")

    robots = spark.read.parquet(args.robots) if args.robots else None

    t0 = time.time()
    if args.index:
        results, job = crawl_and_index(
            spark, args.index, pages, seeds,
            follow_links=args.follow_links, max_depth=args.max_depth,
            batch_size=args.batch_size, robots=robots,
        )
        if args.out:
            results.write.mode("overwrite").parquet(
                os.path.join(args.out, "results")
            )
        summary = {**job, "mode": "crawl_and_index"}
    else:
        crawled, edges, frontier = simulate_crawl(
            spark, pages, seeds, waves=args.waves,
            batch_size=args.batch_size, max_depth=args.max_depth,
            robots=robots,
        )
        if args.out:
            crawled.write.mode("overwrite").parquet(
                os.path.join(args.out, "crawled")
            )
            edges.write.mode("overwrite").parquet(
                os.path.join(args.out, "edges")
            )
            frontier.write.mode("overwrite").parquet(
                os.path.join(args.out, "frontier")
            )
        n = crawled.count()
        summary = {
            "mode": "simulate_crawl",
            "crawled": n,
            "fetched": crawled.filter("fetched").count(),
            "edges": edges.count(),
            "frontier": frontier.count(),
        }
    summary["took_s"] = round(time.time() - t0, 3)
    summary["seeds"] = len(set(seeds))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
