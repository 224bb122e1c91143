#!/usr/bin/env python
"""Incremental-merge driver — spark-submit entry for batch upserts.

The reference indexer continuously upserts crawled batches into ES by
id = sha256(url) (indexer.py:236-271); this is that operation against a
built index (index/merge.py): delta segment build + tombstones + stats
merge, and optional compaction.

Usage (cluster):
    spark-submit --py-files dist/search_engine_spark.zip \
        scripts/submit_merge.py --index /data/index --pages /data/batch
    spark-submit ... scripts/submit_merge.py \
        --index /data/index --compact-to /data/index_v2

Usage (sandbox / local):
    python scripts/submit_merge.py --master local[8] \
        --index /tmp/idx --synth 2000
Prints one JSON line per operation.
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
    ap.add_argument("--index", required=True, help="existing index root")
    ap.add_argument("--pages", help="batch pages table (parquet dir)")
    ap.add_argument("--synth", type=int, help="generate N synthetic batch pages")
    ap.add_argument("--compact-to", help="compact the index into this dir")
    ap.add_argument("--buckets", type=int, default=None,
                    help="default: the index's persisted build_config")
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-extraction", action="store_true")
    ap.add_argument("--master", default=None,
                    help="local fallback master; omit under spark-submit")
    args = ap.parse_args()

    from search_engine_spark.session import submit_or_local

    spark = submit_or_local("sgs-merge", args.master)

    from search_engine_spark.index.merge import compact_index, merge_pages
    from search_engine_spark.synth import synth_pages

    if args.pages and args.synth:
        ap.error("--pages and --synth are mutually exclusive")
    if args.pages or args.synth:
        if args.synth:
            pages = synth_pages(spark, args.synth)
        else:
            pages = spark.read.parquet(args.pages)
        t0 = time.time()
        res = merge_pages(
            spark, args.index, pages,
            num_buckets=args.buckets,
            block_size=args.block_size,
            num_partitions=args.partitions,
            run_extraction=not args.no_extraction,
        )
        print(json.dumps({
            "op": "merge",
            "build_id": res.build_id,
            "new_docs": res.new_docs,
            "tombstoned": res.tombstoned,
            "wall_s": round(time.time() - t0, 3),
        }))

    if args.compact_to:
        t0 = time.time()
        compact_index(
            spark, args.index, args.compact_to,
            num_buckets=args.buckets,
            block_size=args.block_size,
            num_partitions=args.partitions,
        )
        print(json.dumps({
            "op": "compact",
            "out": args.compact_to,
            "wall_s": round(time.time() - t0, 3),
        }))

    spark.stop()


if __name__ == "__main__":
    main()
