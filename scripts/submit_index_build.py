#!/usr/bin/env python
"""Cluster driver for the index build — the spark-submit entry point
(north rule: "run via spark-submit --py-files on multi-executor
clusters at N and 4N executors").

Usage (cluster):
    scripts/package_pyfiles.sh      # -> dist/search_engine_spark.zip
    spark-submit \
        --py-files dist/search_engine_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/submit_index_build.py \
        --pages /data/pages --out /data/index \
        --buckets 4096 --partitions 8192 --bucket-groups 64

Usage (sandbox / local):
    python scripts/submit_index_build.py --master local[8] \
        --synth 5000 --out /tmp/idx

Never creates its own master when launched by spark-submit (the session
builder inherits the submitted conf); --master is a local-mode fallback.
Prints one JSON line: docs, wall seconds, docs/sec, and per-stage
manifest timings — the per-cluster-size throughput record used for the
scaling-efficiency comparison.
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
    ap.add_argument("--pages", help="input pages table (parquet dir)")
    ap.add_argument("--synth", type=int, help="generate N synthetic pages instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--bucket-groups", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-extraction", action="store_true",
                    help="trust the stored text column (skip html extraction)")
    ap.add_argument("--verify-extraction", action="store_true")
    ap.add_argument("--metrics", action="store_true",
                    help="collect per-stage shuffle metrics (needs spark.ui)")
    ap.add_argument("--fields", action="store_true",
                    help="index title/description field postings")
    ap.add_argument("--positions", action="store_true",
                    help="build positional postings (phrase queries)")
    ap.add_argument("--shingles", action="store_true",
                    help="build bigram LM stats (phrase suggester)")
    ap.add_argument("--master", default=None,
                    help="local fallback master; omit under spark-submit")
    args = ap.parse_args()

    # under spark-submit the builder inherits the submitted conf
    # (--py-files handles code shipping); plain-python launches get the
    # tuned local session — see session.submit_or_local
    from search_engine_spark.session import submit_or_local

    spark = submit_or_local(
        "sgs-index-build", args.master,
        # the stage-metrics collector reads the status REST API
        extra_conf={"spark.ui.enabled": "true"} if args.metrics else None,
    )

    from search_engine_spark.index.builder import build_index
    from search_engine_spark.synth import synth_pages

    if args.synth:
        pages = synth_pages(spark, args.synth)
        n_docs = args.synth
    elif args.pages:
        pages = spark.read.parquet(args.pages)
        n_docs = pages.count()
    else:
        ap.error("one of --pages / --synth is required")

    t0 = time.time()
    paths = build_index(
        spark, pages, args.out,
        num_buckets=args.buckets,
        block_size=args.block_size,
        num_partitions=args.partitions,
        bucket_groups=args.bucket_groups,
        resume=args.resume,
        run_extraction=not args.no_extraction,
        verify_extraction=args.verify_extraction,
        collect_metrics=args.metrics,
        index_fields=args.fields,
        index_positions=args.positions,
        index_shingles=args.shingles,
    )
    wall = time.time() - t0

    from pyspark.sql import functions as F

    man = (
        spark.read.parquet(paths.manifest)
        .groupBy("stage")
        .agg(F.sum("wall_ms").alias("wall_ms"))
        .collect()
    )
    print(json.dumps({
        "docs": n_docs,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
        "stages_ms": {r["stage"]: int(r["wall_ms"]) for r in man},
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
