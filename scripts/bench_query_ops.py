"""Measure the serving-shape query operators added after the core BM25
path — ES filter-context search, terms-aggregation facets, more_like_this,
search_after cursors, minimum_should_match, filtered count_matches — on a
corpus big enough that the physical strategy (ids-only decode, selectivity
gate, candidate masks) matters.

Usage: python scripts/bench_query_ops.py [n_pages] [cpus]
Prints one JSON line {n_pages, build_s, ops: {name: {p50, p95}}}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.session import get_spark
from search_engine_spark.synth import synth_pages

QUERIES = [
    "quick fox",
    "python tutorial",
    "data science machine learning",
    "search engine ranking",
    "web crawler index",
    "database partition shuffle",
]


def _pcts(xs):
    xs = sorted(xs)
    return {
        "p50": round(xs[len(xs) // 2], 3),
        "p95": round(xs[min(len(xs) - 1, int(len(xs) * 0.95))], 3),
    }


_CURSORS = {}


def _cursor_of(idx, q):
    """Page-1 cursor (score, doc_id) of the last top-10 row, computed once."""
    if q not in _CURSORS:
        rows = idx.search(q, k=10, join_docs=False).collect()
        _CURSORS[q] = (rows[-1]["score"], rows[-1]["doc_id"]) if rows else (1e9, -1)
    return _CURSORS[q]


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(
        app_name="bench_query_ops",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    root = tempfile.mkdtemp(prefix="query_ops_")
    pages = synth_pages(spark, n_pages, num_partitions=cpus * 2)
    t0 = time.time()
    build_index(
        spark, pages, root,
        num_buckets=32, block_size=128, num_partitions=cpus * 2,
        index_fields=True,      # cross_fields needs per-field postings
        index_positions=True,   # phrase_prefix needs positional postings
        index_shingles=True,    # suggest_phrase needs the bigram LM
    )
    build_s = time.time() - t0

    idx = BM25Index(spark, root)
    idx.search(QUERIES[0], k=10).collect()  # warm the stats memo + JVM

    mlt_seed = pages.select("text").limit(1).collect()[0]["text"][:2000]
    for q in QUERIES:  # precompute page-1 cursors outside the timed loop
        _cursor_of(idx, q)

    ops = {
        "search": lambda q: idx.search(q, k=10).collect(),
        "search_msm2": lambda q: idx.search(q + " engine", k=10, min_should_match=2).collect(),
        "search_filtered": lambda q: idx.search_filtered(
            q, "domain like '%.org'", k=10
        ).collect(),
        "facet_counts": lambda q: idx.facet_counts(q, "domain", size=10).collect(),
        "search_after": lambda q: idx.search_after(
            q, _cursor_of(idx, q), k=10
        ).collect(),
        "count_filtered": lambda q: idx.count_matches(
            q, predicate="domain like '%.org'"
        ),
        "more_like_this": lambda q: idx.more_like_this(mlt_seed, k=10).collect(),
        "facet_stats": lambda q: idx.facet_stats(q, "doclen").collect(),
        "facet_histogram": lambda q: idx.facet_histogram(
            q, "doclen", 25
        ).collect(),
        "facet_range": lambda q: idx.facet_range(
            q, "doclen", [(None, 50.0), (50.0, 150.0), (150.0, None)]
        ).collect(),
        "facet_cardinality": lambda q: idx.facet_cardinality(
            q, "domain", approx=True
        ),
        "facet_composite": lambda q: idx.facet_composite(
            q, ["domain"], size=10
        ).collect(),
        "significant_terms": lambda q: idx.significant_terms(
            q, size=10
        ).collect(),
        "cross_fields": lambda q: idx.search_cross_fields(
            q, k=10, boosts={"content": 1.0}, join_docs=False
        ).collect(),
        "suggest_terms": lambda q: idx.suggest_terms(
            # inject a real typo: replacing the last char with itself
            # would benchmark the exact-match path instead
            q[:-1] + ("x" if not q.endswith("x") else "z"),
            suggest_mode="always"
        ).collect(),
        "facet_percentiles": lambda q: idx.facet_percentiles(
            q, "doclen", approx=True
        ).collect(),
        "facet_date_histogram": lambda q: idx.facet_date_histogram(
            q, "warc_ts", "month"
        ).collect(),
        "facet_top_hits": lambda q: idx.facet_top_hits(
            q, "domain", size=5, hits_per_bucket=3
        ).collect(),
        "collapse": lambda q: idx.search_collapse(
            q, "domain", k=10, join_docs=False
        ).collect(),
        "phrase_prefix": lambda q: idx.search_phrase_prefix(
            " ".join(q.split()[:2])[:-1], k=10, join_docs=False
        ).collect(),
        "bool_prefix": lambda q: idx.search_bool_prefix(
            q[:-1], k=10, join_docs=False
        ).collect(),
        "regexp": lambda q: idx.search_regexp(
            q.split()[0][:3] + "[a-z]*", k=10, join_docs=False
        ).collect(),
        "dis_max": lambda q: idx.search_dis_max(
            [q, "search engine"], tie_breaker=0.3, k=10, join_docs=False
        ).collect(),
        "boosting": lambda q: idx.search_boosting(
            q, "engine", negative_boost=0.3, k=10, join_docs=False
        ).collect(),
        "function_score": lambda q: idx.search_function_score(
            q, field_value_factor={"field": "doclen", "factor": 0.1,
                                   "modifier": "log1p"},
            k=10, join_docs=False,
        ).collect(),
        "rescore": lambda q: idx.search_rescore(
            q, ("phrase", " ".join(q.split()[:2]), 0), window_size=50,
            k=10, join_docs=False,
        ).collect(),
        "facet_terms_buckets": lambda q: idx.facet_terms_buckets(
            q, "domain", ("date_histogram", "warc_ts", "month"), size=5,
            metrics={"avg_dl": ("avg", "doclen")},
        ).collect(),
        "facet_filters": lambda q: idx.facet_filters(
            q, {"short": "doclen < 150", "long": "doclen >= 150"},
        ).collect(),
        "facet_counts_match_all": lambda q: idx.facet_counts(
            None, "domain", size=10
        ).collect(),
        "suggest_phrase": lambda q: idx.suggest_phrase(
            q.split()[0][:-1] + "x " + " ".join(q.split()[1:]), size=5,
        ).collect(),
        "suggest_completion": lambda q: idx.suggest_completion(
            q.split()[0][:3], size=10
        ).collect(),
        "span_near": lambda q: idx.search_spans(
            {"span_near": {"clauses": [
                {"span_term": {"content": q.split()[0]}},
                {"span_term": {"content": q.split()[1]}},
            ], "slop": 3, "in_order": True}}, k=10, join_docs=False,
        ).collect(),
        "span_not": lambda q: idx.search_spans(
            {"span_not": {
                "include": {"span_term": {"content": q.split()[0]}},
                "exclude": {"span_term": {"content": q.split()[1]}},
                "pre": 2, "post": 2}}, k=10, join_docs=False,
        ).collect(),
        "pinned": lambda q: idx.search_pinned(
            [1, 5], q, k=10, join_docs=False
        ).collect(),
        "distance_feature": lambda q: idx.search_distance_feature(
            "warc_ts", "2024-01-05T00:00:00", "7d", k=10,
            join_docs=False,
        ).collect(),
        "match_fuzzy": lambda q: idx.search_match_fuzzy(
            q, k=10, join_docs=False
        ).collect(),
        "terms_enum": lambda q: idx.terms_enum(q[:2], size=10),
        "intervals": lambda q: idx.search_intervals(
            " ".join(q.split()[:2]), max_gaps=4, ordered=True, k=10,
            join_docs=False,
        ).collect(),
    }

    results = {}
    for name, fn in ops.items():
        times = []
        for q in QUERIES:
            t = time.time()
            fn(q)
            times.append(time.time() - t)
        results[name] = _pcts(times)

    print(json.dumps({
        "n_pages": n_pages,
        "cpus": cpus,
        "build_s": round(build_s, 1),
        "docs_per_sec": round(n_pages / build_s, 0),
        "ops": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
