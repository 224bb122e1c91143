"""Measure the phrase rarest-term candidate gate (query/bm25.py
_conjunctive_candidates) on a corpus large enough for decode+shuffle to
matter.  Phrases pair a Zipf-head term with a rare term, the shape the
gate exists for: ungated, the positional decode pays the head term's
full posting volume; gated, it is bounded by the rare term's df.

Usage: python scripts/bench_phrase_gate.py [n_pages] [cpus]
Prints one JSON line {n_pages, queries, p50_off, p50_on, speedup}.
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
from search_engine_spark.text.tokenizer import tokenize_py


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        app_name="bench_phrase_gate",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    root = tempfile.mkdtemp(prefix="phrase_gate_")
    pages = synth_pages(spark, n_pages, num_partitions=cpus * 2)
    t0 = time.time()
    build_index(
        spark, pages, root,
        num_buckets=32, block_size=128, num_partitions=cpus * 2,
        index_positions=True,
    )
    build_s = time.time() - t0

    # head+rare phrases lifted from raw docs: a span around a zq-token
    # (unique per page) also containing at least one common word
    sample = pages.select("url", "text").limit(40).collect()
    queries = []
    for r in sample:
        words = r["text"].split()
        for i, w in enumerate(words):
            if w.startswith("zq") and 1 <= i < len(words) - 1:
                span = " ".join(words[i - 1 : i + 2])
                if len(set(tokenize_py(span))) >= 2:
                    queries.append(span)
                break
        if len(queries) >= 8:
            break

    idx = BM25Index(spark, root, seed_min_df=0)

    def run(label: str, reps: int = 3):
        lat = {q: [] for q in queries}
        for _ in range(reps):
            for q in queries:
                t = time.time()
                idx.search_phrase(q, k=10, join_docs=False).collect()
                lat[q].append(time.time() - t)
        best = sorted(min(v) for v in lat.values())
        return best[len(best) // 2], best

    # warm the JVM/scan caches once so neither mode pays first-run costs
    idx.search_phrase(queries[0], k=10, join_docs=False).collect()

    idx.phrase_cand_max_df = 0          # gate OFF
    p50_off, off = run("off")
    idx.phrase_cand_max_df = 1_000_000  # gate forced ON
    idx.phrase_cand_ratio = 8.0
    idx.phrase_cand_min_pruned = 0
    p50_on, on = run("on")

    # sanity: identical results both modes on one query
    idx.phrase_cand_max_df = 0
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         idx.search_phrase(queries[0], k=10, join_docs=False).collect()]
    idx.phrase_cand_max_df = 1_000_000
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         idx.search_phrase(queries[0], k=10, join_docs=False).collect()]
    assert a == b and a, (a, b)

    print(json.dumps({
        "n_pages": n_pages, "cpus": cpus, "build_s": round(build_s, 1),
        "n_queries": len(queries),
        "p50_off_s": round(p50_off, 3), "p50_on_s": round(p50_on, 3),
        "speedup": round(p50_off / p50_on, 2),
        "off_best": [round(x, 3) for x in off],
        "on_best": [round(x, 3) for x in on],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
