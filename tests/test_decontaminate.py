"""Benchmark n-gram decontamination (ops/decontaminate) vs a pure
Python oracle — the GPT-3-style leaked-window rule over the canonical
unstemmed token stream."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.decontaminate import (
    decontaminate,
    ngram_contamination,
)
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N = 6  # window length kept short so the tiny corpus overlaps


def _grams(text, n=N):
    toks = tokenize_py(text, stem=False)
    return {
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    }


@pytest.fixture(scope="module")
def data(spark):
    pages = synth_pages(spark, 120, num_partitions=4).select(
        F.sha2("url", 256).alias("doc_id"), "text"
    )
    rows = pages.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    # benchmark = two corpus docs verbatim (full leak), one doc's
    # half (partial leak), one never-seen string
    ids = sorted(texts)
    bench_texts = [
        texts[ids[3]],
        texts[ids[40]],
        " ".join(texts[ids[7]].split()[:30]),
        "completely novel benchmark question about quasar spectra "
        "that shares no long window with the corpus at all",
    ]
    bench = spark.createDataFrame(
        [(t,) for t in bench_texts], "text string"
    )
    return pages, bench, texts, bench_texts


class TestNgramContamination:
    def test_matches_python_oracle(self, spark, data):
        pages, bench, texts, bench_texts = data
        bench_grams = set()
        for t in bench_texts:
            bench_grams |= _grams(t)
        got = {
            r["id"]: (r["n_grams"], r["n_matched"], r["contaminated"])
            for r in ngram_contamination(pages, bench, n=N).collect()
        }
        assert set(got) == set(texts)
        for d, text in texts.items():
            g = _grams(text)
            want = (len(g), len(g & bench_grams), len(g & bench_grams) > 0)
            assert got[d] == want, d

    def test_verbatim_docs_fully_matched(self, spark, data):
        pages, bench, texts, bench_texts = data
        leaked_full = {
            d for d, t in texts.items() if t in bench_texts
        }
        rows = ngram_contamination(pages, bench, n=N).collect()
        for r in rows:
            if r["id"] in leaked_full:
                assert r["contaminated"]
                assert r["n_matched"] == r["n_grams"] > 0

    def test_sort_merge_path_equal(self, spark, data):
        pages, bench, *_ = data
        a = sorted(
            tuple(r) for r in
            ngram_contamination(pages, bench, n=N).collect()
        )
        b = sorted(
            tuple(r) for r in
            ngram_contamination(
                pages, bench, n=N, broadcast_bench=False
            ).collect()
        )
        assert a == b

    def test_short_docs_zero_filled(self, spark):
        docs = spark.createDataFrame(
            [("a", "too short"), ("b", None), ("c", "")],
            "doc_id string, text string",
        )
        bench = spark.createDataFrame([("anything here",)], "text string")
        rows = {
            r["id"]: tuple(r)[1:]
            for r in ngram_contamination(docs, bench, n=N).collect()
        }
        assert rows == {
            "a": (0, 0, False), "b": (0, 0, False), "c": (0, 0, False)
        }

    def test_bad_n(self, spark, data):
        pages, bench, *_ = data
        with pytest.raises(ValueError):
            ngram_contamination(pages, bench, n=0)


class TestDecontaminate:
    def test_strict_drop(self, spark, data):
        pages, bench, texts, bench_texts = data
        flagged = {
            r["id"]
            for r in ngram_contamination(pages, bench, n=N).collect()
            if r["contaminated"]
        }
        kept = decontaminate(pages, bench, n=N)
        assert set(
            r["doc_id"] for r in kept.select("doc_id").collect()
        ) == set(texts) - flagged
        # schema preserved
        assert kept.columns == pages.columns

    def test_fraction_threshold(self, spark, data):
        pages, bench, texts, _ = data
        rows = ngram_contamination(pages, bench, n=N).collect()
        fr = {
            r["id"]: (r["n_matched"] / r["n_grams"] if r["n_grams"] else 0.0)
            for r in rows
        }
        thresh = 0.5
        kept = decontaminate(
            pages, bench, n=N, max_overlap_fraction=thresh
        )
        assert set(
            r["doc_id"] for r in kept.select("doc_id").collect()
        ) == {d for d in texts if fr[d] <= thresh}

    def test_plan_broadcasts_bench(self, spark, data):
        pages, bench, *_ = data
        plan = ngram_contamination(
            pages, bench, n=N
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
