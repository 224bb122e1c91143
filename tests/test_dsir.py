"""DSIR importance-resampling data selection (ops/dsir.py) vs an
independent pure-Python recomputation of the paper's hashed-ngram
importance weights (Xie et al. 2023, arXiv:2302.03169)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.dsir import (
    DEFAULT_BUCKETS,
    dsir_log_weights,
    dsir_select,
)

DOCS = [
    # target rows (id % 2 == 0 here): "formal" vocabulary
    (0, ["the", "formal", "encyclopedia", "article", "text"]),
    (2, ["formal", "article", "the", "encyclopedia"]),
    (4, ["the", "article", "text", "formal"]),
    # raw pool: 1,3 formal-ish (should score high), 5,7 junk
    (1, ["formal", "article", "the", "text"]),
    (3, ["the", "encyclopedia", "formal"]),
    (5, ["buy", "cheap", "pills", "now", "now"]),
    (7, ["click", "here", "buy", "now"]),
    (9, []),  # empty doc: no grams, absent from weights
]


def _py_weights(n_buckets=DEFAULT_BUCKETS):
    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(toks):
        return list(toks) + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]

    ct, cr = {}, {}
    for i, toks in DOCS:
        tgt = i % 2 == 0
        for g in grams(toks):
            b = md5int(g) % n_buckets
            (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for i, toks in DOCS:
        if i % 2 == 0 or not toks:
            continue
        w = 0.0
        for g in grams(toks):
            b = md5int(g) % n_buckets
            w += math.log((ct.get(b, 0) + 1) / (nt + n_buckets))
            w -= math.log((cr.get(b, 0) + 1) / (nr + n_buckets))
        out[i] = round(w, 6)
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, toks array<string>")


class TestDsir:
    def test_weights_match_python_oracle(self, spark, df):
        got = {
            r["id"]: r["log_w"]
            for r in dsir_log_weights(
                df, "doc_id", "toks", F.col("doc_id") % 2 == 0
            ).collect()
        }
        want = _py_weights()
        assert set(got) == set(want)
        for i in want:
            assert abs(got[i] - want[i]) < 2e-6, (i, got[i], want[i])

    def test_formal_raw_docs_outrank_junk(self, spark, df):
        sel = dsir_select(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0, k=2
        ).collect()
        assert [r["id"] for r in sel] == sorted(
            _py_weights(), key=lambda i: (-_py_weights()[i], i)
        )[:2]
        assert {r["id"] for r in sel} == {1, 3}  # formal-ish beat junk

    def test_target_and_empty_rows_never_selected(self, spark, df):
        sel = {r["id"] for r in dsir_select(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0, k=100
        ).collect()}
        assert sel == {1, 3, 5, 7}  # raw, non-empty only

    def test_gumbel_noise_deterministic(self, spark, df):
        a = [tuple(r) for r in dsir_select(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0, k=4,
            noise=True, seed=7,
        ).collect()]
        b = [tuple(r) for r in dsir_select(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0, k=4,
            noise=True, seed=7,
        ).collect()]
        assert a == b
        c = [tuple(r) for r in dsir_select(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0, k=4,
            noise=True, seed=8,
        ).collect()]
        assert {x[0] for x in c} == {1, 3, 5, 7}  # same pool, any order

    def test_bad_buckets_refused(self, spark, df):
        with pytest.raises(ValueError):
            dsir_log_weights(
                df, "doc_id", "toks", F.col("doc_id") % 2 == 0, n_buckets=0
            )

    def test_plan_broadcasts_ratio_table(self, spark, df):
        plan = (
            dsir_log_weights(df, "doc_id", "toks", F.col("doc_id") % 2 == 0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" not in plan  # fully native

    def test_default_path_leaks_no_cache_entry(self, spark, df):
        """keep_cached=False (the default) returns an UNcached frame
        and leaves ZERO persistent RDDs behind — the default path
        cannot leak even if the caller never unpersists (ADVICE r4)."""
        def ids():
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it, out = m.keySet().iterator(), set()
            while it.hasNext():
                out.add(it.next())
            return out

        before = ids()
        w = dsir_log_weights(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0,
            n_buckets=64,
        )
        assert not (w.storageLevel.useMemory or w.storageLevel.useDisk)
        w.count()  # a caller action still computes fine post-return
        assert not (ids() - before)

    def test_gram_cache_released_weights_persisted(self, spark, df):
        """keep_cached=True: the corpus-sized gram explode is persisted
        across its three consumers and RELEASED before return; only the
        small per-doc weights frame stays cached (ADVICE r3: one
        explode per call)."""
        def ids():
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it, out = m.keySet().iterator(), set()
            while it.hasNext():
                out.add(it.next())
            return out

        before = ids()
        # distinct n_buckets => distinct plan: Spark's cacheManager
        # dedups persist() by logical plan, so reusing another test's
        # exact arguments would ride its cache entry instead of
        # creating one
        w = dsir_log_weights(
            df, "doc_id", "toks", F.col("doc_id") % 2 == 0,
            n_buckets=128, keep_cached=True,
        )
        assert w.storageLevel.useMemory or w.storageLevel.useDisk
        # exactly ONE new cached frame (the weights); the gram blocks
        # were released inside the call (set-diff: the async
        # ContextCleaner may drop stale entries concurrently)
        assert len(ids() - before) == 1
        w.unpersist(blocking=True)
        assert not (ids() - before)
