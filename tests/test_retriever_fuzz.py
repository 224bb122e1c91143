"""Retriever-API and _update_by_query robustness fuzz (VERDICT r2
item 8): randomly composed bodies must either execute or refuse LOUDLY
with NotImplementedError/ValueError/KeyError — never die with an
arbitrary exception.  Covers execute_es_retriever (rrf/linear roots,
standard/knn entries, weights/normalizers) and
execute_es_update_by_query (script lang/source shapes, query
selectors, malformed SQL expressions — which must refuse typed, not
leak Parse/AnalysisException)."""

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_update_by_query
from search_engine_spark.query.rrf import execute_es_retriever
from search_engine_spark.synth import synth_pages

WORDS = ["python", "data", "spark", "machine", "learning", "zzz"]
DIM = 8


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("retr_fuzz_idx"))
    build_index(
        spark, synth_pages(spark, 120, num_partitions=4), root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
    )
    return BM25Index(spark, root)


@pytest.fixture(scope="module")
def emb(spark, idx):
    # deterministic vectors aligned with the index's doc ids
    return idx.docs.select(
        "doc_id",
        F.array(*[
            (F.sin(F.col("doc_id") * (i + 1)) * 2.0).alias(f"c{i}")
            for i in range(DIM)
        ]).alias("embedding"),
    ).cache()


def _query(rng):
    return rng.choice([
        {"match": {"content": " ".join(rng.choices(WORDS, k=2))}},
        {"match_all": {}},
        {"range": {"doclen": {"gte": 1}}},
        {"term": {"domain": "news.site.com"}},
    ])


def _entry(rng):
    kind = rng.choice(
        ["standard"] * 5 + ["knn"] * 4 + ["hybrid"]  # hybrid → refusal
    )
    if kind == "standard":
        e = {"standard": {"query": _query(rng)}}
        if rng.random() < 0.3:
            e["standard"]["filter"] = {"range": {"doclen": {"gte": 1}}}
        return e
    if kind == "knn":
        dim = DIM if rng.random() < 0.8 else 5  # wrong dim must not crash
        return {"knn": {
            "query_vector": [rng.uniform(-1, 1) for _ in range(dim)],
            "k": rng.randint(1, 10),
        }}
    return {"hybrid": {}}


def _retriever_body(rng):
    root = rng.choice(["rrf"] * 5 + ["linear"] * 4 + ["bucket"])
    n = rng.choice([1, 2, 2, 2, 3, 3])  # 1 → "needs at least two" refusal
    if root == "linear":
        entries = []
        for _ in range(n):
            if rng.random() < 0.08:
                entries.append(_entry(rng))  # unwrapped → refusal
            else:
                e = {"retriever": _entry(rng)}
                if rng.random() < 0.6:
                    e["weight"] = rng.choice([0.5, 1.0, 2.0])
                if rng.random() < 0.6:
                    e["normalizer"] = rng.choice(
                        ["minmax", "minmax", "l2_norm", "l2_norm",
                         "none", "softmax_bogus"]
                    )
                entries.append(e)
    else:
        entries = [_entry(rng) for _ in range(n)]
    spec = {"retrievers": entries}
    if rng.random() < 0.5:
        spec["rank_constant"] = rng.randint(1, 100)
    if rng.random() < 0.5:
        spec["rank_window_size"] = rng.randint(5, 50)
    return {"retriever": {root: spec}, "size": rng.randint(1, 10)}


ALLOWED = (NotImplementedError, ValueError, KeyError)


@pytest.mark.parametrize("seed", [20260821, 31, 555])
def test_fuzzed_retrievers_execute_or_refuse_loudly(spark, idx, emb, seed):
    rng = random.Random(seed)
    executed = refused = 0
    for i in range(25):
        body = _retriever_body(rng)
        embeddings = emb if rng.random() < 0.9 else None
        try:
            df = execute_es_retriever(idx, body, embeddings=embeddings)
            assert df.count() >= 0
            executed += 1
        except ALLOWED:
            refused += 1
        except Exception as e:
            raise AssertionError(
                f"retriever body #{i} crashed with "
                f"{type(e).__name__}: {e}\n{body}"
            ) from e
    assert executed >= 5, (executed, refused)
    assert refused >= 3, (executed, refused)


# ---------------------------------------------------------------------------
# _update_by_query: a MUTATING surface — fresh index per seed; after the
# fuzz run the index must still answer searches (merge-layer integrity).
# ---------------------------------------------------------------------------


def _ubq_body(rng):
    ok = [
        {"lang": "spark_sql", "source": {"lang": "'en'"}},
        {"lang": "spark_sql",
         "source": {"warc_ts": "warc_ts"}},               # identity
        {"lang": "spark_sql",
         "source": {"html": "concat(html, '<!-- u -->')"}},
    ]
    bad = [
        None,                                             # → refusal
        {"lang": "painless",
         "source": "ctx._source.lang = 'en'"},            # → refusal
        {"lang": "spark_sql", "source": "lang = 'en'"},   # → refusal (str)
        {"lang": "spark_sql", "source": {"url": "'x'"}},  # → refusal
        {"lang": "spark_sql",
         "source": {"lang": "not_a_column + 1"}},         # → typed refusal
        {"lang": "spark_sql",
         "source": {"lang": "((("}},                      # → typed refusal
    ]
    script = rng.choice(ok * 3 + bad)  # ~60% executable scripts
    body = {} if script is None else {"script": script}
    q = rng.choice([
        None,
        {"match_all": {}},
        {"match": {"content": rng.choice(WORDS)}},
        {"bool": {"filter": [{"range": {"doclen": {"gte": 5000}}}]}},
    ])
    if q is not None:
        body["query"] = q
    return body


@pytest.mark.parametrize("seed", [20260821, 41])
def test_fuzzed_update_by_query_executes_or_refuses_loudly(
    spark, tmp_path_factory, seed
):
    root = str(tmp_path_factory.mktemp(f"ubq_fuzz_{seed}"))
    pages = synth_pages(spark, 60, num_partitions=4).cache()
    build_index(
        spark, pages, root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
    )
    idx = BM25Index(spark, root, seed_min_df=0)
    live_before = idx._drop_tombstones(idx.docs.select("doc_id")).count()
    rng = random.Random(seed)
    executed = refused = 0
    for i in range(10):
        body = _ubq_body(rng)
        try:
            res = execute_es_update_by_query(idx, body, pages)
            assert res.matched >= 0
            executed += 1
            idx = BM25Index(spark, root, seed_min_df=0)  # see the merge
        except ALLOWED:
            refused += 1
        except Exception as e:
            raise AssertionError(
                f"ubq body #{i} crashed with "
                f"{type(e).__name__}: {e}\n{body}"
            ) from e
    assert executed >= 2, (executed, refused)
    assert refused >= 2, (executed, refused)
    # updates re-index, never create/destroy documents — and the index
    # must still answer queries after the whole battery
    live_after = idx._drop_tombstones(idx.docs.select("doc_id")).count()
    assert live_after == live_before
    assert idx.search("python data", k=5).count() >= 0
    pages.unpersist()
