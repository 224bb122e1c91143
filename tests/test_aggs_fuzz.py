"""ES-aggs robustness fuzz (sibling of test_dsl_fuzz): randomly
composed aggs sections under random foregrounds must either execute or
refuse with a typed error — never an arbitrary engine exception."""

import random

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_aggs
from search_engine_spark.synth import synth_pages

NUM_FIELDS = ["doclen"]
KEY_FIELDS = ["domain", "url"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggs_fuzz_idx"))
    build_index(
        spark, synth_pages(spark, 150, num_partitions=4), root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
    )
    return BM25Index(spark, root)


def _metric(rng):
    op = rng.choice(["avg", "sum", "min", "max", "value_count"])
    return {op: {"field": rng.choice(NUM_FIELDS)}}


def _agg(rng, depth):
    kind = rng.choice(
        ["terms", "stats", "histogram", "range", "cardinality",
         "percentiles", "filters", "filter", "missing",
         "significant_terms", "multi_terms", "rare_terms"]
    )
    if kind == "terms":
        node = {"terms": {"field": rng.choice(KEY_FIELDS),
                          "size": rng.randint(1, 8)}}
        if depth > 0 and rng.random() < 0.5:
            node["aggs"] = {"sub": rng.choice(
                [_metric(rng), _agg(rng, 0)]
            )}
        return node
    if kind == "stats":
        return {"stats": {"field": rng.choice(NUM_FIELDS)}}
    if kind == "histogram":
        return {"histogram": {"field": "doclen",
                              "interval": rng.choice([5, 50, 500])}}
    if kind == "range":
        return {"range": {"field": "doclen",
                          "ranges": [{"to": 50}, {"from": 50}]}}
    if kind == "cardinality":
        return {"cardinality": {"field": rng.choice(KEY_FIELDS)}}
    if kind == "percentiles":
        return {"percentiles": {"field": "doclen",
                                "percents": [25, 50, 95]}}
    if kind == "filters":
        return {"filters": {"filters": {
            "a": {"term": {"domain": "news.site.com"}},
            "b": {"range": {"doclen": {"gte": 10}}},
        }}}
    if kind == "filter":
        node = {"filter": {"range": {"doclen": {"gte": 5}}}}
        if depth > 0 and rng.random() < 0.5:
            node["aggs"] = {"inner": _metric(rng)}
        return node
    if kind == "missing":
        return {"missing": {"field": rng.choice(KEY_FIELDS)}}
    if kind == "significant_terms":
        return {"significant_terms": {"size": 5}}
    if kind == "multi_terms":
        return {"multi_terms": {"terms": [
            {"field": "domain"}, {"field": "doclen"}
        ], "size": 5}}
    return {"rare_terms": {"field": "domain", "max_doc_count": 2}}


def _foreground(rng):
    return rng.choice([
        {"match": {"content": "python data"}},
        {"match_all": {}},
        {"bool": {"must": [{"match": {"content": "spark"}}],
                  "filter": [{"range": {"doclen": {"gte": 1}}}]}},
        {"match_phrase": {"content": "machine learning"}},
    ])


ALLOWED = (NotImplementedError, ValueError, KeyError)


@pytest.mark.parametrize("seed", [1, 42])
def test_fuzzed_aggs_execute_or_refuse_loudly(spark, idx, seed):
    rng = random.Random(seed)
    executed = refused = 0
    for i in range(25):
        body = {
            "query": _foreground(rng),
            "size": 0,
            "aggs": {f"a{j}": _agg(rng, 1)
                     for j in range(rng.randint(1, 2))},
        }
        try:
            out = execute_es_aggs(idx, body)
            assert isinstance(out, dict)
            executed += 1
        except ALLOWED:
            refused += 1
        except Exception as e:
            raise AssertionError(
                f"aggs body #{i} crashed with {type(e).__name__}: {e}\n{body}"
            ) from e
    assert executed >= 5, (executed, refused)
