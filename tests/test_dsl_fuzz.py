"""ES-DSL robustness fuzz: randomly composed request bodies must
either execute (returning a DataFrame) or refuse LOUDLY with
NotImplementedError/ValueError/KeyError — never die with an arbitrary
exception deep in the engine.  This pins the module's 'documented
subset — unsupported shapes raise naming the gap, never a silent
wrong answer' contract against shapes no hand-written test composes."""

import random

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_query
from search_engine_spark.synth import synth_pages

WORDS = ["python", "data", "spark", "query", "fox", "tutorial",
         "machine", "learning", "pythn", "zzz"]
FIELDS = ["content", "title", "description", "domain"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fuzz_idx"))
    build_index(
        spark, synth_pages(spark, 150, num_partitions=4), root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
        index_fields=True, index_positions=True,
    )
    return BM25Index(spark, root)


def _text(rng):
    return " ".join(rng.choices(WORDS, k=rng.randint(1, 3)))


def _leaf(rng, depth):
    kind = rng.choice(
        ["match", "match_s", "match_phrase", "prefix", "wildcard",
         "fuzzy", "term", "range", "exists", "match_all", "bool"]
        if depth > 0
        else ["match", "match_s", "match_phrase", "term", "match_all"]
    )
    if kind == "match":
        spec = {"query": _text(rng)}
        if rng.random() < 0.3:
            spec["operator"] = rng.choice(["and", "or"])
        if rng.random() < 0.2:
            spec["fuzziness"] = rng.choice([1, 2, "AUTO"])
        if rng.random() < 0.2:
            spec["minimum_should_match"] = rng.randint(1, 3)
        return {"match": {rng.choice(FIELDS): spec}}
    if kind == "match_s":
        return {"match": {rng.choice(FIELDS): _text(rng)}}
    if kind == "match_phrase":
        spec = _text(rng) if rng.random() < 0.5 else {
            "query": _text(rng), "slop": rng.randint(0, 2)
        }
        return {"match_phrase": {rng.choice(FIELDS): spec}}
    if kind == "prefix":
        return {"prefix": {rng.choice(FIELDS): "py"}}
    if kind == "wildcard":
        return {"wildcard": {rng.choice(FIELDS): "py*on"}}
    if kind == "fuzzy":
        return {"fuzzy": {rng.choice(FIELDS): {"value": "pythn"}}}
    if kind == "term":
        return {"term": {"domain": "news.site.com"}}
    if kind == "range":
        return {"range": {"doclen": {"gte": 1, "lt": 10_000}}}
    if kind == "exists":
        return {"exists": {"field": rng.choice(FIELDS)}}
    if kind == "match_all":
        return {"match_all": {}}
    # bool
    node = {}
    for sect in ("must", "should", "must_not", "filter"):
        if rng.random() < 0.45:
            node[sect] = [
                _leaf(rng, depth - 1)
                for _ in range(rng.randint(1, 2))
            ]
    return {"bool": node or {"must": [_leaf(rng, depth - 1)]}}


def _body(rng):
    body = {"query": _leaf(rng, 2), "size": rng.choice([0, 3, 10])}
    if rng.random() < 0.3:
        body["from"] = rng.randint(0, 5)
    if rng.random() < 0.3:
        body["_source"] = rng.choice(
            [["url"], "url", ["url", "title"]]
        )
    if rng.random() < 0.2:
        body["highlight"] = {"fields": {"title": {}}}
    if rng.random() < 0.15:
        body["sort"] = [{"doclen": {"order": "desc"}}]
    if rng.random() < 0.15:
        body["collapse"] = {"field": "domain"}
    return body


ALLOWED = (NotImplementedError, ValueError, KeyError)


@pytest.mark.parametrize("seed", [20260821, 7, 99])
def test_fuzzed_bodies_execute_or_refuse_loudly(spark, idx, seed):
    rng = random.Random(seed)
    executed = refused = 0
    for i in range(30):
        body = _body(rng)
        try:
            df = execute_es_query(idx, body, join_docs=True)
            n = df.count()
            assert n >= 0
            executed += 1
        except ALLOWED:
            refused += 1
        except Exception as e:  # anything else is a crash, not a refusal
            raise AssertionError(
                f"body #{i} crashed with {type(e).__name__}: {e}\n{body}"
            ) from e
    # the grammar must actually exercise both outcomes
    assert executed >= 5, (executed, refused)
    assert refused >= 3, (executed, refused)
