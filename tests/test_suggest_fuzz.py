"""Suggest-surface robustness fuzz (VERDICT r2 item 8): randomly
composed `suggest` request bodies must either execute (every suggester
returning a DataFrame) or refuse LOUDLY with NotImplementedError/
ValueError/KeyError — never die with an arbitrary exception.  Same
executes-or-refuses-typed property the DSL/aggs fuzzers pin, extended
to execute_es_suggest's term/phrase/completion lowering."""

import random

import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_suggest
from search_engine_spark.synth import synth_pages

WORDS = ["python", "pythn", "learnign", "data", "spark", "zzz",
         "machine", "tutorial", "qery"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("suggest_fuzz_idx"))
    build_index(
        spark, synth_pages(spark, 120, num_partitions=4), root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
        index_shingles=True,  # phrase suggester needs the shingle LM
    )
    return BM25Index(spark, root)


def _text(rng):
    return " ".join(rng.choices(WORDS, k=rng.randint(1, 3)))


def _node(rng):
    kind = rng.choice(
        ["term", "term", "phrase", "phrase", "completion", "completion",
         "geo_context",      # unknown node type → refusal
         "two_kinds",        # two suggester kinds in one node → refusal
         "no_text"]          # missing text/prefix → refusal
    )
    if kind == "no_text":
        return {"term": {"field": "content"}}
    if kind == "two_kinds":
        return {"text": _text(rng), "term": {}, "phrase": {}}
    if kind == "geo_context":
        return {"text": _text(rng), "geo_context": {"precision": 3}}
    # field: absent (ok), content (ok), title (documented refusal)
    field = rng.choice([None, None, "content", "title"])
    spec = {}
    if field:
        spec["field"] = field
    if kind == "term":
        if rng.random() < 0.6:
            spec["size"] = rng.randint(1, 5)
        if rng.random() < 0.5:
            spec["max_edits"] = rng.choice([1, 2])
        if rng.random() < 0.4:
            spec["prefix_length"] = rng.randint(0, 2)
        if rng.random() < 0.4:
            spec["min_word_length"] = rng.randint(2, 5)
        if rng.random() < 0.5:
            spec["suggest_mode"] = rng.choice(
                ["missing", "popular", "always"]
            )
        return {"text": _text(rng), "term": spec}
    if kind == "phrase":
        if rng.random() < 0.5:
            spec["size"] = rng.randint(1, 4)
        if rng.random() < 0.4:
            spec["max_errors"] = rng.choice([1, 2])
        if rng.random() < 0.4:
            spec["confidence"] = rng.choice([0.0, 1.0, 2.0])
        if rng.random() < 0.4:
            spec["direct_generator"] = [{
                "field": "content",
                "max_edits": rng.choice([1, 2]),
                "size": rng.randint(1, 5),
            }]
        if rng.random() < 0.2:
            spec["collate"] = {"query": {}}
        return {"text": _text(rng), "phrase": spec}
    # completion
    if rng.random() < 0.6:
        spec["size"] = rng.randint(1, 5)
    return {"prefix": rng.choice(["py", "da", "zz", "ma"]),
            "completion": spec}


def _body(rng):
    if rng.random() < 0.08:
        return {}  # no suggest section → refusal
    return {"suggest": {
        f"s{i}": _node(rng) for i in range(rng.randint(1, 3))
    }}


ALLOWED = (NotImplementedError, ValueError, KeyError)


@pytest.mark.parametrize("seed", [20260821, 13, 77])
def test_fuzzed_suggest_executes_or_refuses_loudly(spark, idx, seed):
    rng = random.Random(seed)
    executed = refused = 0
    for i in range(25):
        body = _body(rng)
        try:
            out = execute_es_suggest(idx, body)
            assert isinstance(out, dict) and out
            for name, df in out.items():
                assert df.count() >= 0, name
            executed += 1
        except ALLOWED:
            refused += 1
        except Exception as e:
            raise AssertionError(
                f"suggest body #{i} crashed with "
                f"{type(e).__name__}: {e}\n{body}"
            ) from e
    assert executed >= 5, (executed, refused)
    assert refused >= 3, (executed, refused)
