"""Multi-index search (ES GET /i1,i2/_search) — query_then_fetch merge
semantics and dfs_query_then_fetch rank-identity vs ONE combined index
over the union of the corpora.

The reference's ES serves every query against an index list; dfs mode
pools global term stats first, which must make the multi-index ranking
indistinguishable from having indexed everything together — that
equivalence is the correctness oracle here (no hand-written expected
values can drift).
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.multi import count_multi, search_multi
from search_engine_spark.synth import synth_pages

N_PAGES = 240

QUERIES = [
    "python programming tutorial",
    "quick brown fox",
    "machine learning data science",
]


@pytest.fixture(scope="module")
def indices(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("multi"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    half = F.abs(F.xxhash64("url")) % 2
    pages_a = pages.filter(half == 0)
    pages_b = pages.filter(half == 1)
    kw = dict(num_buckets=8, block_size=32, num_partitions=4)
    pa = build_index(spark, pages_a, f"{root}/a", **kw)
    pb = build_index(spark, pages_b, f"{root}/b", **kw)
    pc = build_index(spark, pages, f"{root}/all", **kw)
    idx_a = BM25Index(spark, pa.root, seed_min_df=0)
    idx_b = BM25Index(spark, pb.root, seed_min_df=0)
    idx_all = BM25Index(spark, pc.root, seed_min_df=0)
    return [("a", idx_a), ("b", idx_b)], idx_all


def _score_by_url(rows):
    return {r["url"]: r["score"] for r in rows}


class TestDfsQueryThenFetch:
    @pytest.mark.parametrize("query", QUERIES)
    def test_rank_identical_to_combined_index(self, indices, query):
        pair, idx_all = indices
        k = idx_all.count_matches(query) + 5
        multi = search_multi(
            pair, query, k=k, search_type="dfs_query_then_fetch"
        ).collect()
        comb = idx_all.search(query, k=k).collect()
        got = _score_by_url(multi)
        want = _score_by_url(comb)
        assert set(got) == set(want)
        for url, s in want.items():
            assert abs(got[url] - s) < 1e-9
        # unique on (_index, doc_id) and _index labels are real
        assert len({(r["_index"], r["doc_id"]) for r in multi}) == len(multi)
        assert {r["_index"] for r in multi} <= {"a", "b"}

    def test_and_mode(self, indices):
        pair, idx_all = indices
        query = "python tutorial"
        k = max(idx_all.count_matches(query, mode="and"), 1) + 3
        multi = search_multi(
            pair, query, k=k, search_type="dfs_query_then_fetch", mode="and"
        ).collect()
        comb = idx_all.search(query, k=k, mode="and").collect()
        got, want = _score_by_url(multi), _score_by_url(comb)
        assert set(got) == set(want)
        for url, s in want.items():
            assert abs(got[url] - s) < 1e-9

    def test_unindexed_query_is_empty(self, indices):
        pair, _ = indices
        out = search_multi(
            pair, "zzzzqqqq xyzzynotaterm", search_type="dfs_query_then_fetch"
        )
        assert out.count() == 0
        assert out.columns == ["_index", "doc_id", "score", "url", "title"]


class TestQueryThenFetch:
    @pytest.mark.parametrize("query", QUERIES[:2])
    def test_merges_per_index_topk(self, indices, query):
        pair, _ = indices
        k = 15
        per = []
        for name, idx in pair:
            per.extend(
                (float(r["score"]), name, int(r["doc_id"]), r["url"])
                for r in idx.search(query, k=k).collect()
            )
        per.sort(key=lambda t: (-t[0], t[1], t[2]))
        want = per[:k]
        got = [
            (float(r["score"]), r["_index"], int(r["doc_id"]), r["url"])
            for r in search_multi(pair, query, k=k).collect()
        ]
        assert got == want

    def test_local_stats_diverge_from_dfs(self, indices):
        # the two modes are genuinely different plans: with skewed df
        # across the halves, at least one query must order differently
        pair, _ = indices
        diverged = False
        for query in QUERIES:
            qtf = [
                (r["_index"], r["doc_id"])
                for r in search_multi(pair, query, k=10).collect()
            ]
            dfs = [
                (r["_index"], r["doc_id"])
                for r in search_multi(
                    pair, query, k=10, search_type="dfs_query_then_fetch"
                ).collect()
            ]
            if qtf != dfs:
                diverged = True
        assert diverged


class TestCountMulti:
    def test_sums_disjoint_indices(self, indices):
        pair, idx_all = indices
        for query in QUERIES:
            assert count_multi(pair, query) == idx_all.count_matches(query)


class TestIndicesBoost:
    """ES indices_boost: per-index score multipliers applied before
    the coordinating merge."""

    def test_boost_reorders_merge(self, indices):
        """Boosted merge == python merge of the PER-INDEX top-k lists
        with the boost applied (a boosted shard's lower hits may enter
        the merge that lost it unboosted — so the expectation must be
        built from per-shard lists, not the unboosted merge)."""
        pair, _ = indices
        q = QUERIES[0]
        boosts = {"a": 3.0}
        pool = []
        for name, idx in pair:
            rows = search_multi([(name, idx)], q, k=12).collect()
            pool += [
                (r["score"] * boosts.get(name, 1.0), name, r["url"])
                for r in rows
            ]
        want = sorted(pool, key=lambda x: (-x[0], x[1]))[:12]
        got = [
            (r["score"], r["_index"], r["url"])
            for r in search_multi(
                pair, q, k=12, indices_boost=boosts
            ).collect()
        ]
        assert len(got) == len(want)
        for (gs, gi, gu), (ws, wi, wu) in zip(got, want):
            assert (gi, gu) == (wi, wu)
            assert abs(gs - ws) < 1e-9

    def test_boost_in_dfs_mode(self, indices):
        pair, _ = indices
        q = QUERIES[0]
        # k larger than any shard's match count -> the plain run is the
        # full pool; the boosted top-10 must be its boosted re-rank
        plain = search_multi(
            pair, q, k=10_000, search_type="dfs_query_then_fetch"
        ).collect()
        boosted = search_multi(
            pair, q, k=10, search_type="dfs_query_then_fetch",
            indices_boost={"b": 2.0},
        ).collect()
        pool = sorted(
            (
                (r["score"] * (2.0 if r["_index"] == "b" else 1.0),
                 r["_index"], r["url"])
                for r in plain
            ),
            key=lambda x: (-x[0], x[1]),
        )[:10]
        assert len(boosted) == len(pool)
        for r, (ws, wi, wu) in zip(boosted, pool):
            assert (r["_index"], r["url"]) == (wi, wu)
            assert abs(r["score"] - ws) < 1e-9

    def test_unknown_index_name_refused(self, indices):
        pair, _ = indices
        with pytest.raises(ValueError):
            search_multi(pair, QUERIES[0], indices_boost={"nope": 2.0})

    def test_nonpositive_boost_refused(self, indices):
        """Boosts apply after per-index top-k; non-positive factors
        would invert/zero ordering over the wrong candidate set, so
        they must error (ADVICE round 1, multi.py)."""
        pair, _ = indices
        for bad in (0.0, -1.5):
            with pytest.raises(ValueError, match="must be > 0"):
                search_multi(pair, QUERIES[0], indices_boost={"a": bad})
