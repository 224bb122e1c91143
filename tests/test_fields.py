"""Multi-field best_fields BM25 (query/bm25.py:search_fields) — the
reference's flagship ES multi_match query shape (main.py:162-189,
boosts title^3 description^2 content) — rank-identical to the pure-
Python BestFieldsOracle over the same per-field token streams."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import BestFieldsOracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 300
BOOSTS = {"content": 1.0, "title": 3.0, "description": 2.0}

QUERIES = [
    "python programming tutorial",
    "quick brown fox",
    "page 17",          # title-shaped term
    "search engine ranking",
    "database partition",
]


@pytest.fixture(scope="module")
def fielded(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fields_idx"))
    pages = synth_pages(spark, N_PAGES, num_partitions=6)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32,
        num_partitions=8, resume=False, index_fields=True,
    )
    stage = spark.read.parquet(paths.tokens_stage).select(
        "doc_id", "title", "description"
    ).collect()
    docs_tbl = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs_tbl}
    texts = pages.select("url", "text").collect()
    field_docs = {
        "content": {
            id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts
        },
        "title": {r["doc_id"]: tokenize_py(r["title"] or "") for r in stage},
        "description": {
            r["doc_id"]: tokenize_py(r["description"] or "") for r in stage
        },
    }
    return paths, BestFieldsOracle(field_docs, BOOSTS)


class TestBestFields:
    @pytest.mark.parametrize("query", QUERIES)
    def test_rank_identity_vs_oracle(self, spark, fielded, query):
        paths, oracle = fielded
        idx = BM25Index(spark, paths.root)
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_fields(query, k=10, boosts=BOOSTS, join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        want = oracle.topk(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, query

    def test_tie_breaker_mode(self, spark, fielded):
        paths, oracle = fielded
        idx = BM25Index(spark, paths.root)
        q = "python programming"
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_fields(
                q, k=10, boosts=BOOSTS, tie_breaker=0.3, join_docs=False
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        want = oracle.topk(q, k=10, tie_breaker=0.3)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    def test_title_boost_changes_ranking(self, spark, fielded):
        """A title hit must outrank an equal content hit under ^3."""
        paths, _ = fielded
        idx = BM25Index(spark, paths.root)
        flat = {"content": 1.0, "title": 1.0, "description": 1.0}
        q = "page 17"
        boosted = [
            r["doc_id"]
            for r in idx.search_fields(q, k=20, boosts=BOOSTS, join_docs=False).collect()
        ]
        assert boosted  # title terms resolve through the t! namespace

    def test_content_only_query_matches_plain_search(self, spark, fielded):
        """With boosts {content: 1} only, search_fields degenerates to
        the single-field engine."""
        paths, _ = fielded
        idx = BM25Index(spark, paths.root)
        q = "database partition"
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_fields(
                q, k=10, boosts={"content": 1.0}, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search(q, k=10, mode="exhaustive", join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        assert a == b

    def test_plain_search_unaffected_by_field_postings(self, spark, fielded):
        """Namespaced postings must be invisible to single-field search
        (terms carry the t!/d! prefix, never matched by bare terms)."""
        paths, oracle = fielded
        idx = BM25Index(spark, paths.root)
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search(
                "python programming tutorial", k=10, mode="exhaustive",
                join_docs=False,
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = [
            (d, round(s, 9))
            for d, s in oracle.oracles["content"].topk(
                "python programming tutorial", k=10
            )
        ]
        assert got == want


class TestFieldedMerge:
    def test_merge_and_compact_keep_field_semantics(self, spark, tmp_path):
        from search_engine_spark.index.merge import compact_index, merge_pages

        root = str(tmp_path / "fidx")
        out = str(tmp_path / "fcompact")
        fresh = str(tmp_path / "ffresh")
        pages = synth_pages(spark, 160, num_partitions=4)
        o = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        build_index(
            spark, pages.filter(o < 120), root, num_buckets=8, block_size=16,
            num_partitions=4, resume=False, index_fields=True,
        )
        res = merge_pages(
            spark, root, pages.filter(o >= 100), num_buckets=8,
            block_size=16, num_partitions=4,
        )  # index_fields auto-detected from the base
        assert res.new_docs == 60 and res.tombstoned == 20
        idx = BM25Index(spark, root)
        r = idx.search_fields("python programming", k=10, boosts=BOOSTS)
        assert 0 < r.count() <= 10
        # field stats merged: all three fields present, avgdl > 0
        fs = {x["field"]: x["avgdl"] for x in
              spark.read.parquet(idx.paths.field_stats).collect()}
        assert set(fs) == {"content", "title", "description"}
        assert all(v > 0 for v in fs.values())

        compact_index(spark, root, out, num_buckets=8, block_size=16,
                      num_partitions=4)
        build_index(spark, pages, fresh, num_buckets=8, block_size=16,
                    num_partitions=4, resume=False, index_fields=True)
        idx_c = BM25Index(spark, out)
        idx_f = BM25Index(spark, fresh)
        for q in ["python programming", "quick brown fox"]:
            a = sorted(
                (round(r["score"], 8), r["url"])
                for r in idx_c.search_fields(q, k=160, boosts=BOOSTS).collect()
            )
            b = sorted(
                (round(r["score"], 8), r["url"])
                for r in idx_f.search_fields(q, k=160, boosts=BOOSTS).collect()
            )
            assert a == b, q


class TestFieldedWAND:
    def test_blockmax_equals_exhaustive(self, spark, fielded):
        """Fielded WAND pruning is exact: per-block bounds use each
        field's own avgdl and the boost-aware survive condition."""
        paths, _ = fielded
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        for q in QUERIES:
            bm = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search_fields(
                    q, k=10, boosts=BOOSTS, mode="blockmax", join_docs=False
                ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
            ]
            ex = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search_fields(
                    q, k=10, boosts=BOOSTS, mode="exhaustive", join_docs=False
                ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
            ]
            assert bm == ex, q

    def test_tie_breaker_skips_pruning(self, spark, fielded):
        """tie_breaker>0 falls back to exhaustive (prune proof only
        covers the pure-max combine) and stays oracle-correct."""
        paths, oracle = fielded
        idx = BM25Index(spark, paths.root, seed_min_df=0)
        q = "python programming tutorial"
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_fields(
                q, k=10, boosts=BOOSTS, tie_breaker=0.5, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = [(d, round(s, 9)) for d, s in oracle.topk(q, k=10, tie_breaker=0.5)]
        assert got == want


class TestCrossFields:
    """ES multi_match cross_fields (search_cross_fields) — term-centric
    blended-df scoring, rank-identical to CrossFieldsOracle."""

    @pytest.mark.parametrize("query", QUERIES)
    def test_rank_identity_vs_oracle(self, spark, fielded, query):
        from search_engine_spark.query.oracle import CrossFieldsOracle

        paths, bf_oracle = fielded
        oracle = CrossFieldsOracle(
            {f: o.docs for f, o in bf_oracle.oracles.items()}, BOOSTS
        )
        idx = BM25Index(spark, paths.root)
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_cross_fields(
                query, k=10, boosts=BOOSTS, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = oracle.topk(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, query

    def test_tie_breaker(self, spark, fielded):
        from search_engine_spark.query.oracle import CrossFieldsOracle

        paths, bf_oracle = fielded
        oracle = CrossFieldsOracle(
            {f: o.docs for f, o in bf_oracle.oracles.items()}, BOOSTS
        )
        idx = BM25Index(spark, paths.root)
        q = "python programming tutorial"
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_cross_fields(
                q, k=10, boosts=BOOSTS, tie_breaker=0.4, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = [(d, round(s, 9)) for d, s in oracle.topk(q, k=10, tie_breaker=0.4)]
        assert got == want

    def test_single_field_degenerates_to_plain_search(self, spark, fielded):
        """With one field the blend is the field's own df — identical
        to plain exhaustive search."""
        paths, _ = fielded
        idx = BM25Index(spark, paths.root)
        q = "database partition"
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_cross_fields(
                q, k=10, boosts={"content": 1.0}, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search(q, k=10, mode="exhaustive", join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        assert a == b

    def test_differs_from_best_fields_when_df_skews(self, spark, fielded):
        """Blended df is the point of cross_fields: scores must NOT all
        equal best_fields' when a term's df differs across fields."""
        paths, bf_oracle = fielded
        idx = BM25Index(spark, paths.root)
        q = "page 17"  # title-heavy terms: title df >> description df
        cf = {
            r["doc_id"]: round(r["score"], 9)
            for r in idx.search_cross_fields(q, k=10, boosts=BOOSTS, join_docs=False).collect()
        }
        bf = {
            r["doc_id"]: round(r["score"], 9)
            for r in idx.search_fields(q, k=10, boosts=BOOSTS, join_docs=False).collect()
        }
        assert cf and bf
        assert cf != bf


class TestCombinedFields:
    """ES combined_fields (search_combined_fields) — BM25F-pooled tf
    over the weighted fields, rank-identical to CombinedFieldsOracle."""

    WEIGHTS = {"content": 1.0, "title": 3.0, "description": 2.0}

    def _oracle(self, bf_oracle, weights=None):
        from search_engine_spark.query.oracle import CombinedFieldsOracle

        return CombinedFieldsOracle(
            {f: o.docs for f, o in bf_oracle.oracles.items()},
            weights or self.WEIGHTS,
        )

    @pytest.mark.parametrize("query", QUERIES)
    def test_rank_identity_vs_oracle(self, spark, fielded, query):
        paths, bf_oracle = fielded
        oracle = self._oracle(bf_oracle)
        idx = BM25Index(spark, paths.root)
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_combined_fields(
                query, k=10, weights=self.WEIGHTS, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = oracle.topk(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, query

    def test_differs_from_cross_fields_pooling(self, spark, fielded):
        """Pooling saturates once: a doc with the term split across
        fields scores differently than under per-field dis_max —
        guard that combined_fields isn't accidentally cross_fields."""
        from search_engine_spark.query.oracle import CrossFieldsOracle

        paths, bf_oracle = fielded
        field_docs = {f: o.docs for f, o in bf_oracle.oracles.items()}
        comb = self._oracle(bf_oracle).topk("python tutorial", k=10)
        cross = CrossFieldsOracle(field_docs, self.WEIGHTS).topk(
            "python tutorial", k=10
        )
        assert [s for _, s in comb] != [s for _, s in cross]

    def test_validation(self, spark, fielded):
        paths, _ = fielded
        idx = BM25Index(spark, paths.root)
        with pytest.raises(ValueError):
            idx.search_combined_fields("x", weights={"body": 1.0})
        with pytest.raises(ValueError):
            idx.search_combined_fields("x", weights={"title": 0.0})

    def test_dsl_lowering(self, spark, fielded):
        from search_engine_spark.query.dsl import execute_es_query

        paths, _ = fielded
        idx = BM25Index(spark, paths.root)
        body = {"query": {"combined_fields": {
            "query": "python programming tutorial",
            "fields": ["title^3", "description^2", "content"],
        }}, "size": 10}
        got = execute_es_query(idx, body, join_docs=False)
        want = idx.search_combined_fields(
            "python programming tutorial", k=10,
            weights=self.WEIGHTS, join_docs=False,
        )
        assert [tuple(r) for r in got.orderBy(
            F.desc("score"), F.asc("doc_id")).collect()
        ] == [tuple(r) for r in want.orderBy(
            F.desc("score"), F.asc("doc_id")).collect()]
