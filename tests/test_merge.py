"""Incremental upsert (index/merge.py) — reference parity with the
indexer's overwrite-by-id path (indexer.py:236-247, 249-271, 273-293):

- re-crawled urls tombstone their old doc and index the new one
- tombstoned docs never surface in top-k (pre- and post-compaction)
- WAND block-max pruning stays EXACT on a merged index (bounds are
  recomputed from (max_tf, min_dl) under current stats, never read
  from stale block_max_score)
- compact_index folds tombstones out: ranking over the compacted index
  equals a from-scratch build over the surviving documents
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import (
    compact_index,
    live_docs,
    merge_pages,
    read_tombstones,
)
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages

N_ALL = 400
N_BASE = 300  # rows 0..299
BATCH_LO = 200  # rows 200..399 re-crawl 200..299, add 300..399

QUERIES = [
    "python programming tutorial",
    "quick brown fox",
    "machine learning data science",
    "database partition shuffle",
    "search engine ranking",
]


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("merged_idx"))
    all_pages = synth_pages(spark, N_ALL, num_partitions=6)
    # deterministic row split by the synthetic page ordinal in the url
    ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
    base_pages = all_pages.filter(ordinal < N_BASE)
    batch_pages = all_pages.filter(ordinal >= BATCH_LO)
    build_index(
        spark, base_pages, root, num_buckets=16, block_size=32,
        num_partitions=8, resume=False,
    )
    res = merge_pages(
        spark, root, batch_pages, num_buckets=16, block_size=32,
        num_partitions=8,
    )
    return root, res, all_pages


class TestMerge:
    def test_counts(self, spark, merged):
        root, res, _ = merged
        assert res.new_docs == N_ALL - BATCH_LO  # 200 batch docs
        assert res.tombstoned == N_BASE - BATCH_LO  # 100 re-crawled
        tomb = read_tombstones(spark, BM25Index(spark, root).paths)
        assert tomb.count() == N_BASE - BATCH_LO
        # live view: every url exactly once
        live = live_docs(spark, BM25Index(spark, root).paths)
        assert live.count() == N_ALL
        assert live.select("url").distinct().count() == N_ALL

    def test_corpus_stats_lucene_semantics(self, spark, merged):
        root, _, _ = merged
        idx = BM25Index(spark, root)
        # N counts tombstoned docs until compaction (Lucene docCount)
        assert idx.n_docs == N_BASE + (N_ALL - BATCH_LO)
        assert idx.merged

    def test_stats_nets_out_tombstones(self, spark, merged):
        root, _, _ = merged
        s = BM25Index(spark, root).stats()
        assert s["indexed_docs"] == N_ALL  # live docs only
        assert s["tombstoned_docs"] == N_BASE - BATCH_LO
        assert s["merged"] is True
        assert s["index_size_mb"] > 0

    def test_no_tombstone_in_topk(self, spark, merged):
        root, _, _ = merged
        idx = BM25Index(spark, root)
        tomb_ids = {
            r["doc_id"] for r in read_tombstones(spark, idx.paths).collect()
        }
        for q in QUERIES:
            got = idx.search(q, k=50, mode="exhaustive").collect()
            assert not ({r["doc_id"] for r in got} & tomb_ids), q

    def test_recrawled_url_resolves_to_new_doc(self, spark, merged):
        root, _, _ = merged
        idx = BM25Index(spark, root)
        # every url in results maps to exactly one (live) doc row
        for q in QUERIES[:2]:
            rows = idx.search(q, k=30).collect()
            assert len({r["url"] for r in rows}) == len(rows)

    def test_blockmax_equals_exhaustive_after_merge(self, spark, merged):
        """Stale stored block_max_score must not corrupt pruning: the
        merged-index bounds come from (max_tf, min_dl) + current stats."""
        root, _, _ = merged
        idx = BM25Index(spark, root, seed_min_df=0)
        assert idx.merged
        for q in QUERIES:
            bm = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search(q, k=20, mode="blockmax").collect()
            ]
            ex = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search(q, k=20, mode="exhaustive").collect()
            ]
            assert bm == ex, q


class TestCompact:
    @pytest.fixture(scope="class")
    def compacted(self, spark, merged, tmp_path_factory):
        root, _, all_pages = merged
        out = str(tmp_path_factory.mktemp("compact_idx"))
        fresh = str(tmp_path_factory.mktemp("fresh_idx"))
        compact_index(
            spark, root, out, num_buckets=16, block_size=32, num_partitions=8
        )
        build_index(
            spark, all_pages, fresh, num_buckets=16, block_size=32,
            num_partitions=8, resume=False,
        )
        return out, fresh

    def test_compacted_is_fresh_equivalent(self, spark, compacted):
        """Rank/score identity vs a from-scratch build over the same
        logical corpus, compared by url (doc ids differ by design)."""
        out, fresh = compacted
        idx_c = BM25Index(spark, out)
        idx_f = BM25Index(spark, fresh)
        assert idx_c.n_docs == idx_f.n_docs == N_ALL
        assert abs(idx_c.avgdl - idx_f.avgdl) < 1e-9
        for q in QUERIES:
            # k = corpus size -> full result set; canonicalize by
            # (-score, url) so equal-score ties compare stably
            a = sorted(
                (round(r["score"], 8), r["url"])
                for r in idx_c.search(q, k=N_ALL, mode="exhaustive").collect()
            )
            b = sorted(
                (round(r["score"], 8), r["url"])
                for r in idx_f.search(q, k=N_ALL, mode="exhaustive").collect()
            )
            assert a == b, q

    def test_compacted_not_merged_flagged(self, spark, compacted):
        out, _ = compacted
        idx = BM25Index(spark, out)
        assert not idx.merged
        assert read_tombstones(spark, idx.paths) is None

    def test_compacted_blockmax_exact(self, spark, compacted):
        out, _ = compacted
        idx = BM25Index(spark, out, seed_min_df=0)
        for q in QUERIES:
            bm = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search(q, k=15, mode="blockmax").collect()
            ]
            ex = [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search(q, k=15, mode="exhaustive").collect()
            ]
            assert bm == ex, q


class TestMergeResume:
    def test_rerun_same_build_id_is_noop(self, spark, tmp_path):
        """A crashed-and-rerun merge (same build_id) must not splice
        delta blocks or stats twice — every sub-step is manifest-guarded."""
        root = str(tmp_path / "idx")
        pages = synth_pages(spark, 120, num_partitions=4)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        build_index(
            spark, pages.filter(ordinal < 80), root, num_buckets=8,
            block_size=16, num_partitions=4, resume=False,
        )
        batch = pages.filter(ordinal >= 60)
        r1 = merge_pages(
            spark, root, batch, num_buckets=8, block_size=16,
            num_partitions=4, build_id="fixedmerge01",
        )
        idx1 = BM25Index(spark, root)
        postings1 = idx1.postings.count()
        docs1 = idx1.docs.count()
        df1 = {
            r["term"]: r["df"]
            for r in idx1.term_stats.orderBy("term").limit(20).collect()
        }
        # rerun with the SAME build_id — everything already done
        r2 = merge_pages(
            spark, root, batch, num_buckets=8, block_size=16,
            num_partitions=4, build_id="fixedmerge01",
        )
        idx2 = BM25Index(spark, root)
        assert idx2.postings.count() == postings1
        assert idx2.docs.count() == docs1
        assert idx2.n_docs == idx1.n_docs
        df2 = {
            r["term"]: r["df"]
            for r in idx2.term_stats.orderBy("term").limit(20).collect()
        }
        assert df2 == df1
        assert r1.new_docs == 60 and r1.tombstoned == 20


class TestMergeSafety:
    def _base(self, spark, tmp_path, n=60, cut=40):
        root = str(tmp_path / "idx")
        pages = synth_pages(spark, n, num_partitions=2)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        build_index(
            spark, pages.filter(ordinal < cut), root, num_buckets=8,
            block_size=16, num_partitions=2, resume=False,
        )
        return root, pages, ordinal

    def test_bucket_mismatch_raises(self, spark, tmp_path):
        root, pages, o = self._base(spark, tmp_path)
        with pytest.raises(ValueError, match="num_buckets"):
            merge_pages(spark, root, pages.filter(o >= 40), num_buckets=16)

    def test_config_resolved_when_omitted(self, spark, tmp_path):
        root, pages, o = self._base(spark, tmp_path)
        res = merge_pages(spark, root, pages.filter(o >= 40))
        assert res.new_docs == 20
        idx = BM25Index(spark, root)
        # merged blocks land in the base's 8-bucket layout: every doc
        # findable
        assert idx.search("python", k=60).count() > 0

    def test_partial_splice_detected(self, spark, tmp_path):
        from search_engine_spark.index.builder import _Manifest, IndexPaths

        root, pages, o = self._base(spark, tmp_path)
        # simulate a crash INSIDE the postings append of build "bidX":
        # start marker present, no done marker
        man = _Manifest(spark, IndexPaths(root), "bidX")
        man.mark("merge_postings", status="start", fingerprint="bidX")
        with pytest.raises(RuntimeError, match="compact_index"):
            merge_pages(spark, root, pages.filter(o >= 40), build_id="bidX")

    def test_batch_internal_dup_url_keeps_one(self, spark, tmp_path):
        root, pages, o = self._base(spark, tmp_path)
        batch = pages.filter(o >= 40)
        doubled = batch.unionByName(batch)  # same urls twice in one batch
        res = merge_pages(spark, root, doubled)
        assert res.new_docs == 20  # deduped to one doc per url
        live = live_docs(spark, BM25Index(spark, root).paths)
        assert live.select("url").distinct().count() == live.count() == 60

    def test_merge_into_empty_base(self, spark, tmp_path):
        root = str(tmp_path / "emptyidx")
        pages = synth_pages(spark, 30, num_partitions=2)
        build_index(
            spark, pages.filter(F.lit(False)), root, num_buckets=8,
            block_size=16, num_partitions=2, resume=False,
        )
        res = merge_pages(spark, root, pages)
        assert res.new_docs == 30 and res.tombstoned == 0
        idx = BM25Index(spark, root)
        assert idx.n_docs == 30
        assert idx.search("python", k=5).count() > 0
