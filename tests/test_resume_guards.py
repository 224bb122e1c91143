"""Builder resume/rebuild bookkeeping guards (review findings):
layout-mismatched resume refuses, fresh rebuild clears stale postings,
compaction keeps the shingle LM, reindex inherits source settings, and
the shingle refresh covers merged delta segments."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import (
    IndexPaths,
    build_index,
    build_shingle_stats,
    read_build_config,
)
from search_engine_spark.index.merge import (
    compact_index,
    merge_pages,
    reindex,
)
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages


def _build(spark, root, n=120, **kw):
    return build_index(
        spark, synth_pages(spark, n, num_partitions=4), root,
        num_buckets=8, block_size=16, num_partitions=4, resume=False,
        **kw,
    )


class TestResumeGuards:
    def test_mismatched_resume_refuses(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        _build(spark, root)
        with pytest.raises(ValueError, match="layout mismatch"):
            build_index(
                spark, synth_pages(spark, 50, num_partitions=2), root,
                num_buckets=4, block_size=16, num_partitions=4,
                resume=True,
            )
        with pytest.raises(ValueError, match="layout mismatch"):
            build_index(
                spark, synth_pages(spark, 50, num_partitions=2), root,
                num_buckets=8, block_size=16, bucket_groups=4,
                num_partitions=4, resume=True,
            )

    def test_fresh_rebuild_replaces_not_duplicates(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        _build(spark, root, n=120)
        idx1 = BM25Index(spark, root)
        r1 = idx1.search("python tutorial", k=5).collect()
        # rebuild IN PLACE over the same pages: postings must be
        # replaced, not appended — scores/counts identical to build 1
        _build(spark, root, n=120)
        idx2 = BM25Index(spark, root)
        r2 = idx2.search("python tutorial", k=5).collect()
        assert [(r["doc_id"], round(r["score"], 6)) for r in r1] == [
            (r["doc_id"], round(r["score"], 6)) for r in r2
        ]

    def test_config_records_bucket_groups(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        _build(spark, root, bucket_groups=2)
        cfg = read_build_config(IndexPaths(root).build_config)
        assert cfg["bucket_groups"] == 2


class TestSettingsPropagation:
    def test_compact_keeps_shingles(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        out = str(tmp_path / "compacted")
        _build(spark, root, index_shingles=True)
        merge_pages(
            spark, root, synth_pages(spark, 40, num_partitions=2)
        )
        compact_index(spark, root, out)
        cfg = read_build_config(IndexPaths(out).build_config)
        assert cfg["index_shingles"] is True
        # the suggester LM exists on the compacted index
        assert spark.read.parquet(
            IndexPaths(out).shingle_stats
        ).count() > 0

    def test_reindex_inherits_positions_and_shingles(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        out = str(tmp_path / "reindexed")
        _build(spark, root, index_positions=True, index_shingles=True)
        reindex(spark, root, out, num_buckets=4)
        cfg = read_build_config(IndexPaths(out).build_config)
        assert cfg["index_positions"] is True
        assert cfg["index_shingles"] is True
        assert spark.read.parquet(
            IndexPaths(out).pos_postings
        ).count() > 0

    def test_shingle_refresh_covers_merged_deltas(self, spark, tmp_path):
        root = str(tmp_path / "idx")
        _build(spark, root, index_shingles=True)
        novel = spark.createDataFrame(
            [
                (
                    f"https://novel.example/{i}",
                    None,
                    (
                        "<html><title>zyzzyva quokka</title><body>"
                        + "zyzzyva quokka wallaby " * 20
                        + "</body></html>"
                    ).encode(),
                    None,
                    "en",
                )
                for i in range(10)
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        merge_pages(spark, root, novel)
        build_shingle_stats(spark, root)
        uni = spark.read.parquet(IndexPaths(root).unigram_stats)
        # the merged batch's vocabulary is IN the refreshed LM
        assert uni.filter(F.col("term") == "zyzzyva").count() == 1
