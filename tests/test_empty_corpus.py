"""Degenerate inputs: a 0-doc corpus builds a valid empty index and the
query engine answers (empty) instead of crashing on schema inference."""

from pyspark.sql import functions as F

from search_engine_spark import schemas
from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages


def test_empty_corpus_builds_and_queries(spark, tmp_path):
    root = str(tmp_path / "empty_idx")
    pages = synth_pages(spark, 10, num_partitions=2).filter(F.lit(False))
    build_index(
        spark, pages, root, num_buckets=4, block_size=16,
        num_partitions=2, resume=False, index_fields=True,
    )
    idx = BM25Index(spark, root)
    assert idx.n_docs == 0 and idx.avgdl == 0.0
    assert idx.search("python tutorial", k=5).count() == 0
    assert idx.search_many({"a": "python"}, k=5).count() == 0
    assert idx.search_boolean("python NOT tutorial", k=5).count() == 0
    assert idx.stats()["indexed_docs"] == 0
    # the aggregations family answers empty, not crashes
    assert idx.facet_counts("python", "domain").count() == 0
    assert idx.facet_stats("python", "doclen").count() == 0
    assert idx.facet_histogram("python", "doclen", 10).count() == 0
    # range zero-fills every requested bucket even with no index terms
    rng = idx.facet_range("python", "doclen", [(None, 5.0)]).collect()
    assert len(rng) == 1 and rng[0]["doc_count"] == 0
    assert idx.facet_cardinality("python", "domain") == 0
    assert idx.facet_composite("python", ["domain"]).count() == 0
    assert idx.facet_percentiles("python", "doclen").count() == 0
    assert idx.facet_date_histogram("python", "warc_ts").count() == 0
    assert idx.facet_top_hits("python", "domain").count() == 0
    assert idx.significant_terms("python").count() == 0
    assert idx.suggest_terms("pythoon").count() == 0
    assert idx.search_cross_fields("python", join_docs=False).count() == 0
    from search_engine_spark.query.dsl import execute_es_query

    assert execute_es_query(
        idx, {"query": {"match": {"content": "python"}}}, join_docs=False
    ).count() == 0


def test_null_text_pages_are_tolerated(spark, tmp_path):
    """Pages with NULL text/html tokenize to empty docs, not crashes."""
    root = str(tmp_path / "null_idx")
    rows = [
        ("https://a.example/1", None, None, "the quick brown fox", "en"),
        ("https://a.example/2", None, None, None, "en"),
        ("https://a.example/3", None, None, "", "en"),
    ]
    pages = spark.createDataFrame(
        [(u, t, h, x, l) for u, t, h, x, l in rows], schemas.PAGES
    )
    build_index(
        spark, pages, root, num_buckets=4, block_size=16,
        num_partitions=2, resume=False, run_extraction=False,
    )
    idx = BM25Index(spark, root)
    assert idx.n_docs == 3
    got = idx.search("quick fox", k=5).collect()
    assert len(got) == 1 and got[0]["url"] == "https://a.example/1"


def test_dedup_ops_on_empty_and_degenerate_input(spark):
    """substring/media dedup over empty and all-null inputs: no rows,
    no crashes (posexplode of an empty gram array must not drop the
    whole pipeline into an error path)."""
    from search_engine_spark.ops.dedup import substring_dedup
    from search_engine_spark.ops.multimodal import media_exact_dedup

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert substring_dedup(empty, "doc_id", "text").count() == 0

    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in substring_dedup(nulls, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["clean_text"] == ""

    no_media = spark.createDataFrame(
        [], "media_id long, kind string, payload binary, source_url string"
    )
    assert media_exact_dedup(no_media).count() == 0
