"""The Iceberg storage seam (SURVEY §2 A8-A11 storage mapping).

The north rule names Iceberg posting/doc tables; this sandbox has no
Iceberg runtime jars, so the table layer is parquet-path based with
every physical path centralized in index.builder.IndexPaths
(session.py:1-9 documents the seam).  Two guarantees keep the swap a
one-module change, both pinned here:

1. the jars are RE-PROBED every round (TestIcebergProbe) — the skip
   message is the audit trail that the retry happened; the moment the
   runtime appears the same test runs a real ``CREATE TABLE`` +
   ``MERGE INTO`` against a local hadoop catalog.
2. ``merge_pages`` already implements exactly the MERGE INTO contract
   an Iceberg backend would run (reference indexer.py:277-291
   ``ON CONFLICT (url) DO UPDATE``):

       MERGE INTO docs t USING batch s ON t.url = s.url
       WHEN MATCHED THEN UPDATE SET *
       WHEN NOT MATCHED THEN INSERT *

   TestMergeIntoShape checks the live-docs view after merge_pages
   against that statement's semantics evaluated by DuckDB (spelled as
   anti-join + union — DuckDB 1.0 has no MERGE syntax) over the same
   before/batch inputs.  Content equality on matched rows proves the
   update really replaced the document, not just tombstoned it.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import live_docs, merge_pages
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages

N_ALL = 200
N_BASE = 120  # ordinals [0, 120) in the base build
BATCH_LO = 80  # batch re-crawls [80, 120) with CHANGED html, adds [120, 200)


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TestIcebergProbe:
    def test_merge_into_on_iceberg_catalog(self, spark, tmp_path):
        if not _iceberg_available(spark):
            pytest.skip(
                "Iceberg runtime jars absent in this environment "
                "(re-probed round 5, 2026-08-21: no iceberg jar on the "
                "classpath, in pyspark/jars, or anywhere on disk; no "
                "network to fetch one); table layer stays parquet-path "
                "based behind IndexPaths — see session.py:1-9"
            )
        # Catalogs are instantiated lazily, so a live session can gain one.
        spark.conf.set(
            "spark.sql.catalog.seam", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set("spark.sql.catalog.seam.type", "hadoop")
        spark.conf.set(
            "spark.sql.catalog.seam.warehouse", str(tmp_path / "warehouse")
        )
        spark.sql("CREATE TABLE seam.db.docs (url STRING, title STRING) USING iceberg")
        spark.sql("INSERT INTO seam.db.docs VALUES ('a', 'old'), ('b', 'keep')")
        spark.createDataFrame(
            [("a", "new"), ("c", "ins")], "url string, title string"
        ).createOrReplaceTempView("batch")
        spark.sql(
            "MERGE INTO seam.db.docs t USING batch s ON t.url = s.url "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        got = {
            (r["url"], r["title"])
            for r in spark.sql("SELECT * FROM seam.db.docs").collect()
        }
        assert got == {("a", "new"), ("b", "keep"), ("c", "ins")}


@pytest.fixture(scope="module")
def merge_shape(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("merge_shape")
    root = str(tmp / "idx")
    all_pages = synth_pages(spark, N_ALL, num_partitions=4)
    ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")

    base_pages = all_pages.filter(ordinal < N_BASE)
    # matched rows get genuinely NEW content (title + body change), so a
    # merge that failed to update would be caught by content comparison
    updated_html = F.encode(
        F.concat(
            F.lit("<html><head><title>updated "),
            F.col("url"),
            F.lit("</title></head><body>replacement crawl of "),
            F.col("url"),
            F.lit(" with entirely new words</body></html>"),
        ),
        "utf-8",
    )
    batch_pages = all_pages.filter(ordinal >= BATCH_LO).withColumn(
        "html",
        F.when(ordinal < N_BASE, updated_html).otherwise(F.col("html")),
    )

    build_index(
        spark, base_pages, root, num_buckets=8, block_size=32,
        num_partitions=4, resume=False,
    )
    before = live_docs(spark, BM25Index(spark, root).paths)
    p_before = str(tmp / "before.parquet")
    before.select("url", "title", "doclen").write.parquet(p_before)

    # standalone build over JUST the batch = what each batch row must
    # look like after the upsert (same extraction/tokenize pipeline)
    batch_root = str(tmp / "batch_idx")
    build_index(
        spark, batch_pages, batch_root, num_buckets=8, block_size=32,
        num_partitions=4, resume=False,
    )
    p_batch = str(tmp / "batch.parquet")
    live_docs(spark, BM25Index(spark, batch_root).paths).select(
        "url", "title", "doclen"
    ).write.parquet(p_batch)

    merge_pages(spark, root, batch_pages, num_partitions=4)
    return root, p_before, p_batch


class TestMergeIntoShape:
    def test_live_view_equals_merge_into(self, spark, merge_shape):
        root, p_before, p_batch = merge_shape
        got = sorted(
            (r["url"], r["title"], r["doclen"])
            for r in live_docs(spark, BM25Index(spark, root).paths)
            .select("url", "title", "doclen")
            .collect()
        )
        con = duckdb.connect()
        want = sorted(
            con.execute(
                f"""
                -- MERGE INTO docs USING batch ON url:
                --   WHEN MATCHED THEN UPDATE SET *
                --   WHEN NOT MATCHED THEN INSERT *
                SELECT t.url, t.title, t.doclen
                FROM read_parquet('{p_before}/*.parquet') t
                ANTI JOIN read_parquet('{p_batch}/*.parquet') s USING (url)
                UNION ALL
                SELECT url, title, doclen
                FROM read_parquet('{p_batch}/*.parquet')
                """
            ).fetchall()
        )
        assert len(got) == N_ALL
        assert got == want

    def test_matched_rows_actually_updated(self, spark, merge_shape):
        root, p_before, _ = merge_shape
        live = (
            live_docs(spark, BM25Index(spark, root).paths)
            .filter(
                F.regexp_extract("url", r"page/(\d+)", 1)
                .cast("long")
                .between(BATCH_LO, N_BASE - 1)
            )
            .collect()
        )
        assert len(live) == N_BASE - BATCH_LO
        for r in live:
            assert r["title"] == f"updated {r['url']}", r["url"]
