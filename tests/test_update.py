"""update_by_query (index/merge.py) — the ES `_update_by_query` /
`POST /_update/{id}` surface: matching live docs re-indexed from their
source with a script applied, as ONE tombstone+delta merge batch.

Reference parity: the indexer's overwrite-by-id upsert
(indexer.py:236-247, 273-293) driven by a query instead of a re-crawl.

Pinned here:
- matched/updated/missing accounting
- script effects are searchable (html rewrite) and visible in the docs
  table (warc_ts rewrite); untouched docs keep their rows
- compact(updated index) ranks IDENTICALLY to a fresh build over a
  corpus transformed in-driver the same way (rank + scores)
- selector/script validation; DSL lowering incl. full-text match
  selection and the painless refusal
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import (
    compact_index,
    live_docs,
    update_by_query,
)
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.dsl import execute_es_update_by_query
from search_engine_spark.synth import synth_pages

N = 150
SENTINEL = "zyzzqupdate"
# inject a sentinel token into the html body; text re-derives from html
HTML_SCRIPT = (
    "cast(replace(cast(html as string), '</body>', "
    f"' {SENTINEL} </body>') as binary)"
)
TS_SCRIPT = "timestamp'2001-01-01 00:00:00'"
QUERIES = ["python programming tutorial", "quick brown fox", "data"]


def topk(idx, q, k=15):
    return [
        (r["url"], round(r["score"], 9))
        for r in idx.search(q, k=k).collect()
    ]


@pytest.fixture(scope="module")
def updated(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ubq_idx"))
    pages = synth_pages(spark, N, num_partitions=4)
    build_index(
        spark, pages, root, num_buckets=8, block_size=32,
        num_partitions=4, resume=False,
    )
    target_domain = "wiki.demo.io"
    res = update_by_query(
        spark, root, pages,
        {"html": HTML_SCRIPT, "warc_ts": TS_SCRIPT},
        predicate=F.col("domain") == target_domain,
    )
    return root, res, pages, target_domain


class TestUpdateByQuery:
    def test_accounting(self, spark, updated):
        root, res, pages, domain = updated
        n_dom = (
            pages.filter(
                F.expr("parse_url(url, 'HOST')") == domain
            ).count()
        )
        assert res.matched == n_dom > 0
        assert res.updated == n_dom
        assert res.missing_source == 0
        assert res.merge is not None and res.merge.tombstoned == n_dom
        live = live_docs(spark, BM25Index(spark, root).paths)
        assert live.count() == N
        assert live.select("url").distinct().count() == N

    def test_script_effect_searchable(self, spark, updated):
        root, res, _, domain = updated
        idx = BM25Index(spark, root)
        hits = idx.search(SENTINEL, k=N).collect()
        assert len(hits) == res.updated
        assert all(f"https://{domain}/" in r["url"] for r in hits)

    def test_metadata_rewrite_visible(self, spark, updated):
        root, _, _, domain = updated
        live = live_docs(spark, BM25Index(spark, root).paths)
        stamped = live.filter(F.col("warc_ts") == TS_SCRIPT.split("'")[1])
        assert stamped.count() == live.filter(
            F.col("domain") == domain
        ).count()
        # untouched docs keep their original timestamps
        assert (
            live.filter(
                (F.col("domain") != domain)
                & (F.col("warc_ts") == TS_SCRIPT.split("'")[1])
            ).count()
            == 0
        )

    def test_compact_equals_fresh_build_over_updated_corpus(
        self, spark, updated, tmp_path
    ):
        root, _, pages, domain = updated
        compacted_dir = str(tmp_path / "compacted")
        fresh_dir = str(tmp_path / "fresh")
        compact_index(
            spark, root, compacted_dir, num_partitions=4
        )
        is_target = F.expr("parse_url(url, 'HOST')") == domain
        transformed = pages.withColumns(
            {
                "html": F.when(is_target, F.expr(HTML_SCRIPT)).otherwise(
                    F.col("html")
                ),
                "warc_ts": F.when(is_target, F.expr(TS_SCRIPT))
                .otherwise(F.col("warc_ts"))
                .cast("timestamp"),
            }
        )
        build_index(
            spark, transformed, fresh_dir, num_buckets=8, block_size=32,
            num_partitions=4, resume=False,
        )
        ic, ifr = BM25Index(spark, compacted_dir), BM25Index(spark, fresh_dir)
        for q in QUERIES + [SENTINEL]:
            assert topk(ic, q) == topk(ifr, q), q

    def test_validation(self, spark, updated):
        root, _, pages, _ = updated
        with pytest.raises(ValueError, match="document id"):
            update_by_query(spark, root, pages, {"url": "'x'"}, urls=["u"])
        with pytest.raises(ValueError, match="update html instead"):
            update_by_query(spark, root, pages, {"text": "'x'"}, urls=["u"])
        with pytest.raises(ValueError, match="at least one column"):
            update_by_query(spark, root, pages, {}, urls=["u"])
        with pytest.raises(ValueError, match="at most one"):
            update_by_query(
                spark, root, pages, {"lang": "'fr'"},
                urls=["u"], predicate="1=1",
            )

    def test_empty_urls_noop(self, spark, updated):
        root, _, pages, _ = updated
        res = update_by_query(spark, root, pages, {"lang": "'fr'"}, urls=[])
        assert (res.matched, res.updated, res.merge) == (0, 0, None)


class TestUpdateEdges:
    @pytest.fixture(scope="class")
    def small(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("ubq_small"))
        pages = synth_pages(spark, 60, num_partitions=2)
        build_index(
            spark, pages, root, num_buckets=4, block_size=32,
            num_partitions=2, resume=False,
        )
        return root, pages

    def test_missing_source_skipped(self, spark, small):
        root, pages = small
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        partial_source = pages.filter(ordinal >= 10)  # 0..9 missing
        res = update_by_query(
            spark, root, partial_source, {"lang": "'fr'"},
            predicate=ordinal < 20,
        )
        assert res.matched == 20
        assert res.updated == 10
        assert res.missing_source == 10
        assert live_docs(spark, BM25Index(spark, root).paths).count() == 60

    def test_dsl_match_query_and_painless_refusal(self, spark, small):
        root, pages = small
        idx = BM25Index(spark, root)
        # pick a real content word from the corpus via a quick probe
        word = "python"
        n_match = idx.count_matches(word)
        body = {
            "query": {"match": {"content": word}},
            "script": {
                "lang": "spark_sql",
                "source": {"warc_ts": TS_SCRIPT},
            },
        }
        res = execute_es_update_by_query(idx, body, pages)
        assert res.matched == res.updated == n_match
        with pytest.raises(NotImplementedError, match="painless"):
            execute_es_update_by_query(
                idx,
                {"script": {"source": "ctx._source.lang = 'fr'"}},
                pages,
            )
        with pytest.raises(NotImplementedError, match="script.source"):
            execute_es_update_by_query(idx, {}, pages)

    def test_dsl_match_all_default(self, spark, small):
        root, pages = small
        idx = BM25Index(spark, root)
        res = execute_es_update_by_query(
            idx,
            {
                "query": {"match_all": {}},
                "script": {
                    "lang": "spark_sql",
                    "source": {"lang": "'en'"},
                },
            },
            pages,
        )
        assert res.matched == 60
        assert res.updated == 60
