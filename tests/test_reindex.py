"""reindex (index/merge.py) — the ES `_reindex` API as a batch job:
a fresh index over the live docs, optionally predicate-restricted
(source.query) and with changed dest settings (num_buckets /
block_size / dropped fields / enabled positions / enabled shingles).
Ranking over the destination must be rank-identical to a from-scratch
build over exactly the kept documents."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import delete_pages, reindex
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import BM25Oracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 200
QUERY = "python programming tutorial"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("reidx") / "idx")
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8,
        index_fields=True,
    )
    docs = spark.read.parquet(paths.docs).select(
        "doc_id", "url", "domain"
    ).collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle_docs = {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    return root, docs, oracle_docs


def _topk(idx, query, k=10):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search(query, k=k, join_docs=False)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]


class TestReindex:
    def test_plain_reindex_preserves_ranking(self, spark, built, tmp_path):
        root, docs, oracle_docs = built
        dst = str(tmp_path / "dst")
        # change the physical layout while reindexing — a new index is
        # free to pick its own bucket/block sizing
        reindex(spark, root, dst, num_buckets=4, block_size=16)
        src_idx = BM25Index(spark, root, seed_min_df=0)
        dst_idx = BM25Index(spark, dst, seed_min_df=0)
        assert _topk(dst_idx, QUERY) == _topk(src_idx, QUERY)
        assert dst_idx.count_matches(None) == len(oracle_docs)

    def test_predicate_reindex_matches_filtered_oracle(
        self, spark, built, tmp_path
    ):
        root, docs, oracle_docs = built
        dom = "example.com"
        kept = {r["doc_id"] for r in docs if r["domain"] == dom}
        dst = str(tmp_path / "dst")
        reindex(spark, root, dst, predicate=f"domain = '{dom}'")
        idx = BM25Index(spark, dst, seed_min_df=0)
        assert idx.count_matches(None) == len(kept)
        oracle = BM25Oracle(
            {d: t for d, t in oracle_docs.items() if d in kept}
        )
        want = [
            (d, round(s, 9))
            for d, s in oracle.topk(QUERY, 10)
        ]
        assert _topk(idx, QUERY) == want

    def test_reindex_after_delete_drops_tombstoned(
        self, spark, built, tmp_path
    ):
        root, docs, oracle_docs = built
        victims = sorted(oracle_docs)[:20]
        url_by_doc = {r["doc_id"]: r["url"] for r in docs}
        delete_pages(spark, root, urls=[url_by_doc[d] for d in victims])
        dst = str(tmp_path / "dst")
        reindex(spark, root, dst)
        idx = BM25Index(spark, dst, seed_min_df=0)
        assert idx.count_matches(None) == len(oracle_docs) - len(victims)
        assert idx.tombstones is None
        oracle = BM25Oracle(
            {d: t for d, t in oracle_docs.items() if d not in victims}
        )
        want = [
            (d, round(s, 9))
            for d, s in oracle.topk(QUERY, 10)
        ]
        assert _topk(idx, QUERY) == want

    def test_drop_fields(self, spark, built, tmp_path):
        root, *_ = built
        dst = str(tmp_path / "dst")
        reindex(spark, root, dst, index_fields=False)
        idx = BM25Index(spark, dst, seed_min_df=0)
        n_fielded = idx.term_stats.filter(
            F.col("term").contains("!")
        ).count()
        assert n_fielded == 0
        assert _topk(idx, QUERY)  # content search still works

    def test_enable_positions_and_shingles(self, spark, built, tmp_path):
        root, docs, oracle_docs = built
        dst = str(tmp_path / "dst")
        reindex(
            spark, root, dst, index_positions=True, index_shingles=True
        )
        idx = BM25Index(spark, dst, seed_min_df=0)
        # phrase search now works on the destination
        rows = idx.search_phrase("python programming", k=5,
                                 join_docs=False).collect()
        assert isinstance(rows, list)
        # phrase suggester now works on the destination
        sugg = idx.suggest_phrase("pythn programming", size=3)
        assert sugg.columns == ["suggestion", "score"]

    def test_fields_on_unfielded_source_refused(self, spark, tmp_path):
        src = str(tmp_path / "src")
        pages = synth_pages(spark, 40, num_partitions=2)
        build_index(spark, pages, src, num_buckets=4, block_size=32,
                    num_partitions=2)
        with pytest.raises(ValueError, match="fielded source"):
            reindex(spark, src, str(tmp_path / "dst"), index_fields=True)
