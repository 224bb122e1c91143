"""search_after (ES cursor deep pagination): walking pages by cursor
reproduces exactly the single-shot top-k ordering — including through
score ties (the cursor's equality branch splits ties by doc_id), with
filters composed, and an exhausted cursor returning empty."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages

N_PAGES = 200
QUERY = "python programming tutorial"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cursor_idx"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
    )
    return BM25Index(spark, paths.root, seed_min_df=0)


def _rows(df):
    return [
        (r["doc_id"], r["score"])
        for r in df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
    ]


class TestSearchAfter:
    @pytest.mark.parametrize("page_size", [3, 7])
    def test_cursor_walk_equals_single_topk(self, idx, page_size):
        want = _rows(idx.search(QUERY, k=30, join_docs=False))
        got, cursor = [], None
        while len(got) < len(want):
            page = (
                _rows(idx.search(QUERY, k=page_size, join_docs=False))
                if cursor is None
                else _rows(
                    idx.search_after(
                        QUERY, cursor, k=page_size, join_docs=False
                    )
                )
            )
            if not page:
                break
            got.extend(page)
            cursor = (page[-1][1], page[-1][0])  # (score, doc_id)
        assert [d for d, _ in got[:30]] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got[:30], want):
            assert abs(gs - ws) < 1e-9

    def test_exhausted_cursor_empty(self, idx):
        total = idx.count_matches(QUERY)
        all_rows = _rows(idx.search(QUERY, k=total, join_docs=False))
        after_last = idx.search_after(
            QUERY, (all_rows[-1][1], all_rows[-1][0]), k=5, join_docs=False
        )
        assert after_last.count() == 0

    def test_ties_split_by_doc_id(self, spark, tmp_path):
        # three byte-identical docs => identical scores; the cursor's
        # equality branch must advance through the tie by doc_id
        text = "python tutorial " * 10
        rows = [
            (f"https://t.example/{i}", None, None,
             text if i < 3 else "unrelated filler words entirely", "en")
            for i in range(6)
        ]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        )
        root = str(tmp_path / "ties")
        build_index(
            spark, pages, root, num_buckets=4, block_size=8,
            num_partitions=2, run_extraction=False,
        )
        tidx = BM25Index(spark, root)
        full = _rows(tidx.search("python tutorial", k=3, join_docs=False))
        assert len(full) == 3
        assert full[0][1] == pytest.approx(full[1][1], abs=1e-12)
        walked, cursor = [], None
        for _ in range(3):
            page = _rows(
                tidx.search("python tutorial", k=1, join_docs=False)
                if cursor is None
                else tidx.search_after(
                    "python tutorial", cursor, k=1, join_docs=False
                )
            )
            assert len(page) == 1
            walked.extend(page)
            cursor = (page[-1][1], page[-1][0])
        assert [d for d, _ in walked] == [d for d, _ in full]

    def test_composes_with_include_filter(self, spark, idx):
        pred = "domain = 'example.com'"
        want = [
            (r["doc_id"], r["score"])
            for r in idx.search_filtered(QUERY, pred, k=10, join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        if len(want) < 4:
            pytest.skip("not enough filtered hits to paginate")
        head = want[:2]
        filtered = idx.docs.filter(F.expr(pred)).select("doc_id")
        tail = _rows(
            idx.search(
                QUERY, k=len(want) - 2, join_docs=False,
                include=filtered, after=(head[-1][1], head[-1][0]),
            )
        )
        assert [d for d, _ in head + tail] == [d for d, _ in want]


class TestScroll:
    """ES scroll (deep export): iterating every page reproduces the
    full exhaustive ordering exactly once."""

    @pytest.mark.parametrize("page_size", [7, 50])
    def test_full_export(self, idx, page_size):
        total = idx.count_matches(QUERY)
        want = _rows(idx.search(QUERY, k=total, join_docs=False))
        got = []
        for page in idx.scroll(QUERY, page_size=page_size,
                               join_docs=False):
            rows = _rows(page)
            assert len(rows) <= page_size
            got.extend(rows)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert len(got) == total  # every hit exactly once

    def test_max_pages_bounds(self, idx):
        pages = list(idx.scroll(QUERY, page_size=3, join_docs=False,
                                max_pages=2))
        assert len(pages) == 2

    def test_no_match_yields_nothing(self, idx):
        assert list(idx.scroll("zzqqxx", page_size=5,
                               join_docs=False)) == []

    def test_bad_page_size(self, idx):
        with pytest.raises(ValueError):
            next(idx.scroll(QUERY, page_size=0))
