"""ES _termvectors / _mtermvectors parity (BM25Index.term_vectors).

The reference's ES index serves per-doc term vectors over the documents
the indexer writes (indexer.py:236-247); here they are re-derived from
the posting blocks and pinned against a pure-Python recomputation from
the same token streams: tf = term count, positions = 0-based offsets in
the filtered (stopword-removed, stemmed) stream — the phrase-search
position convention — df = live-corpus doc frequency.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import delete_pages
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 120


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tvindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark, pages, root, num_buckets=8, block_size=16,
        num_partitions=8, index_positions=True,
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    toks = {
        id_by_url[r["url"]]: tokenize_py(r["text"])
        for r in pages.select("url", "text").collect()
    }
    idx = BM25Index(spark, root)
    return idx, toks, id_by_url


def _expected(toks, doc_ids):
    rows = {}
    for d in doc_ids:
        tf = Counter(toks[d])
        for t, n in tf.items():
            rows[(d, t)] = n
    return rows


class TestTermVectors:
    def test_tf_vectors(self, corpus):
        idx, toks, id_by_url = corpus
        ids = sorted(toks)[:3]
        got = idx.term_vectors(ids).collect()
        exp = _expected(toks, ids)
        assert {(r["doc_id"], r["term"]): r["tf"] for r in got} == exp
        # only requested docs surface
        assert {r["doc_id"] for r in got} == set(ids)
        # deterministic order: (doc_id, term)
        keys = [(r["doc_id"], r["term"]) for r in got]
        assert keys == sorted(keys)

    def test_tf_sums_to_doclen(self, corpus):
        """Σ tf over a doc's vector == its doclen — ties the doc-major
        decode to the docs table's independent token count."""
        idx, toks, _ = corpus
        ids = sorted(toks)[:5]
        got = (
            idx.term_vectors(ids)
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("s"))
            .collect()
        )
        doclens = {
            r["doc_id"]: r["doclen"]
            for r in idx.docs.filter(F.col("doc_id").isin(ids)).collect()
        }
        assert {r["doc_id"]: r["s"] for r in got} == doclens
        assert doclens == {d: len(toks[d]) for d in ids}

    def test_url_and_mixed_lookup(self, corpus):
        idx, toks, id_by_url = corpus
        urls = sorted(id_by_url)[:2]
        want = {id_by_url[u] for u in urls}
        # one by url, one by doc_id, plus a duplicate — mixed input
        got = idx.term_vectors([urls[0], id_by_url[urls[1]], urls[1]])
        assert {r["doc_id"] for r in got.collect()} == want

    def test_positions(self, corpus):
        idx, toks, _ = corpus
        d = sorted(toks)[1]
        got = idx.term_vectors(d, with_positions=True).collect()
        exp_pos = {}
        for i, t in enumerate(toks[d]):
            exp_pos.setdefault(t, []).append(i)
        assert {r["term"]: list(r["positions"]) for r in got} == exp_pos
        assert all(r["tf"] == len(r["positions"]) for r in got)

    def test_term_statistics(self, corpus):
        idx, toks, _ = corpus
        d = sorted(toks)[0]
        got = idx.term_vectors(
            d, term_statistics=True
        ).collect()
        df_py = Counter()
        for ts in toks.values():
            df_py.update(set(ts))
        assert {r["term"]: r["df"] for r in got} == {
            t: df_py[t] for t in set(toks[d])
        }

    def test_empty_and_unknown(self, corpus, spark):
        idx, toks, _ = corpus
        assert idx.term_vectors([]).count() == 0
        # unknown url / out-of-range id -> no rows, not an error
        assert idx.term_vectors("http://nope.example/x").count() == 0
        assert idx.term_vectors(10**12).count() == 0

    def test_max_docs_cap(self, corpus):
        idx, toks, _ = corpus
        with pytest.raises(ValueError, match="point-lookup"):
            idx.term_vectors(list(range(10)), max_docs=5)


class TestGetDocs:
    def test_mget_by_url_and_id(self, corpus):
        idx, toks, id_by_url = corpus
        urls = sorted(id_by_url)[:2]
        want = {id_by_url[u] for u in urls} | {7}
        got = idx.get_docs([urls[0], urls[1], 7]).collect()
        assert {r["doc_id"] for r in got} == want
        # full docs-table row shape (the ES _source analogue)
        assert {"doc_id", "url", "title", "domain", "doclen"} <= set(
            got[0].asDict()
        )

    def test_missing_is_absence(self, corpus):
        idx, _, _ = corpus
        assert idx.get_docs("http://nope.example/x").count() == 0
        assert idx.get_docs([]).count() == 0


class TestExplainDoc:
    QUERY = "crawl index ranking"

    def test_matches_engine_scores(self, corpus):
        """explain_doc totals == search(explain=True) for every top-k
        winner, and the per-term details reproduce term_scores."""
        idx, toks, _ = corpus
        hits = idx.search(
            self.QUERY, k=5, join_docs=False, explain=True
        ).collect()
        assert hits, "query must hit for this test to bite"
        for h in hits:
            exp = idx.explain_doc(self.QUERY, int(h["doc_id"]))
            assert exp["found"] and exp["matched"]
            assert exp["score"] == pytest.approx(h["score"], abs=1e-9)
            contribs = {d["term"]: d["contribution"] for d in exp["details"]}
            for t, s in dict(h["term_scores"]).items():
                assert contribs.get(t, 0.0) == pytest.approx(s, abs=1e-9)

    def test_detail_shape(self, corpus):
        idx, toks, _ = corpus
        d = sorted(toks)[0]
        # a term that IS in the doc: details carry consistent math
        term = toks[d][0]
        exp = idx.explain_doc([term], d)
        assert exp["matched"] and len(exp["details"]) == 1
        det = exp["details"][0]
        assert det["term"] == term
        assert det["tf"] == toks[d].count(term)
        assert det["contribution"] == pytest.approx(
            det["idf"] * det["tf_norm"], abs=1e-12
        )
        # terms sorted ascending in a multi-term explain
        exp2 = idx.explain_doc(" ".join(toks[d][:5]), d)
        ts = [x["term"] for x in exp2["details"]]
        assert ts == sorted(ts)

    def test_unmatched_and_missing(self, corpus):
        idx, toks, _ = corpus
        d = sorted(toks)[0]
        exp = idx.explain_doc("zzzznotaterm", d)
        assert exp["found"] and not exp["matched"] and exp["score"] == 0.0
        missing = idx.explain_doc(self.QUERY, 10**12)
        assert not missing["found"] and not missing["matched"]
        with pytest.raises(ValueError, match="exactly one"):
            idx.explain_doc(self.QUERY, sorted(toks)[:2])


def test_tombstoned_doc_hidden(spark, tmp_path):
    root = str(tmp_path / "tvdel")
    pages = synth_pages(spark, 40, num_partitions=2)
    build_index(spark, pages, root, num_buckets=4, block_size=16,
                num_partitions=4)
    docs = spark.read.parquet(root + "/docs").select("doc_id", "url").collect()
    victim = sorted(docs, key=lambda r: r["doc_id"])[0]
    assert delete_pages(spark, root, urls=[victim["url"]]) == 1
    idx = BM25Index(spark, root)
    # by url AND by raw doc_id: a deleted doc never reports a vector
    assert idx.term_vectors(victim["url"]).count() == 0
    assert idx.term_vectors(int(victim["doc_id"])).count() == 0
    # _explain of a deleted doc: found=False by url AND by raw id
    assert not idx.explain_doc("anything", victim["url"])["found"]
    assert not idx.explain_doc("anything", int(victim["doc_id"]))["found"]
    # _mget of a deleted doc: absent, like ES post-delete
    assert idx.get_docs([victim["url"], int(victim["doc_id"])]).count() == 0
