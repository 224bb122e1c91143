"""Prefix-query (search_prefix) vs the pure-Python PrefixOracle.

Prefixes are derived FROM the corpus term dictionary (guaranteed
expansions) plus fixed negatives; the engine must be rank-identical
(tie-break score desc, doc_id asc; scores to 1e-9) at several
max_expansions caps, exclude field-namespaced terms, and respect
tombstones on merged indexes.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import IndexPaths, build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import PrefixOracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 200


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prefixindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    build_index(
        spark, pages, root, num_buckets=16, block_size=32, num_partitions=8
    )
    docs = spark.read.parquet(IndexPaths(root).docs).select(
        "doc_id", "url"
    ).collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle = PrefixOracle(
        {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    )
    idx = BM25Index(spark, root, seed_min_df=0)
    return oracle, idx


def _prefixes(oracle):
    """Prefixes lifted from the term dictionary: 2/3/4-char cuts of
    real terms (several expansions each) + exact full terms + misses."""
    terms = sorted(oracle.df)
    out = []
    for t in terms[:: max(1, len(terms) // 8)]:
        out += [t[:2], t[:3], t]
    out += ["zz_no_such", "9q9q9", ""]
    seen = set()
    return [p for p in out if not (p in seen or seen.add(p))]


class TestPrefixRankIdentity:
    def test_matches_oracle(self, spark, corpus):
        oracle, idx = corpus
        prefixes = _prefixes(oracle)
        assert len(prefixes) > 10
        for cap in (50, 3):
            for p in prefixes:
                exp = [
                    (d, round(s, 9))
                    for d, s in oracle.topk_prefix(p, k=15, max_expansions=cap)
                ]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_prefix(
                        p, k=15, max_expansions=cap, join_docs=False
                    ).collect()
                ]
                assert got == exp, (cap, p)

    def test_expansion_deterministic_and_capped(self, spark, corpus):
        oracle, idx = corpus
        # a 1-char prefix expands wide; cap must keep term-order head
        p = sorted(oracle.df)[0][0]
        full = [t for t, _, _ in idx.expand_prefix(p, max_expansions=10_000)]
        capped = [t for t, _, _ in idx.expand_prefix(p, max_expansions=5)]
        assert capped == full[:5]
        assert full == sorted(full)
        assert full == sorted(t for t in oracle.df if t.startswith(p))

    def test_join_docs_and_empties(self, spark, corpus):
        oracle, idx = corpus
        p = sorted(oracle.df)[3][:3]
        rows = idx.search_prefix(p, k=3).collect()
        assert rows and set(rows[0].asDict()) == {
            "doc_id", "score", "url", "title",
        }
        assert idx.search_prefix("", k=5, join_docs=False).count() == 0
        assert idx.search_prefix("!!!", k=5, join_docs=False).count() == 0
        assert idx.search_prefix("zzznope", k=5, join_docs=False).count() == 0
        assert idx.search_prefix(p, k=0, join_docs=False).count() == 0

    def test_fielded_index_expansion_excludes_namespaced(
        self, spark, tmp_path
    ):
        pages = synth_pages(spark, 60, num_partitions=2)
        root = str(tmp_path / "fieldedprefix")
        build_index(
            spark, pages, root, num_buckets=4, block_size=16,
            num_partitions=2, index_fields=True,
        )
        idx = BM25Index(spark, root, seed_min_df=0)
        # 't'/'d' prefixes would match t!/d! namespaced terms without
        # the exclusion; every expansion must be a bare content term
        for p in ("t", "d"):
            exps = [t for t, _, _ in idx.expand_prefix(p, max_expansions=1000)]
            assert all("!" not in t and t.startswith(p) for t in exps)

    def test_merged_index_tombstones_and_compact_identity(
        self, spark, tmp_path
    ):
        """Merged (uncompacted): tombstoned docs never surface and
        delta-only docs are reachable — stats follow Lucene semantics
        (deletions count until compaction), so score identity vs the
        live corpus is asserted on the COMPACTED index."""
        from search_engine_spark.index.merge import (
            compact_index,
            merge_pages,
            read_tombstones,
        )

        all_pages = synth_pages(spark, 120, num_partitions=4)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        base = all_pages.filter(ordinal < 90)
        batch = all_pages.filter(ordinal >= 60)  # recrawl 60-89, add 90-119
        root = str(tmp_path / "mergeprefix")
        build_index(spark, base, root, num_buckets=8, block_size=16,
                    num_partitions=4)
        merge_pages(spark, root, batch, num_partitions=4)
        idx = BM25Index(spark, root, seed_min_df=0)
        tombs = {r["doc_id"] for r in read_tombstones(spark, idx.paths).collect()}
        # a prefix wide enough to hit most docs (from the head of the dict)
        stats_terms = sorted(
            r["term"] for r in idx.term_stats.select("term").collect()
        )
        p = stats_terms[1][:2]
        got = {
            r["doc_id"]
            for r in idx.search_prefix(p, k=200, join_docs=False).collect()
        }
        assert got and not (got & tombs)
        # delta-only doc reachable via a prefix of one of its terms
        delta_row = all_pages.filter(ordinal == 110).select("url", "text").first()
        dp = tokenize_py(delta_row["text"])[0][:3]
        urls = {
            r["url"] for r in idx.search_prefix(dp, k=200).collect()
        }
        assert delta_row["url"] in urls

        # compacted == live-corpus oracle (rank + scores)
        croot = str(tmp_path / "compactprefix")
        compact_index(spark, root, croot, num_partitions=4)
        cidx = BM25Index(spark, croot, seed_min_df=0)
        live = spark.read.parquet(IndexPaths(croot).docs).join(
            all_pages.select("url", "text"), "url"
        ).select("doc_id", "text").collect()
        oracle = PrefixOracle(
            {r["doc_id"]: tokenize_py(r["text"]) for r in live}
        )
        for q in (p, dp, stats_terms[3][:3]):
            exp = [(d, round(s, 9)) for d, s in oracle.topk_prefix(q, k=20)]
            gotc = [
                (r["doc_id"], round(r["score"], 9))
                for r in cidx.search_prefix(q, k=20, join_docs=False).collect()
            ]
            assert gotc == exp, q
            assert gotc


def _wildcards(oracle):
    """Patterns lifted from the term dictionary: mid-`*`, trailing `*`,
    `?` substitutions, leading `*` (full-dictionary scan), misses."""
    terms = [t for t in sorted(oracle.df) if len(t) >= 4]
    out = []
    for t in terms[:: max(1, len(terms) // 6)]:
        out += [
            t[:2] + "*" + t[-1],      # mid star
            t[:3] + "*",              # trailing star (prefix-equivalent)
            t[:2] + "?" + t[3:],      # single-char hole
            "*" + t[-3:],             # leading star
        ]
    out += ["zz*qq", "q?x?q", "*", "???", ""]
    seen = set()
    return [p for p in out if not (p in seen or seen.add(p))]


class TestWildcardRankIdentity:
    def test_matches_oracle(self, spark, corpus):
        oracle, idx = corpus
        pats = _wildcards(oracle)
        assert len(pats) > 10
        for cap in (50, 3):
            for p in pats:
                exp = [
                    (d, round(s, 9))
                    for d, s in oracle.topk_wildcard(p, k=15, max_expansions=cap)
                ]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_wildcard(
                        p, k=15, max_expansions=cap, join_docs=False
                    ).collect()
                ]
                assert got == exp, (cap, p)

    def test_trailing_star_equals_prefix(self, spark, corpus):
        oracle, idx = corpus
        t = sorted(oracle.df)[0]
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_wildcard(t[:3] + "*", k=10, join_docs=False)
            .collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_prefix(t[:3], k=10, join_docs=False).collect()
        ]
        assert a == b

    def test_pure_wildcard_refused(self, spark, corpus):
        _, idx = corpus
        assert idx.search_wildcard("*", k=5, join_docs=False).count() == 0
        assert idx.search_wildcard("??", k=5, join_docs=False).count() == 0


def _fuzzy_probes(oracle):
    """Probes lifted from the dictionary: exact hits, 1-edit
    (substitute/delete/insert), 2-edit, and guaranteed misses."""
    terms = [t for t in sorted(oracle.df) if len(t) >= 5]
    out = []
    for t in terms[:: max(1, len(terms) // 5)]:
        out += [
            t,                              # 0 edits
            t[:-1],                         # deletion
            t[:2] + "x" + t[3:],            # substitution
            t + "x",                        # insertion
            "x" + t[1:-1] + "x",            # 2 substitutions
        ]
    out += ["zzzzzzzzzz", "q", ""]
    seen = set()
    return [p for p in out if not (p in seen or seen.add(p))]


class TestFuzzyRankIdentity:
    def test_matches_oracle(self, spark, corpus):
        oracle, idx = corpus
        probes = _fuzzy_probes(oracle)
        assert len(probes) > 10
        for max_edits, plen, cap in [(2, 0, 50), (1, 0, 50), (2, 2, 50),
                                     (2, 0, 3)]:
            for p in probes:
                exp = [
                    (d, round(s, 9))
                    for d, s in oracle.topk_fuzzy(
                        p, k=15, max_edits=max_edits,
                        prefix_length=plen, max_expansions=cap,
                    )
                ]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_fuzzy(
                        p, k=15, max_edits=max_edits,
                        prefix_length=plen, max_expansions=cap,
                        join_docs=False,
                    ).collect()
                ]
                assert got == exp, (max_edits, plen, cap, p)

    def test_exact_term_included_at_zero_edits(self, spark, corpus):
        oracle, idx = corpus
        t = sorted(t for t in oracle.df if len(t) >= 5)[0]
        rows = idx.search_fuzzy(t, k=5, max_edits=0, join_docs=False).collect()
        exp = [(d, round(s, 9)) for d, s in oracle.topk_fuzzy(t, k=5, max_edits=0)]
        assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == exp
        assert rows

    def test_empty_and_miss(self, spark, corpus):
        _, idx = corpus
        assert idx.search_fuzzy("", k=5, join_docs=False).count() == 0
        assert (
            idx.search_fuzzy("zzzzzzzzzzzz", k=5, join_docs=False).count() == 0
        )


class TestMultiTermRewritesOnMergedIndex:
    """Wildcard + fuzzy share the prefix machinery's dictionary and
    synonym-group scorer; pin the merge/compact behaviour for them too:
    tombstoned docs never surface, compacted == live-corpus oracle."""

    def test_merged_and_compacted(self, spark, tmp_path):
        from search_engine_spark.index.merge import (
            compact_index,
            merge_pages,
            read_tombstones,
        )

        all_pages = synth_pages(spark, 100, num_partitions=4)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        root = str(tmp_path / "mergemtq")
        build_index(
            spark, all_pages.filter(ordinal < 75), root,
            num_buckets=8, block_size=16, num_partitions=4,
        )
        merge_pages(
            spark, root, all_pages.filter(ordinal >= 50), num_partitions=4
        )
        idx = BM25Index(spark, root, seed_min_df=0)
        tombs = {
            r["doc_id"] for r in read_tombstones(spark, idx.paths).collect()
        }
        terms = sorted(r["term"] for r in idx.term_stats.select("term").collect())
        t = next(t for t in terms if len(t) >= 5)
        wild = t[:2] + "*"
        fuzz = t[:-1]
        for got in (
            idx.search_wildcard(wild, k=200, join_docs=False),
            idx.search_fuzzy(fuzz, k=200, join_docs=False),
        ):
            ids = {r["doc_id"] for r in got.collect()}
            assert ids and not (ids & tombs)

        croot = str(tmp_path / "compactmtq")
        compact_index(spark, root, croot, num_partitions=4)
        cidx = BM25Index(spark, croot, seed_min_df=0)
        live = spark.read.parquet(IndexPaths(croot).docs).join(
            all_pages.select("url", "text"), "url"
        ).select("doc_id", "text").collect()
        oracle = PrefixOracle(
            {r["doc_id"]: tokenize_py(r["text"]) for r in live}
        )
        exp_w = [(d, round(s, 9)) for d, s in oracle.topk_wildcard(wild, k=20)]
        got_w = [
            (r["doc_id"], round(r["score"], 9))
            for r in cidx.search_wildcard(wild, k=20, join_docs=False).collect()
        ]
        assert got_w == exp_w and got_w
        exp_f = [(d, round(s, 9)) for d, s in oracle.topk_fuzzy(fuzz, k=20)]
        got_f = [
            (r["doc_id"], round(r["score"], 9))
            for r in cidx.search_fuzzy(fuzz, k=20, join_docs=False).collect()
        ]
        assert got_f == exp_f and got_f


class TestMatchFuzzy:
    """ES match + fuzziness: per-token fuzzy synonym groups summed
    (bool should of SynonymQueries) — engine vs oracle, AUTO edits."""

    def test_matches_oracle(self, spark, corpus):
        oracle, idx = corpus
        terms = [t for t in sorted(oracle.df) if len(t) >= 6]
        step = max(1, len(terms) // 4)
        queries = []
        for t1, t2 in zip(terms[::step], terms[1::step]):
            queries += [
                f"{t1[:-1]} {t2}",          # one typo'd, one exact
                f"{t1[:2]}x{t1[3:]} {t2}x", # both fuzzy
                t1,                          # single token
            ]
        queries += ["zzzzzzzz qqqqqqq"]     # all-miss
        assert len(queries) >= 7
        for fz in ["AUTO", 1, 2]:
            for q in queries:
                exp = [
                    (d, round(s, 9))
                    for d, s in oracle.topk_match_fuzzy(
                        q, k=12, fuzziness=fz
                    )
                ]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_match_fuzzy(
                        q, fuzziness=fz, k=12, join_docs=False
                    ).collect()
                ]
                assert got == exp, (fz, q)

    def test_auto_short_token_is_exact(self, spark, corpus):
        """AUTO gives 0 edits to tokens under 3 chars — a 2-char token
        only matches itself (if indexed)."""
        oracle, idx = corpus
        two = next((t for t in sorted(oracle.df) if len(t) == 2), None)
        if two is None:
            pytest.skip("no 2-char dictionary term in this corpus")
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_match_fuzzy(
                two, fuzziness="AUTO", k=10, join_docs=False
            ).collect()
        ]
        exp = [
            (d, round(s, 9))
            for d, s in oracle.topk_fuzzy(two, k=10, max_edits=0)
        ]
        assert got == exp

    def test_dsl_lowering(self, spark, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        oracle, idx = corpus
        t = [t for t in sorted(oracle.df) if len(t) >= 6][0]
        q = f"{t[:-1]} {t}"
        body = {"query": {"match": {"content": {
            "query": q, "fuzziness": "AUTO"}}}, "size": 6}
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_es_query(idx, body, join_docs=False).collect()
        ]
        direct = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_match_fuzzy(
                q, k=6, join_docs=False
            ).collect()
        ]
        assert got == direct
        with pytest.raises(NotImplementedError):
            execute_es_query(idx, {"query": {"match": {"content": {
                "query": q, "fuzziness": 1, "operator": "and"}}}})
