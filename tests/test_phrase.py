"""Positional index + exact-phrase search vs the pure-Python oracle.

Phrase queries are derived FROM the corpus token streams (guaranteed
hits) plus fixed negative cases; the engine must be rank-identical to
PhraseOracle (tie-break score desc, doc_id asc; scores to 1e-9).
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.builder import IndexPaths, build_index
from search_engine_spark.query.bm25 import BM25Index
from search_engine_spark.query.oracle import PhraseOracle
from search_engine_spark.synth import synth_pages
from search_engine_spark.text.tokenizer import tokenize_py

N_PAGES = 200


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posindex"))
    pages = synth_pages(spark, N_PAGES, num_partitions=4)
    paths = build_index(
        spark,
        pages,
        root,
        num_buckets=16,
        block_size=32,
        num_partitions=8,
        index_positions=True,
    )
    docs = spark.read.parquet(paths.docs).select("doc_id", "url").collect()
    id_by_url = {r["url"]: r["doc_id"] for r in docs}
    texts = pages.select("url", "text").collect()
    oracle_docs = {id_by_url[r["url"]]: tokenize_py(r["text"]) for r in texts}
    raw_by_id = {id_by_url[r["url"]]: r["text"] for r in texts}
    idx = BM25Index(spark, root, seed_min_df=0)
    return paths, PhraseOracle(oracle_docs), idx, raw_by_id


def _phrases(raw_by_id):
    """Phrases lifted from RAW text word spans + fixed negatives.

    A raw span's tokenization is a contiguous subsequence of the doc's
    filtered token stream (stopword filtering is per-token), and both
    the engine and the oracle tokenize the query string the same way —
    so span-derived phrases are guaranteed hits without assuming Porter
    idempotence (it is NOT idempotent: respons -> respon)."""
    out = []
    for d in sorted(raw_by_id)[:6]:
        words = raw_by_id[d].split()
        if len(words) >= 12:
            for sl in (slice(3, 6), slice(6, 10), slice(4, 5)):
                span = " ".join(words[sl])
                if tokenize_py(span):
                    out.append(span)
    out += [
        "zzzznotaterm anything",  # unknown term -> empty
        "the and is",             # stopword-only -> empty
    ]
    # dedupe, keep order
    seen = set()
    return [p for p in out if not (p in seen or seen.add(p))]


class TestPosBlocks:
    def test_block_invariants(self, spark, corpus):
        paths, _, _, _ = corpus
        blocks = spark.read.parquet(paths.pos_postings)
        assert blocks.count() > 0
        assert blocks.filter(F.col("first_doc_id") > F.col("last_doc_id")).count() == 0
        assert blocks.filter(F.col("count") < 1).count() == 0
        # positional df per term == score-posting df per term
        score_df = (
            spark.read.parquet(paths.postings)
            .groupBy("term").agg(F.sum("count").alias("n"))
        )
        pos_df = blocks.groupBy("term").agg(F.sum("count").alias("np"))
        joined = score_df.join(pos_df, "term", "full")
        assert joined.filter(
            F.col("n").isNull() | F.col("np").isNull() | (F.col("n") != F.col("np"))
        ).count() == 0

    def test_positions_decode_to_doclen_bounded(self, spark, corpus):
        paths, oracle, _, _ = corpus
        import numpy as np

        from search_engine_spark.index.codec import (
            delta_decode,
            segmented_delta_decode,
            varint_decode,
        )

        rows = spark.read.parquet(paths.pos_postings).limit(50).collect()
        for r in rows:
            n = int(r["count"])
            ids = delta_decode(bytes(r["doc_ids"]), n)
            counts = varint_decode(bytes(r["pos_counts"]), n).astype(np.int64)
            flat = segmented_delta_decode(bytes(r["positions"]), counts)
            dls = varint_decode(bytes(r["doclens"]), n).astype(np.int64)
            assert len(ids) == n
            segs = np.split(flat, np.cumsum(counts)[:-1])
            for did, seg, cnt, dl in zip(ids, segs, counts, dls):
                toks = oracle.docs[int(did)]
                assert dl == len(toks)
                assert len(seg) == cnt >= 1
                assert (np.diff(seg.astype(np.int64)) > 0).all()
                # positions are the term's actual offsets in the stream
                term = r["term"]
                assert [toks[int(p)] for p in seg] == [term] * int(cnt)


class TestPhraseRankIdentity:
    def test_matches_oracle(self, spark, corpus):
        _, oracle, idx, raw = corpus
        phrases = _phrases(raw)
        assert len(phrases) > 8
        for q in phrases:
            expected = oracle.topk_phrase(q, k=10)
            got = [
                (r["doc_id"], r["score"])
                for r in idx.search_phrase(q, k=10, join_docs=False).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in expected], q
            for (_, a), (_, b) in zip(got, expected):
                assert abs(a - b) < 1e-9, q

    def test_phrase_stricter_than_and(self, spark, corpus):
        """Every phrase match must also be a conjunctive match."""
        _, oracle, idx, raw = corpus
        q = _phrases(raw)[1]  # a longer span
        ph = {r["doc_id"] for r in idx.search_phrase(q, k=100, join_docs=False).collect()}
        an = {r["doc_id"] for r in idx.search(q, k=100, mode="and", join_docs=False).collect()}
        assert ph and ph <= an

    def test_join_docs(self, spark, corpus):
        _, oracle, idx, raw = corpus
        q = _phrases(raw)[0]
        rows = idx.search_phrase(q, k=3).collect()
        assert rows and set(rows[0].asDict()) == {"doc_id", "score", "url", "title"}

    def test_merge_splices_positions_and_compact_is_fresh_equivalent(
        self, spark, tmp_path
    ):
        """A merged index must find phrases in DELTA docs (the splice);
        after compaction phrase ranking equals a from-scratch build."""
        from search_engine_spark.index.merge import (
            compact_index,
            merge_pages,
            read_tombstones,
        )

        all_pages = synth_pages(spark, 160, num_partitions=4)
        ordinal = F.regexp_extract("url", r"page/(\d+)", 1).cast("long")
        base = all_pages.filter(ordinal < 120)
        batch = all_pages.filter(ordinal >= 80)  # recrawl 80-119, add 120-159
        root = str(tmp_path / "mergepos")
        build_index(
            spark, base, root, num_buckets=8, block_size=16,
            num_partitions=4, index_positions=True,
        )
        merge_pages(spark, root, batch, num_partitions=4)
        idx = BM25Index(spark, root, seed_min_df=0)

        # phrase lifted from a delta-only page's raw text
        delta_row = all_pages.filter(ordinal == 150).select("url", "text").first()
        q = " ".join(delta_row["text"].split()[4:7])
        got = idx.search_phrase(q, k=20).collect()
        assert delta_row["url"] in {r["url"] for r in got}
        tomb_ids = {
            r["doc_id"] for r in read_tombstones(spark, idx.paths).collect()
        }
        assert not ({r["doc_id"] for r in got} & tomb_ids)

        # compacted == fresh rebuild over the live corpus (url + score)
        croot = str(tmp_path / "compactpos")
        compact_index(spark, root, croot, num_partitions=4)
        froot = str(tmp_path / "freshpos")
        build_index(
            spark, all_pages, froot, num_buckets=8, block_size=16,
            num_partitions=4, index_positions=True,
        )
        cidx = BM25Index(spark, croot, seed_min_df=0)
        fidx = BM25Index(spark, froot, seed_min_df=0)
        for query in (q, " ".join(delta_row["text"].split()[2:4])):
            a = [
                (r["url"], round(r["score"], 9))
                for r in cidx.search_phrase(query, k=15).collect()
            ]
            b = [
                (r["url"], round(r["score"], 9))
                for r in fidx.search_phrase(query, k=15).collect()
            ]
            assert a == b and a

    def test_candidate_gate_rank_identical(self, spark, corpus):
        """Forcing the rarest-term candidate pre-pass ON must not change
        any ranking — it is a pure superset filter."""
        _, oracle, idx, raw = corpus
        phrases = [p for p in _phrases(raw) if len(set(tokenize_py(p))) >= 2]
        assert phrases
        old = (
            idx.phrase_cand_max_df,
            idx.phrase_cand_ratio,
            idx.phrase_cand_min_pruned,
        )
        try:
            idx.phrase_cand_min_pruned = 0
            for q in phrases:
                idx.phrase_cand_max_df, idx.phrase_cand_ratio = 0, 1.0
                base = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_phrase(q, k=20, join_docs=False).collect()
                ]
                idx.phrase_cand_max_df = 10**9  # any df qualifies
                stats = idx._query_stats(sorted(set(tokenize_py(q))))
                dfs = sorted(s[0] for s in stats.values())
                gated = idx._conjunctive_candidates(sorted(stats), stats)
                if dfs and dfs[-1] >= idx.phrase_cand_ratio * dfs[0]:
                    assert gated is not None and len(gated) == dfs[0]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_phrase(q, k=20, join_docs=False).collect()
                ]
                assert got == base, q
                exp = [
                    (d, round(s, 9)) for d, s in oracle.topk_phrase(q, k=20)
                ]
                assert got == exp, q
        finally:
            (
                idx.phrase_cand_max_df,
                idx.phrase_cand_ratio,
                idx.phrase_cand_min_pruned,
            ) = old

    def test_slop_rank_identical_and_monotone(self, spark, corpus):
        """Ordered-proximity (slop) ranking matches the oracle at every
        slop level; match sets grow monotonically with slop; a gapped
        phrase (words i and i+2 of a doc) that misses exactly is
        recovered at slop >= 1."""
        _, oracle, idx, raw = corpus
        gapped, contiguous = [], []
        for d in sorted(raw)[:8]:
            w = raw[d].split()
            if len(w) >= 12:
                gapped.append((d, w[3] + " " + w[5]))
                gapped.append((d, " ".join([w[2], w[4], w[6]])))
                contiguous.append((d, " ".join(w[4:7])))
        queries = [
            (d, q) for d, q in gapped + contiguous
            if len(tokenize_py(q)) >= 2
        ]
        assert len(queries) >= 5
        for slop in (0, 1, 2, 4):
            for _, q in queries:
                exp = [
                    (doc, round(s, 9))
                    for doc, s in oracle.topk_phrase(q, k=20, slop=slop)
                ]
                got = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in idx.search_phrase(
                        q, k=20, join_docs=False, slop=slop
                    ).collect()
                ]
                assert got == exp, (slop, q)
        # the source doc of a w[i]+w[i+2] gap matches once slop covers
        # the skipped word — unless stopword filtering closed the gap
        hit_any = False
        for d, q in gapped:
            toks = tokenize_py(q)
            if len(toks) < 2:
                continue
            at2 = {
                r["doc_id"]
                for r in idx.search_phrase(q, k=200, join_docs=False, slop=2).collect()
            }
            assert d in at2, (d, q)
            at0 = {
                r["doc_id"]
                for r in idx.search_phrase(q, k=200, join_docs=False).collect()
            }
            assert at0 <= at2, (d, q)
            hit_any = hit_any or (d not in at0)
        assert hit_any  # slop recovered at least one true gap
        with pytest.raises(ValueError, match="slop"):
            idx.search_phrase("alpha beta", slop=-1)

    def test_empty_and_guard(self, spark, corpus, tmp_path):
        _, _, idx, _ = corpus
        assert idx.search_phrase("", k=5, join_docs=False).count() == 0
        assert idx.search_phrase("xy zq", k=0, join_docs=False).count() == 0
        # index without positions refuses phrase search loudly
        pages = synth_pages(spark, 20, num_partitions=2)
        root = str(tmp_path / "nopos")
        build_index(spark, pages, root, num_buckets=4, block_size=16,
                    num_partitions=2)
        bare = BM25Index(spark, root)
        # pick an indexed term that re-tokenizes to itself (Porter is
        # not idempotent) so the guard — not the early missing-term
        # empty return — is what fires
        terms = [
            r["term"]
            for r in spark.read.parquet(IndexPaths(root).term_stats)
            .select("term").collect()
        ]
        term = next(t for t in terms if tokenize_py(t) == [t])
        with pytest.raises(ValueError, match="positions"):
            bare.search_phrase(term, join_docs=False)


class TestBooleanPhrases:
    """search_boolean with quoted phrases: each phrase is a must
    match_phrase clause (scored, required), bare terms should/must on
    top, NOT filters unscored — rank-identical to topk_boolean."""

    def _spans(self, raw_by_id):
        for d in sorted(raw_by_id):
            words = raw_by_id[d].split()
            if len(words) >= 12:
                a = " ".join(words[3:6])
                b = " ".join(words[6:10])
                if tokenize_py(a) and tokenize_py(b):
                    return a, b
        raise AssertionError("no usable spans in corpus")

    def test_matches_oracle(self, spark, corpus):
        _, oracle, idx, raw_by_id = corpus
        a, b = self._spans(raw_by_id)
        queries = [
            f'"{a}"',                       # pure phrase
            f'"{a}" python programming',    # phrase + should terms
            f'"{a}" NOT database',          # phrase + must_not
            f'"{a}" AND python',            # phrase + must term
            f'"{a}" "{b}"',                 # two must phrases (same doc)
            f'"{a}" NOT {a.split()[0]}',    # negate a phrase word -> empty-ish
            '"zzzznotaterm anything" python',  # unindexed phrase -> empty
            f'python NOT "{a}"',            # negated phrase excludes its docs
            f'"{a}" NOT "{b}"',             # must phrase + must_not phrase
            f'python NOT "zzzz qqqq"',      # unindexed neg phrase -> no-op
        ]
        for q in queries:
            got = [
                (r["doc_id"], r["score"])
                for r in idx.search_boolean(q, k=10, join_docs=False)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .collect()
            ]
            want = oracle.topk_boolean(q, k=10)
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9, q

    def test_pure_phrase_equals_search_phrase(self, spark, corpus):
        _, _, idx, raw_by_id = corpus
        a, _ = self._spans(raw_by_id)
        bq = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_boolean(f'"{a}"', k=10, join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        pq = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_phrase(a, k=10, join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        assert bq == pq and bq

    def test_term_decode_gate_rank_identical(self, spark, corpus):
        """Boolean phrase+terms with the should-term decode gated by
        the phrase's rarest-term candidates == ungated (forced gate)."""
        paths, oracle, _, raw_by_id = corpus
        a, _ = self._spans(raw_by_id)
        q = f'"{a}" python programming'

        def run(idx):
            return [
                (r["doc_id"], round(r["score"], 9))
                for r in idx.search_boolean(q, k=10, join_docs=False)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .collect()
            ]

        plain = run(BM25Index(spark, paths.root))
        forced = BM25Index(spark, paths.root)
        forced.phrase_cand_max_df = 10**9
        forced.phrase_cand_ratio = 0.0
        forced.phrase_cand_min_pruned = 0
        assert run(forced) == plain and plain
        want = oracle.topk_boolean(q, k=10)
        assert [d for d, _ in plain] == [d for d, _ in want]

    def test_negated_phrase_docs_never_surface(self, spark, corpus):
        _, oracle, idx, raw_by_id = corpus
        a, _ = self._spans(raw_by_id)
        matched = {
            r["doc_id"]
            for r in idx.search_phrase(a, k=500, join_docs=False).collect()
        }
        assert matched
        got = {
            r["doc_id"]
            for r in idx.search_boolean(
                f'python NOT "{a}"', k=500, join_docs=False
            ).collect()
        }
        assert got and not (got & matched)

    def test_no_positions_index_raises(self, spark, corpus, tmp_path):
        pages = synth_pages(spark, 20, num_partitions=2)
        root = str(tmp_path / "nopos_bool")
        build_index(spark, pages, root, num_buckets=4, block_size=16,
                    num_partitions=2)
        bare = BM25Index(spark, root)
        terms = [
            r["term"]
            for r in spark.read.parquet(IndexPaths(root).term_stats)
            .select("term").collect()
        ]
        term = next(t for t in terms if tokenize_py(t) == [t])
        with pytest.raises(ValueError, match="positions"):
            bare.search_boolean(f'"{term}" other', join_docs=False)


def _mpp_oracle(oracle_docs, query, max_expansions, k):
    """Pure-Python match_phrase_prefix ground truth over token streams."""
    import re

    from search_engine_spark.index.scoring import idf_py, score_py

    words = query.strip().split()
    last = re.sub(r"[^a-z0-9]", "", words[-1].lower()) if words else ""
    ptoks = tokenize_py(" ".join(words[:-1]))
    if not last:
        return []
    df = {}
    n = len(oracle_docs)
    for toks in oracle_docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    exps = sorted(t for t in df if t.startswith(last))[:max_expansions]
    if not exps or any(df.get(t, 0) == 0 for t in ptoks):
        return []
    avgdl = sum(len(t) for t in oracle_docs.values()) / n
    idf_sum = sum(idf_py(n, df[t]) for t in set(ptoks))
    idf_sum += idf_py(n, max(df[t] for t in exps))
    expset = set(exps)
    out = []
    np_ = len(ptoks)
    for d, toks in oracle_docs.items():
        ptf = sum(
            1
            for i in range(len(toks) - np_)
            if toks[i:i + np_] == ptoks and toks[i + np_] in expset
        )
        if ptf:
            out.append((d, score_py(ptf, len(toks), idf_sum, avgdl)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


class TestPhrasePrefix:
    """ES match_phrase_prefix (search_phrase_prefix) vs the oracle."""

    def _queries(self, raw_by_id):
        out = []
        for d in sorted(raw_by_id)[:8]:
            words = raw_by_id[d].split()
            if len(words) >= 10:
                span = " ".join(words[3:6])
                if len(tokenize_py(" ".join(words[3:5]))) >= 1:
                    # truncate the last word to 4 chars -> a real prefix
                    parts = span.split()
                    parts[-1] = parts[-1][:4]
                    out.append(" ".join(parts))
        return out[:5]

    def test_rank_identity_vs_oracle(self, spark, corpus):
        paths, oracle, idx, raw_by_id = corpus
        queries = self._queries(raw_by_id)
        assert queries
        hit_any = False
        for q in queries:
            got = [
                (r["doc_id"], r["score"])
                for r in idx.search_phrase_prefix(q, k=10, join_docs=False)
                .orderBy(F.desc("score"), F.asc("doc_id")).collect()
            ]
            want = _mpp_oracle(oracle.docs, q, 50, 10)
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9, q
            hit_any = hit_any or bool(got)
        assert hit_any  # span-derived prefixes must actually match

    def test_single_word_prefix(self, spark, corpus):
        """One-word query: pure positional prefix counting."""
        paths, oracle, idx, raw_by_id = corpus
        q = "pyth"
        got = [
            (r["doc_id"], r["score"])
            for r in idx.search_phrase_prefix(q, k=10, join_docs=False)
            .orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = _mpp_oracle(oracle.docs, q, 50, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    def test_max_expansions_cap(self, spark, corpus):
        paths, oracle, idx, raw_by_id = corpus
        q = "data pr"  # broad prefix: the cap changes the expansion set
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search_phrase_prefix(
                q, k=10, max_expansions=2, join_docs=False
            ).orderBy(F.desc("score"), F.asc("doc_id")).collect()
        ]
        want = [
            (d, round(s, 9)) for d, s in _mpp_oracle(oracle.docs, q, 2, 10)
        ]
        assert got == want

    def test_no_expansions_is_empty(self, spark, corpus):
        paths, _, idx, _ = corpus
        assert idx.search_phrase_prefix(
            "python zzzzqq", join_docs=False
        ).count() == 0


class TestIntervals:
    """ES intervals query (match source): minimal-interval matching
    (ordered / unordered, max_gaps) rank-identical to the in-repo
    oracle; slop equivalence; repeated-term refusal."""

    def _assert_rank_identical(self, got, want, ctx=""):
        assert [d for d, _ in got] == [d for d, _ in want], ctx
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9, abs=1e-9), ctx

    def _got(self, df):
        return [
            (r["doc_id"], r["score"])
            for r in df.orderBy(
                F.desc("score"), F.asc("doc_id")
            ).collect()
        ]

    @pytest.mark.parametrize("ordered", [False, True])
    @pytest.mark.parametrize("max_gaps", [-1, 0, 3])
    def test_matches_oracle(self, corpus, ordered, max_gaps):
        paths, oracle, idx, raw_by_id = corpus
        d = sorted(raw_by_id)[0]
        words = raw_by_id[d].split()
        # two nearby words in reversed order + a plain 3-token query
        for q in [
            " ".join(tokenize_py(" ".join(words[3:6]))[:2][::-1]),
            "python database search",
        ]:
            toks = tokenize_py(q)
            if len(set(toks)) != len(toks) or not toks:
                continue
            got = self._got(idx.search_intervals(
                q, max_gaps=max_gaps, ordered=ordered,
                k=10, join_docs=False,
            ))
            want = sorted(
                oracle.intervals_scores(
                    q, max_gaps=max_gaps, ordered=ordered
                ).items(),
                key=lambda x: (-x[1], x[0]),
            )[:10]
            self._assert_rank_identical(
                got, want, f"{q!r} ordered={ordered} gaps={max_gaps}"
            )

    def test_ordered_max_gaps_equals_slop(self, corpus):
        """ordered intervals with max_gaps == s must rank-match
        match_phrase slop=s (same minimal-chain semantics)."""
        paths, oracle, idx, raw_by_id = corpus
        d = sorted(raw_by_id)[1]
        q = " ".join(tokenize_py(" ".join(raw_by_id[d].split()[2:6]))[:3])
        if len(set(tokenize_py(q))) != len(tokenize_py(q)):
            pytest.skip("sampled phrase repeats a term")
        for s in [0, 2]:
            a = self._got(idx.search_intervals(
                q, max_gaps=s, ordered=True, k=10, join_docs=False
            ))
            b = self._got(idx.search_phrase(
                q, slop=s, k=10, join_docs=False
            ))
            assert [x[0] for x in a] == [x[0] for x in b]
            for (_, sa), (_, sb) in zip(a, b):
                assert sa == pytest.approx(sb, rel=1e-9)

    def test_unordered_matches_reversed_text(self, corpus):
        """An unordered interval must hit docs where the terms appear
        in the opposite order; the ordered variant must not (unless a
        forward chain also exists)."""
        paths, oracle, idx, raw_by_id = corpus
        # find a doc + token pair (a, b) adjacent with no 'a ... b'
        # forward chain anywhere in that doc
        for d in sorted(raw_by_id):
            toks = tokenize_py(raw_by_id[d])
            for i in range(len(toks) - 1):
                a, b = toks[i + 1], toks[i]  # reversed pair
                if a == b:
                    continue
                fwd = oracle.intervals_scores(
                    f"{a} {b}", max_gaps=0, ordered=True
                )
                rev = oracle.intervals_scores(
                    f"{a} {b}", max_gaps=0, ordered=False
                )
                if d in rev and d not in fwd:
                    got_un = {
                        r["doc_id"]
                        for r in idx.search_intervals(
                            f"{a} {b}", max_gaps=0, ordered=False,
                            k=1000, join_docs=False,
                        ).collect()
                    }
                    got_or = {
                        r["doc_id"]
                        for r in idx.search_intervals(
                            f"{a} {b}", max_gaps=0, ordered=True,
                            k=1000, join_docs=False,
                        ).collect()
                    }
                    assert d in got_un and d not in got_or
                    return
        pytest.skip("no reversed-only adjacent pair in corpus")

    def test_repeated_term_refused(self, corpus):
        *_, idx, _ = corpus
        with pytest.raises(NotImplementedError):
            idx.search_intervals("data data", k=5)

    def test_dsl_lowering(self, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        paths, oracle, idx, raw_by_id = corpus
        body = {"query": {"intervals": {"content": {"match": {
            "query": "python database", "max_gaps": 4,
            "ordered": True}}}}, "size": 10}
        got = execute_es_query(idx, body, join_docs=False).collect()
        want = idx.search_intervals(
            "python database", max_gaps=4, ordered=True,
            k=10, join_docs=False,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_dsl_any_of(self, corpus):
        from search_engine_spark.query.dsl import execute_es_query

        paths, oracle, idx, raw_by_id = corpus
        q1, q2 = "python database", "search engine"
        body = {"query": {"intervals": {"content": {"any_of": {
            "intervals": [
                {"match": {"query": q1, "max_gaps": 2}},
                {"match": {"query": q2, "ordered": True}},
            ]}}}}, "size": 10}
        got = self._got(execute_es_query(idx, body, join_docs=False))
        s1 = oracle.intervals_scores(q1, max_gaps=2, ordered=False)
        s2 = oracle.intervals_scores(q2, max_gaps=-1, ordered=True)
        comb = {}
        for m in (s1, s2):
            for d, s in m.items():
                comb[d] = comb.get(d, 0.0) + s
        want = sorted(comb.items(), key=lambda x: (-x[1], x[0]))[:10]
        self._assert_rank_identical(got, want)

    def test_unknown_term_empty(self, corpus):
        *_, idx, _ = corpus
        assert idx.search_intervals(
            "zzqqxx python", k=5, join_docs=False
        ).count() == 0
