"""BPE trainer/encoder (ops/bpe.py): training goldens on a
hand-checked corpus, encode==training-segmentation, round-trip,
distributed-vs-Python parity, determinism across partitioning."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import bpe as B


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


class TestTrain:
    def test_hand_checked_merges(self):
        # "low" x5, "lower" x2: first merges are driven by the
        # weighted pair counts: (l,o)=7, (o,w)=7, (w,</w>)=5 ...
        wf = [("low", 5), ("lower", 2)]
        merges = B.train_bpe(wf, 4)
        # (l,o) and (o,w) tie at 7 -> lexicographic: ("l","o") first,
        # then ("lo","w") at 7, then ("low","</w>") at 5
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")
        assert merges[2] == ("low", "</w>")
        # remaining: lower -> low e r </w>: pairs all count 2;
        # lexicographic min among them is ("e","r")
        assert merges[3] == ("e", "r")

    def test_stops_when_nothing_repeats(self):
        merges = B.train_bpe([("ab", 1), ("cd", 1)], 100)
        # every pair occurs once -> no merge is worth learning
        assert merges == []

    def test_deterministic(self):
        wf = [("banana", 3), ("bandana", 2), ("ananas", 4)]
        assert B.train_bpe(wf, 10) == B.train_bpe(wf, 10)

    def test_validation_and_edge(self):
        with pytest.raises(ValueError):
            B.train_bpe([("a", 1)], -1)
        assert B.train_bpe([], 5) == []
        assert B.train_bpe([("", 5), ("x", 0)], 5) == []


class TestApply:
    def test_encode_matches_training_segmentation(self):
        wf = [("hugging", 10), ("hugs", 5), ("hug", 8), ("pugs", 3)]
        merges = B.train_bpe(wf, 8)
        ranks = B._ranks(merges)
        # re-derive each training word's final segmentation by
        # replaying the merges over the vocab, then check apply_bpe
        vocab = {tuple(w) + (B.END,): c for w, c in wf}
        for m in merges:
            merged = m[0] + m[1]
            nv = {}
            for seq, c in vocab.items():
                out, i = [], 0
                while i < len(seq):
                    if (
                        i + 1 < len(seq)
                        and seq[i] == m[0]
                        and seq[i + 1] == m[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                nv[tuple(out)] = c
            vocab = nv
        final = {"".join(k).replace(B.END, ""): list(k) for k in vocab}
        for w, _ in wf:
            assert B.apply_bpe(w, ranks) == final[w], w

    def test_round_trip(self):
        wf = [("mississippi", 4), ("missive", 2), ("ship", 6)]
        ranks = B._ranks(B.train_bpe(wf, 12))
        for w in ("mississippi", "missive", "ship", "unseen", "s"):
            toks = B.apply_bpe(w, ranks)
            assert "".join(toks) == w + B.END
            assert toks[-1].endswith(B.END)

    def test_unseen_chars_stay_atomic(self):
        ranks = B._ranks(B.train_bpe([("aa", 5)], 3))
        assert B.apply_bpe("zq", ranks) == ["z", "q", B.END]


class TestDistributed:
    TEXTS = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps",
        "quick quick brown foxes",
        "",
        None,
        "THE Quick\tBROWN\n fox",
    ]

    def test_word_counts_matches_python(self, spark):
        docs = _mk_docs(spark, self.TEXTS)
        got = {
            r["word"]: r["count"]
            for r in B.word_counts(docs, "text").collect()
        }
        exp = {}
        for t in self.TEXTS:
            for w in B.words_py(t or ""):
                exp[w] = exp.get(w, 0) + 1
        assert got == exp

    def test_encode_matches_python_and_partitioning(self, spark):
        docs = _mk_docs(spark, self.TEXTS)
        merges = B.train_bpe(B.top_words(docs, "text", 100), 20)
        ranks = B._ranks(merges)
        got = {
            r["id"]: r["tokens"]
            for r in B.bpe_encode(docs, "doc_id", "text", merges).collect()
        }
        for i, t in enumerate(self.TEXTS):
            assert got[i] == B.encode_py(t or "", ranks), i
        # identical under different partitioning
        again = {
            r["id"]: r["tokens"]
            for r in B.bpe_encode(
                docs.repartition(7), "doc_id", "text", merges
            ).collect()
        }
        assert got == again

    def test_token_counts(self, spark):
        docs = _mk_docs(spark, self.TEXTS)
        merges = B.train_bpe(B.top_words(docs, "text", 100), 10)
        ranks = B._ranks(merges)
        got = {
            r["id"]: r["n_bpe_tokens"]
            for r in B.bpe_token_counts(
                docs, "doc_id", "text", merges
            ).collect()
        }
        for i, t in enumerate(self.TEXTS):
            assert got[i] == len(B.encode_py(t or "", ranks)), i

    def test_top_words_cap_is_deterministic(self, spark):
        docs = _mk_docs(spark, self.TEXTS)
        a = B.top_words(docs, "text", 5)
        b = B.top_words(docs, "text", 5)
        assert a == b and len(a) == 5
        # ordered by count desc then word asc
        counts = [c for _, c in a]
        assert counts == sorted(counts, reverse=True)


class TestProperty:
    def test_random_corpus_round_trip_and_parity(self, spark):
        import random

        rng = random.Random(7)
        alpha = "abcdef"
        texts = [
            " ".join(
                "".join(
                    rng.choice(alpha)
                    for _ in range(rng.randint(1, 8))
                )
                for _ in range(rng.randint(0, 20))
            )
            for _ in range(60)
        ]
        docs = _mk_docs(spark, texts)
        merges = B.train_bpe(B.top_words(docs, "text", 500), 40)
        ranks = B._ranks(merges)
        got = {
            r["id"]: r["tokens"]
            for r in B.bpe_encode(docs, "doc_id", "text", merges).collect()
        }
        for i, t in enumerate(texts):
            toks = got[i]
            assert toks == B.encode_py(t, ranks)
            assert "".join(toks) == "".join(
                w + B.END for w in B.words_py(t)
            )


class TestStringIds:
    def test_encode_preserves_string_id_type(self, spark):
        docs = spark.createDataFrame(
            [("url://a", "hello world"), ("url://b", "hello again")],
            ["url", "text"],
        )
        merges = B.train_bpe(B.top_words(docs, "text", 10), 5)
        out = B.bpe_encode(docs, "url", "text", merges)
        assert dict(out.dtypes)["id"] == "string"
        got = {r["id"]: r["tokens"] for r in out.collect()}
        ranks = B._ranks(merges)
        assert got["url://a"] == B.encode_py("hello world", ranks)


class TestFastTrainerParity:
    def test_equals_naive_on_random_corpora(self):
        import random

        for seed in range(12):
            rng = random.Random(seed)
            alpha = "abc" if seed % 2 else "abcdef"
            wf = [
                (
                    "".join(
                        rng.choice(alpha)
                        for _ in range(rng.randint(1, 9))
                    ),
                    rng.randint(1, 6),
                )
                for _ in range(rng.randint(3, 60))
            ]
            n = rng.randint(0, 40)
            assert B.train_bpe(wf, n) == B.train_bpe_naive(wf, n), (
                seed, n, wf[:5])

    def test_equals_naive_with_heavy_ties_and_runs(self):
        # repeated-char runs exercise overlap handling; equal counts
        # exercise the lexicographic tie-break through the lazy heap
        wf = [("aaaa", 3), ("aaab", 3), ("bbaa", 3), ("abab", 3)]
        for n in (1, 2, 5, 20):
            assert B.train_bpe(wf, n) == B.train_bpe_naive(wf, n), n

    def test_large_dictionary_is_fast(self):
        import random
        import time

        rng = random.Random(1)
        wf = [
            (
                "".join(
                    rng.choice("abcdefghijklmnop")
                    for _ in range(rng.randint(2, 12))
                ),
                rng.randint(1, 100),
            )
            for _ in range(20000)
        ]
        t0 = time.time()
        merges = B.train_bpe(wf, 2000)
        dt = time.time() - t0
        assert len(merges) == 2000
        assert dt < 30, f"incremental trainer too slow: {dt:.1f}s"
