"""Text-layer tests: tokenizer semantics ported from the reference's
test suite (backend/tests/test_backend.py), stemmer spot checks, and the
extraction byte-identity invariant across the Spark boundary."""

import pandas as pd
from pyspark.sql import functions as F

from search_engine_spark.synth import make_page, synth_pages
from search_engine_spark.text.extract import extract_content, extract_df
from search_engine_spark.text.porter import porter_stem
from search_engine_spark.text.tokenizer import raw_tokens_col, tokenize_py, tokens_col


class TestTokenizerPy:
    def test_lowercase_and_stopwords(self):
        # test_backend.py:507-519: lowercase, drops "is"/"a"
        toks = tokenize_py("Hello World! This is a TEST.", stem=False)
        assert toks == ["hello", "world", "test"]

    def test_len_filter(self):
        assert tokenize_py("a b cd x yz", stem=False) == ["cd", "yz"]

    def test_digits_kept(self):
        # tfidf.py:128 keeps [a-z0-9]
        assert "2024" in tokenize_py("year 2024 report", stem=False)

    def test_empty(self):
        assert tokenize_py("") == []
        assert tokenize_py(None) == []

    def test_stemming(self):
        assert tokenize_py("running jumps quickly") == ["run", "jump", "quickli"]


class TestPorter:
    def test_published_examples(self):
        cases = {
            "caresses": "caress", "ponies": "poni", "agreed": "agre",
            "motoring": "motor", "hopping": "hop", "relational": "relat",
            "vietnamization": "vietnam", "triplicate": "triplic",
            "adjustable": "adjust", "effective": "effect", "rate": "rate",
            "controll": "control", "searching": "search", "engines": "engin",
        }
        for w, e in cases.items():
            assert porter_stem(w) == e, w

    def test_short_passthrough(self):
        assert porter_stem("ab") == "ab"
        assert porter_stem("x") == "x"


class TestSparkTokenizer:
    def test_native_matches_python(self, spark):
        texts = [
            "Hello World! This is a TEST.",
            "The quick brown fox jumps over the lazy dog",
            "  multiple   spaces\tand\nnewlines  ",
            "punctuation!!! everywhere... [brackets] {braces}",
            "digits 123 and mixed a1b2 x9",
            "",
        ]
        df = spark.createDataFrame(pd.DataFrame({"text": texts}))
        rows = (
            df.select(
                "text",
                raw_tokens_col(F.col("text")).alias("raw"),
                tokens_col(F.col("text")).alias("stemmed"),
            )
            .collect()
        )
        for r in rows:
            assert r["raw"] == tokenize_py(r["text"], stem=False), r["text"]
            assert r["stemmed"] == tokenize_py(r["text"], stem=True), r["text"]


class TestExtraction:
    def test_removed_tags(self):
        html = (
            "<html><head><title>T</title><script>x</script></head>"
            "<body><nav>n</nav><p>keep me</p><footer>f</footer></body></html>"
        )
        e = extract_content(html)
        assert e.text == "keep me"
        assert e.title == "T"

    def test_entities_and_whitespace(self):
        html = "<html><body><p>Fish &amp; chips</p>\n\n<p>again   now</p></body></html>"
        assert extract_content(html).text == "Fish & chips again now"

    def test_no_body_fallback(self):
        # crawler.py:357-359: fall back to whole-doc text
        assert extract_content("<p>loose text</p>").text == "loose text"

    def test_truncation(self):
        html = "<html><body>" + ("word " * 20000) + "</body></html>"
        assert len(extract_content(html).text) == 50000

    def test_meta_description(self):
        html = '<html><head><meta name="description" content=" hi there "></head><body>x</body></html>'
        assert extract_content(html).description == "hi there"

    def test_byte_identity_distributed(self, spark):
        """THE invariant: Arrow-UDF extraction over the distributed pages
        table is byte-identical per url to the stored text column."""
        pages = synth_pages(spark, 300, num_partitions=6)
        ex = extract_df(pages)
        mismatches = ex.filter(
            F.col("extracted_text").cast("binary") != F.col("text").cast("binary")
        ).count()
        assert mismatches == 0
        assert ex.count() == 300

    def test_generator_deterministic(self):
        p1, p2 = make_page(17), make_page(17)
        assert p1 == p2
        assert make_page(18) != p1


class TestRepetitionStats:
    """Gopher-style repetition features (ops/textstats.py) vs a
    Counter-based oracle, incl. empty / single-token / degenerate
    all-same-token docs."""

    def test_matches_counter_oracle(self, spark):
        from collections import Counter
        from search_engine_spark.ops.textstats import repetition_stats
        from search_engine_spark.text.tokenizer import tokenize_py

        texts = [
            (1, "the quick brown fox jumps over the lazy dog dog dog"),
            (2, "spam spam spam spam spam"),          # max repetition
            (3, "unique words only here today"),
            (4, ""),                                   # empty
            (5, "word"),                               # 1 token
            (6, "a b a b a b a b"),                    # bigram cycle
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["id"]: (r["n_tokens"], r["top_unigram_frac"], r["top_bigram_frac"])
            for r in repetition_stats(df, "doc_id", "text").collect()
        }
        for i, t in texts:
            toks = tokenize_py(t, stem=False)
            n = len(toks)
            uf = round(max(Counter(toks).values()) / n, 6) if n else 0.0
            bis = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            bf = round(max(Counter(bis).values()) / len(bis), 6) if bis else 0.0
            assert got[i] == (n, uf, bf), (i, got[i], (n, uf, bf))
        assert got[2][1] == 1.0 and got[2][2] == 1.0  # all-spam doc


class TestDetectLanguage:
    SAMPLES = [
        (1, "the quick brown fox jumps over the lazy dog and it is fast",
         "en"),
        (2, "der hund und die katze sind nicht im haus bei dem baum", "de"),
        (3, "el perro y el gato no se ven en la casa del pueblo", "es"),
        (4, "le chien et le chat ne sont pas dans la maison du village",
         "fr"),
        (5, "il cane e il gatto non sono nella casa del paese che si vede",
         "it"),
        (6, "o cão e o gato não estão em casa do povo que se vê", "pt"),
        (7, "zzz qqq xxx yyy www", "und"),
        (8, "", "und"),
    ]

    def test_winners(self, spark):
        from search_engine_spark.ops.textstats import detect_language

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.SAMPLES], "doc_id long, text string"
        )
        got = {
            r["id"]: (r["lang"], r["lang_score"])
            for r in detect_language(df, "doc_id", "text").collect()
        }
        for i, _, want in self.SAMPLES:
            assert got[i][0] == want, (i, got[i])
        assert got[7][1] == 0.0 and got[8][1] == 0.0

    def test_matches_python_mirror(self, spark):
        """Ratio + tie-break identical to the dumb per-row Python
        computation (alphabetical language order on ties)."""
        from search_engine_spark.ops.textstats import (
            LANG_MARKERS, detect_language,
        )
        import re

        texts = [t for _, t, _ in self.SAMPLES] + [
            "de la le en un",          # heavy cross-language overlap
            "que se del al con",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["id"]: (r["lang"], r["lang_score"])
            for r in detect_language(df, "doc_id", "text").collect()
        }
        for i, t in enumerate(texts):
            words = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
            ratios = {
                lang: (
                    sum(w in set(ms) for w in words) / len(words)
                    if words != [""] else 0.0
                )
                for lang, ms in LANG_MARKERS.items()
            }
            best = max(ratios.values())
            want = (
                "und"
                if best == 0.0
                else min(l for l, r in ratios.items() if r == best)
            )
            assert got[i][0] == want, (i, t, ratios, got[i])
            assert got[i][1] == round(best, 6), (i, t)


class TestAnalyze:
    """ES _analyze parity: the debugging API must report the REAL
    pipeline (token drift here would misdiagnose query misses)."""

    def test_tokens_match_tokenize_py(self):
        from search_engine_spark.text.tokenizer import analyze

        for text in [
            "The Quick Brown Fox jumps!",
            "Spark-based BM25: index & query, 100% vectorized.",
            "a i is the of",  # stopwords + len<2 only -> nothing
            "",
        ]:
            assert [t["token"] for t in analyze(text)] == tokenize_py(text)

    def test_offsets_and_positions(self):
        from search_engine_spark.text.tokenizer import analyze

        text = "The searching, engines!"
        toks = analyze(text)
        # positions are filtered-stream offsets (stopword "the" consumes
        # no increment) — the phrase-search convention
        assert [t["position"] for t in toks] == [0, 1]
        # offsets span the surface forms in the (1:1 for ASCII) input
        surfaces = [
            text.lower()[t["start_offset"]:t["end_offset"]] for t in toks
        ]
        assert surfaces == ["searching", "engines"]

    def test_explain_stages(self):
        from search_engine_spark.text.tokenizer import analyze

        d = analyze("The Quick-Brown a Fox", explain=True)
        assert d["tokenizer"] == ["the", "quick", "brown", "a", "fox"]
        assert d["stop_filter"] == ["quick", "brown", "fox"]
        assert d["length_filter"] == ["quick", "brown", "fox"]
        assert d["porter_stem"] == tokenize_py("The Quick-Brown a Fox")
        assert [t["token"] for t in d["tokens"]] == d["porter_stem"]


class TestLMQuality:
    """Bigram-LM perplexity quality scoring (ops/textstats.py:
    lm_quality) vs exact Python recomputation over the same LM tables,
    plus the qualitative invariant the filter exists for: corpus-like
    text scores lower perplexity than shuffled-vocabulary gibberish."""

    def test_matches_python_oracle(self, spark, tmp_path):
        import math

        from search_engine_spark.index.builder import (
            build_index,
        )
        from search_engine_spark.ops.textstats import lm_quality_from_index
        from search_engine_spark.synth import synth_pages
        from search_engine_spark.text.tokenizer import tokenize_py

        root = str(tmp_path / "idx")
        pages = synth_pages(spark, 120, num_partitions=4)
        build_index(
            spark, pages, root, num_buckets=8, block_size=32,
            num_partitions=4, index_shingles=True,
        )
        # LM oracle from the same corpus
        texts = {r["url"]: tokenize_py(r["text"])
                 for r in pages.select("url", "text").collect()}
        uni, bi = {}, {}
        for toks in texts.values():
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        T = sum(uni.values())

        def lu(w):
            return math.log(max(uni.get(w, 0), 0.5) / T)

        def doc_lp(toks):
            lp = lu(toks[0])
            for a, b in zip(toks, toks[1:]):
                c2, c1 = bi.get((a, b), 0), uni.get(a, 0)
                lp += (math.log(c2 / c1) if c2 > 0 and c1 > 0
                       else math.log(0.4) + lu(b))
            return lp

        got = {
            r["id"]: r
            for r in lm_quality_from_index(
                spark, pages.select("url", "text"), root, id_col="url"
            ).collect()
        }
        scored = {u: t for u, t in texts.items() if t}
        assert set(got) == set(scored)
        for u, toks in scored.items():
            lp = doc_lp(toks)
            assert got[u]["n_tokens"] == len(toks)
            assert abs(got[u]["sum_logp"] - lp) < 1e-4
            assert abs(
                got[u]["perplexity"] - math.exp(-lp / len(toks))
            ) < max(1e-4 * got[u]["perplexity"], 1e-4)

    def test_gibberish_scores_worse(self, spark, tmp_path):
        from search_engine_spark.index.builder import build_index
        from search_engine_spark.ops.textstats import lm_quality_from_index
        from search_engine_spark.synth import synth_pages

        root = str(tmp_path / "idx")
        pages = synth_pages(spark, 150, num_partitions=4)
        build_index(
            spark, pages, root, num_buckets=8, block_size=32,
            num_partitions=4, index_shingles=True,
        )
        probe = spark.createDataFrame(
            [
                ("fluent", "the search engine builds an index of the "
                           "data and the query engine ranks results"),
                ("gibberish", "zq1 zq99 zq1234 zq777 zq31 zq9999 zq123 "
                              "zq456 zq789 zq111"),
            ],
            "doc_id string, text string",
        )
        rows = {
            r["id"]: r["perplexity"]
            for r in lm_quality_from_index(spark, probe, root).collect()
        }
        assert rows["fluent"] < rows["gibberish"]


class TestGopherRules:
    """Gopher rule battery (Rae et al. 2021 A1.1) vs per-rule Python
    recomputation on hand-built docs."""

    def _df(self, spark):
        good = (
            "the data pipeline loads records and that process is "
            "careful to have consistent output with every run . "
        ) * 5  # ~90 words of plain prose with required stopwords
        rows = [
            (1, good),
            (2, "tiny doc"),                            # word count
            (3, "the " + "# " * 60 + "of that have with be to and"),
            (4, "- one bullet line\n- two bullet line\n"
                "- three bullet line"),                 # all bullets
            (5, "zzz qqq www eee rrr " * 20),           # no stopwords
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_rules_and_features(self, spark):
        from search_engine_spark.ops.textstats import (
            GOPHER_STOPWORDS,
            gopher_rules,
        )

        df = self._df(spark)
        out = {
            r["id"]: r.asDict()
            for r in gopher_rules(
                df, "doc_id", "text", min_words=20, max_bullet_ratio=0.5
            ).collect()
        }
        import re

        for doc_id, text in [(r[0], r[1]) for r in self._df(spark).collect()]:
            words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            lines = [l for l in text.split("\n") if l.strip()]
            r = out[doc_id]
            assert r["n_words"] == len(words)
            assert abs(
                r["mean_word_len"]
                - sum(len(w) for w in words) / len(words)
            ) < 1e-5
            n_sym = len(re.findall(r"#|\.\.\.|…", text))
            assert abs(r["symbol_ratio"] - n_sym / len(words)) < 1e-5
            n_b = sum(
                1 for l in lines if re.match(r"^[-*•]", l.strip())
            )
            assert abs(r["bullet_ratio"] - n_b / len(lines)) < 1e-5
            hits = len(set(words) & set(GOPHER_STOPWORDS))
            assert r["stop_hits"] == hits
            assert r["rule_stopwords"] == (hits >= 2)
        assert out[1]["passes_gopher"] is True
        assert out[2]["rule_word_count"] is False
        assert out[3]["rule_symbol_ratio"] is False
        assert out[4]["rule_bullet_ratio"] is False
        assert out[5]["rule_stopwords"] is False
        for d in (2, 3, 4, 5):
            assert out[d]["passes_gopher"] is False


class TestPiiStats:
    def test_counts_and_redaction(self, spark):
        from search_engine_spark.ops.textstats import pii_stats

        rows = [
            (1, "mail me at jo.doe+x@example.co.uk or admin@test.org"),
            (2, "server at 192.168.0.1 and 10.0.0.255 port 8080"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text with no pii at all"),
            (5, "mixed: a@b.io from 8.8.8.8 ring 555-123-9999 now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: r for r in pii_stats(df, "doc_id", "text").collect()
        }
        assert out[1]["n_emails"] == 2 and "<EMAIL>" in out[1]["redacted"]
        assert "example.co.uk" not in out[1]["redacted"]
        assert out[2]["n_ips"] == 2 and out[2]["n_emails"] == 0
        assert out[2]["redacted"].count("<IP>") == 2
        assert out[3]["n_phones"] == 1
        assert out[3]["redacted"] == "call <PHONE> today"
        assert (
            out[4]["n_emails"] == out[4]["n_ips"] == out[4]["n_phones"] == 0
        )
        assert out[4]["redacted"] == rows[3][1]
        r5 = out[5]
        assert (r5["n_emails"], r5["n_ips"], r5["n_phones"]) == (1, 1, 1)
        assert r5["redacted"] == "mixed: <EMAIL> from <IP> ring <PHONE> now"


class TestC4LineStats:
    def test_line_rules_and_flags(self, spark):
        from search_engine_spark.ops.textstats import c4_line_stats

        text = "\n".join([
            "This is a proper sentence.",          # kept
            "short.",                              # < 3 words
            "No terminal punctuation here",        # no punct
            "Please enable javascript to view.",   # javascript
            "  Another good line stays here!  ",   # kept (trimmed)
            "",                                    # blank: not counted
            'He said "quote."',                    # kept (quote end)
        ])
        rows = [
            (1, text),
            (2, "Lorem ipsum dolor sit amet."),
            (3, "code { margin: 0; } is css."),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: r
            for r in c4_line_stats(df, "doc_id", "text").collect()
        }
        assert out[1]["n_lines"] == 6
        assert out[1]["n_kept"] == 3
        assert out[1]["clean_text"] == (
            "This is a proper sentence.\n"
            "Another good line stays here!\n"
            'He said "quote."'
        )
        assert not out[1]["has_lorem_ipsum"] and not out[1]["has_brace"]
        assert out[2]["has_lorem_ipsum"] is True
        assert out[3]["has_brace"] is True
        assert out[4]["n_lines"] == 0 and out[4]["clean_text"] == ""
