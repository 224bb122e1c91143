"""Reference TestTFIDF numeric semantics, ported 1:1
(backend/tests/test_backend.py:411-519) — the same constants asserted
against OUR Spark column expressions and the in-repo TF-IDF oracle.

SURVEY.md §5.2 item 1: raw/log/augmented TF, df accumulation, smooth
IDF (including the 0.0-for-ubiquitous-terms case), and the 3-doc
end-to-end calculator."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from search_engine_spark.query.oracle import TFIDFOracle
from search_engine_spark.text.tokenizer import tokenize_py


def _tf_df(spark, docs):
    rows = [(i, toks) for i, toks in enumerate(docs)]
    return (
        spark.createDataFrame(rows, "doc_id long, toks array<string>")
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


class TestTFVariants:
    def test_raw_tf(self, spark):
        # test_backend.py:414-422
        tf = {
            r["term"]: r["tf"]
            for r in _tf_df(
                spark, [["hello", "world", "hello", "test", "hello"]]
            ).collect()
        }
        assert tf["hello"] == 3 and tf["world"] == 1
        assert "missing" not in tf  # raw_tf('missing') == 0

    def test_log_tf(self, spark):
        # test_backend.py:424-434: log_tf = 1 + log10(count)
        rows = (
            _tf_df(spark, [["hello", "hello", "hello"]])
            .select("term", (1.0 + F.log10("tf")).alias("log_tf"))
            .collect()
        )
        assert abs(rows[0]["log_tf"] - (1 + math.log10(3))) < 1e-4

    def test_augmented_tf(self, spark):
        # test_backend.py:436-446: 0.5 + 0.5 * tf / max_tf (D8 window)
        w = Window.partitionBy("doc_id")
        rows = {
            r["term"]: r["aug"]
            for r in _tf_df(spark, [["hello", "hello", "world"]])
            .select(
                "term",
                (0.5 + 0.5 * F.col("tf") / F.max("tf").over(w)).alias("aug"),
            )
            .collect()
        }
        assert rows["hello"] == 1.0 and rows["world"] == 0.75


class TestIDF:
    def test_df_accumulation(self, spark):
        # test_backend.py:448-461
        docs = [["hello", "world"], ["hello", "test"], ["foo", "bar"]]
        df_t = (
            _tf_df(spark, docs)
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
        )
        got = {r["term"]: r["df"] for r in df_t.collect()}
        assert got["hello"] == 2 and got["world"] == 1
        assert len(docs) == 3  # total_docs

    def test_idf_smooth(self, spark):
        # test_backend.py:463-478: log10((N+1)/(df+1)); 0.0 when df==N
        docs = [["hello", "world"], ["hello", "test"]]
        n = len(docs)
        got = {
            r["term"]: r["idf"]
            for r in _tf_df(spark, docs)
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .select(
                "term",
                F.log10((F.lit(n) + 1.0) / (F.col("df") + 1.0)).alias("idf"),
            )
            .collect()
        }
        assert got["hello"] == 0.0  # ubiquitous term
        assert abs(got["world"] - math.log10(3 / 2)) < 1e-4


class TestCalculatorEndToEnd:
    def test_three_doc_calculator(self):
        # test_backend.py:480-495 — same corpus, our oracle semantics
        corpus = {
            1: tokenize_py("The quick brown fox"),
            2: tokenize_py("The lazy brown dog"),
            3: tokenize_py("Quick fox jumps"),
        }
        oracle = TFIDFOracle(corpus)
        assert oracle.n == 3
        assert len(oracle.df) > 0  # vocabulary_size > 0
        results = oracle.topk("quick fox", k=10)
        assert results
        # docs 1 and 3 hold both query terms -> highest scores
        assert {d for d, _ in results[:2]} == {1, 3}

    def test_preprocessor_semantics(self):
        # test_backend.py:497-519 (parse covered in test_boolean.py)
        toks = tokenize_py("Hello World! This is a TEST.")
        assert toks and all(t == t.lower() for t in toks)
        assert "is" not in toks and "a" not in toks
