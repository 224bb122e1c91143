"""Model-based quality classifier (ops/classifier.py): separation on
a constructed corpus, ranking sanity, soft/hard filtering, feature
expression parity, and a native (no-Python) scoring plan."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import classifier as C

PROSE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a clear morning walk through the quiet forest calms the mind",
    "she reads a good book by the warm fire every winter evening",
    "the old bridge across the valley carries travelers into town",
    "fresh bread and coffee make a fine start to any slow sunday",
]
JUNK = [
    "buy cheap pills now click here winner winner free free free",
    "xz9 qqq lol zzz click subscribe smash like button now now",
    "cheap cheap deal deal offer offer expires buy buy buy now",
    "win big casino jackpot bonus code claim claim claim free spins",
    "hot singles area click link below free gift card claim now",
]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame(
        [(t,) for t in PROSE * 8], ["text"]
    )
    neg = spark.createDataFrame(
        [(t,) for t in JUNK * 8], ["text"]
    )
    return C.train_quality_classifier(
        pos, neg, n_features=1 << 12, max_iter=30
    )


class TestSeparation:
    def test_training_classes_separate(self, spark, model):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PROSE + JUNK)],
            ["doc_id", "text"],
        )
        scores = {
            r["id"]: r["quality_prob"]
            for r in model.score(docs, "doc_id").collect()
        }
        for i in range(len(PROSE)):
            assert scores[i] > 0.8, (i, scores[i])
        for i in range(len(PROSE), len(PROSE) + len(JUNK)):
            assert scores[i] < 0.2, (i, scores[i])

    def test_unseen_docs_rank_sanely(self, spark, model):
        docs = spark.createDataFrame(
            [
                (0, "the calm river flows past the quiet old town"),
                (1, "free free click claim now buy cheap deal win"),
            ],
            ["doc_id", "text"],
        )
        s = {
            r["id"]: r["quality_prob"]
            for r in model.score(docs, "doc_id").collect()
        }
        assert s[0] > s[1]

    def test_probability_bounds(self, spark, model):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PROSE + JUNK + [""])],
            ["doc_id", "text"],
        )
        rows = model.score(docs, "doc_id").collect()
        assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
        assert len(rows) == len(PROSE) + len(JUNK) + 1


class TestFilter:
    def test_hard_filter_keeps_prose(self, spark, model):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PROSE + JUNK)],
            ["doc_id", "text"],
        )
        kept = C.classifier_filter(docs, "doc_id", "text", model)
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == set(range(len(PROSE)))

    def test_soft_filter_is_deterministic(self, spark, model):
        docs = spark.createDataFrame(
            [(i, (PROSE + JUNK)[i % 10]) for i in range(200)],
            ["doc_id", "text"],
        )
        a = {
            r["doc_id"]
            for r in C.classifier_filter(
                docs, "doc_id", "text", model, soft=True
            ).collect()
        }
        b = {
            r["doc_id"]
            for r in C.classifier_filter(
                docs, "doc_id", "text", model, soft=True
            ).collect()
        }
        assert a == b
        # soft keep retains most prose copies, few junk copies
        n_prose = len([i for i in a if i % 10 < 5])
        n_junk = len([i for i in a if i % 10 >= 5])
        assert n_prose > n_junk * 3


class TestFeatures:
    def test_ngram_features_expression(self, spark):
        df = spark.createDataFrame(
            [("a b c",), ("x",), ("",)], ["text"]
        )
        rows = df.select(
            C.ngram_features(F.col("text")).alias("g")
        ).collect()
        assert rows[0]["g"] == ["a", "b", "c", "a b", "b c"]
        assert rows[1]["g"] == ["x"]
        assert rows[2]["g"] == []

    def test_scoring_plan_has_no_python(self, spark, model):
        import contextlib
        import io

        docs = spark.createDataFrame(
            [(1, "some text here")], ["doc_id", "text"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            model.score(docs, "doc_id").explain(mode="formatted")
        plan = buf.getvalue()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan

    def test_validation(self, spark):
        df = spark.createDataFrame([("t",)], ["text"])
        with pytest.raises(ValueError):
            C.train_quality_classifier(df, df, n_features=0)


class TestSessionState:
    def test_scoring_survives_session_observations(self, spark, model):
        """Regression: df.observe() puts an ObservationManager into
        session state; a model still carrying its training summary
        then fails task serialization at score-time.  The trainer
        clears the summary, so scoring must work after observes."""
        from pyspark.sql import Observation

        obs = Observation()
        spark.range(5).observe(obs, F.count(F.lit(1)).alias("n")).collect()
        docs = spark.createDataFrame(
            [(1, PROSE[0]), (2, JUNK[0])], ["doc_id", "text"]
        )
        rows = model.score(docs, "doc_id").collect()
        assert len(rows) == 2


class TestNullSafety:
    def test_null_text_scores_without_crashing(self, spark, model):
        docs = spark.createDataFrame(
            [(1, PROSE[0]), (2, None)], ["doc_id", "text"]
        )
        rows = model.score(docs, "doc_id").collect()
        assert len(rows) == 2

    def test_filter_is_single_scan_no_join(self, spark, model):
        import contextlib
        import io

        docs = spark.createDataFrame(
            [(1, "some text")], ["doc_id", "text"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            C.classifier_filter(
                docs, "doc_id", "text", model, soft=True
            ).explain(mode="formatted")
        plan = buf.getvalue()
        assert "Join" not in plan
        assert "Exchange" not in plan
