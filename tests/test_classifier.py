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


class TestFrozen:
    """Frozen-model path: md5-bucket training, engine-exact scoring,
    DuckDB-twin parity, and the shipped quality_frozen literals."""

    @pytest.fixture(scope="class")
    def frozen(self, spark):
        pos = spark.createDataFrame([(t,) for t in PROSE * 8], ["text"])
        neg = spark.createDataFrame([(t,) for t in JUNK * 8], ["text"])
        return C.train_frozen_classifier(
            pos, neg, n_buckets=512, max_iter=30
        )

    def test_frozen_separates(self, spark, frozen):
        intercept, coef = frozen
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PROSE + JUNK)],
            ["doc_id", "text"],
        )
        s = {
            r["id"]: r["quality_prob"]
            for r in C.score_frozen(
                docs, "doc_id", intercept, coef
            ).collect()
        }
        for i in range(len(PROSE)):
            assert s[i] > 0.8, (i, s[i])
        for i in range(len(PROSE), len(PROSE) + len(JUNK)):
            assert s[i] < 0.2, (i, s[i])

    @staticmethod
    def _py_score(text, intercept, coef):
        """Independent pure-Python replica of the frozen scorer.
        ASCII-only lowering and ASCII \\s, mirroring the engine
        contract (JVM/RE2 \\s are ASCII classes; the lowering is an
        explicit A-Z translate — see classifier._words)."""
        import hashlib
        import math
        import re

        B = len(coef)
        lowered = (text or "").translate(
            str.maketrans(C._ASCII_UPPER, C._ASCII_LOWER)
        )
        words = [w for w in re.split(C._WS_CLASS, lowered) if w]
        grams = words + [
            f"{a} {b}" for a, b in zip(words, words[1:])
        ]
        t = 0
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B
            t += coef[b]
        logit = (intercept + t) / float(C.FROZEN_SCALE)
        return round(1.0 / (1.0 + math.exp(-logit)), 6)

    # Non-ASCII parity rows (ADVICE r4): Turkish İ and uppercase
    # Greek final sigma are where JVM toLowerCase and DuckDB's
    # utf8proc lower() DIVERGE ('i̇' vs 'i'; 'ς' vs 'σ') — the
    # explicit ASCII translate leaves them untouched in every engine.
    # NBSP / ideographic space pin that \s stays the ASCII class;
    # ß / ligatures pin that no full case folding sneaks in.
    NON_ASCII = [
        "İstanbul NAİVE recipes",
        "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ myth",
        "STRASSE straße GROSS",
        "ﬁsh ﬂow ligatures",
        "nbsp\u00a0joined and ideo\u3000joined words",
        "Ǆungla ǅungla titlecase",
        # vertical tab: inside Java's \s but OUTSIDE RE2's — the
        # explicit _WS_CLASS must split it identically in every engine
        "vtab\x0bsplit here",
        "all\x0b\x0c\r\n\tcontrols \x0b mixed",
    ]

    def test_frozen_matches_python_replica(self, spark, frozen):
        intercept, coef = frozen
        texts = PROSE + JUNK + ["", "single", "a  b   c"] + self.NON_ASCII
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = {
            r["id"]: r["quality_prob"]
            for r in C.score_frozen(
                docs, "doc_id", intercept, coef
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == self._py_score(t, intercept, coef), (i, t)

    def test_frozen_matches_duckdb_twin(self, spark, frozen):
        import duckdb
        import pandas as pd

        intercept, coef = frozen
        texts = (
            PROSE + JUNK
            + [None, "", "one two three two one"]
            + self.NON_ASCII
        )
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = sorted(
            (r["id"], r["quality_prob"])
            for r in C.score_frozen(
                docs, "doc_id", intercept, coef
            ).collect()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": range(len(texts)), "text": texts}
            ),
        )
        inner = C.frozen_score_sql(
            "documents", "doc_id", "text", intercept, coef
        )
        want = con.execute(
            f"SELECT id, quality_prob FROM ({inner}) ORDER BY id"
        ).fetchall()
        assert got == [(int(i), float(p)) for i, p in want]

    def test_frozen_plan_native_and_broadcast(self, spark, frozen):
        import contextlib
        import io

        intercept, coef = frozen
        docs = spark.createDataFrame(
            [(1, "some text here")], ["doc_id", "text"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            C.score_frozen(docs, "doc_id", intercept, coef).explain(
                mode="formatted"
            )
        plan = buf.getvalue()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        # the coefficient table joins broadcast, never shuffled
        assert "BroadcastHashJoin" in plan

    def test_shipped_frozen_model(self, spark):
        """The repo-shipped frozen literals (quality_frozen.py) load
        and separate prose from the zz-junk class they were trained
        against; unseen text rides the positive intercept."""
        from search_engine_spark.ops import quality_frozen as QF

        coef = QF.coef_scaled()
        assert len(coef) == QF.N_BUCKETS
        zz = " ".join(f"zz{(7 * i) % 997}" for i in range(12))
        docs = spark.createDataFrame(
            [(0, PROSE[0]), (1, zz)], ["doc_id", "text"]
        )
        s = {
            r["id"]: r["quality_prob"]
            for r in C.score_frozen(
                docs, "doc_id", QF.INTERCEPT_SCALED, coef
            ).collect()
        }
        # out-of-vocabulary prose picks up collision noise, so pin the
        # decisive signals: junk is rejected outright and ranks below
        assert s[1] < 0.1 and s[0] > s[1] * 10, s

    def test_frozen_validation(self, spark):
        df = spark.createDataFrame([("t",)], ["text"])
        with pytest.raises(ValueError):
            C.train_frozen_classifier(df, df, n_buckets=0)
        with pytest.raises(ValueError):
            C.score_frozen(df.withColumn("id", F.lit(1)), "id", 0, [])
