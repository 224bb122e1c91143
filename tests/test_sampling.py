"""Deterministic sampling ops (ops/sampling.py): reproducibility,
fraction accuracy, engine-portability of the hash (Spark == Python),
sampleBy-contract for missing strata, split disjointness/totality."""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import sampling as S

N = 4000


def _py_bucket(i, salt):
    h = hashlib.md5(f"{i}|{salt}".encode()).hexdigest()
    return int(h[:15], 16) % S.BUCKETS


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
    ).cache()


class TestSample:
    def test_deterministic_and_matches_python(self, spark, table):
        got = {r["id"] for r in S.sample(table, "id", 0.25).collect()}
        again = {r["id"] for r in S.sample(table, "id", 0.25).collect()}
        assert got == again
        exp = {i for i in range(N) if _py_bucket(i, "s0") < 250_000}
        assert got == exp

    def test_fraction_accuracy_and_nesting(self, spark, table):
        n10 = S.sample(table, "id", 0.10).count()
        n50 = S.sample(table, "id", 0.50).count()
        assert abs(n10 / N - 0.10) < 0.02
        assert abs(n50 / N - 0.50) < 0.02
        # same salt => smaller fraction is a SUBSET of the larger
        s10 = {r["id"] for r in S.sample(table, "id", 0.10).collect()}
        s50 = {r["id"] for r in S.sample(table, "id", 0.50).collect()}
        assert s10 <= s50

    def test_salt_decorrelates(self, spark, table):
        a = {r["id"] for r in S.sample(table, "id", 0.2, salt="a").collect()}
        b = {r["id"] for r in S.sample(table, "id", 0.2, salt="b").collect()}
        overlap = len(a & b) / max(1, len(a))
        assert 0.05 < overlap < 0.40  # ~0.2 expected, not ~1.0

    def test_edges_and_validation(self, spark, table):
        assert S.sample(table, "id", 0.0).count() == 0
        assert S.sample(table, "id", 1.0).count() == N
        with pytest.raises(ValueError):
            S.sample(table, "id", 1.5)


class TestStratified:
    def test_per_stratum_fractions(self, spark, table):
        out = S.stratified_sample(
            table, "id", "grp", {"0": 0.5, "1": 0.1}
        )
        rows = out.collect()
        by = {}
        for r in rows:
            by.setdefault(r["grp"], set()).add(r["id"])
        assert "2" not in by  # missing stratum drops (sampleBy contract)
        n0 = N // 3 + (1 if N % 3 > 0 else 0)
        assert abs(len(by["0"]) / (N / 3) - 0.5) < 0.06
        assert abs(len(by["1"]) / (N / 3) - 0.1) < 0.05
        # per-row fate == plain sample at that stratum's fraction
        s50 = {
            r["id"]
            for r in S.sample(table.filter(F.col("grp") == "0"), "id", 0.5)
            .collect()
        }
        assert by["0"] == s50


class TestSplit:
    def test_disjoint_exhaustive_and_deterministic(self, spark, table):
        out = S.split(table, "id", [("train", 8), ("val", 1), ("test", 1)])
        rows = out.collect()
        assert len(rows) == N  # total
        by = {}
        for r in rows:
            by.setdefault(r["_split"], set()).add(r["id"])
        assert set(by) == {"train", "val", "test"}
        assert sum(len(v) for v in by.values()) == N  # disjoint
        assert abs(len(by["train"]) / N - 0.8) < 0.03
        assert abs(len(by["val"]) / N - 0.1) < 0.02
        # stable across invocations
        again = S.split(table, "id", [("train", 8), ("val", 1), ("test", 1)])
        m = {r["id"]: r["_split"] for r in again.collect()}
        for name, ids in by.items():
            assert all(m[i] == name for i in ids)

    def test_validation(self, spark, table):
        with pytest.raises(ValueError):
            S.split(table, "id", [("a", 1), ("a", 1)])
        with pytest.raises(ValueError):
            S.split(table, "id", [("a", -1), ("b", 2)])


class TestMixCorpus:
    """Weighted corpus mixing: plan math, deterministic sampling,
    epochs on upsample, token-mass accuracy in expectation."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # three sources with very different token mass
        return spark.range(3000).select(
            F.col("id"),
            F.when(F.col("id") % 10 < 6, "web")
            .when(F.col("id") % 10 < 9, "books")
            .otherwise("code")
            .alias("source"),
            (F.col("id") % 100 + 50).alias("tokens"),
        ).cache()

    def test_plan_math(self, spark):
        plan = S.mix_plan(
            {"web": 1000, "books": 500}, {"web": 1, "books": 1}, 800
        )
        assert plan == {"web": (0, 0.4), "books": (0, 0.8)}
        # capped without upsample
        plan = S.mix_plan({"web": 100}, {"web": 1.0}, 500)
        assert plan == {"web": (1, 0.0)}
        plan = S.mix_plan(
            {"web": 100}, {"web": 1.0}, 500, allow_upsample=True
        )
        assert plan == {"web": (5, 0.0)}
        plan = S.mix_plan(
            {"web": 200, "ghost": 0}, {"web": 1, "ghost": 1}, 100
        )
        assert plan["ghost"] == (0, 0.0)
        assert plan["web"] == (0, 0.25)
        with pytest.raises(ValueError):
            S.mix_plan({"a": 1}, {}, 100)
        with pytest.raises(ValueError):
            S.mix_plan({"a": 1}, {"a": 1.0}, 0)

    def test_mix_deterministic_and_token_accurate(self, spark, corpus):
        avail = {
            r["source"]: r["a"]
            for r in corpus.groupBy("source")
            .agg(F.sum("tokens").alias("a"))
            .collect()
        }
        total = int(sum(avail.values()) * 0.5)
        weights = {"web": 0.5, "books": 0.3, "code": 0.2}
        out, plan = S.mix_corpus(
            corpus, "id", "source", "tokens", weights, total
        )
        rows = out.collect()
        again, _ = S.mix_corpus(
            corpus, "id", "source", "tokens", weights, total
        )
        assert {(r["id"], r["_epoch"]) for r in rows} == {
            (r["id"], r["_epoch"]) for r in again.collect()
        }
        got_tokens = {}
        for r in rows:
            got_tokens[r["source"]] = (
                got_tokens.get(r["source"], 0) + r["tokens"]
            )
        for s, w in weights.items():
            target = w * total
            full, frac = plan[s]
            expected = (full + frac) * avail[s]
            assert abs(expected - min(target, (full + frac) * avail[s])) < 1e-6
            # sampled token mass ≈ expectation (row-level Bernoulli)
            assert abs(got_tokens[s] - expected) / max(expected, 1) < 0.15, s

    def test_upsample_epochs(self, spark, corpus):
        avail = {
            r["source"]: r["a"]
            for r in corpus.groupBy("source")
            .agg(F.sum("tokens").alias("a"))
            .collect()
        }
        # demand 2.5x the code source's mass, all weight on code
        total = int(avail["code"] * 2.5)
        out, plan = S.mix_corpus(
            corpus, "id", "source", "tokens", {"code": 1.0}, total,
            allow_upsample=True,
        )
        full, frac = plan["code"]
        assert full == 2 and 0.4 < frac < 0.6
        rows = out.collect()
        assert {r["source"] for r in rows} == {"code"}
        by_epoch = {}
        for r in rows:
            by_epoch.setdefault(r["_epoch"], set()).add(r["id"])
        code_ids = {
            r["id"] for r in corpus.filter(F.col("source") == "code").collect()
        }
        assert by_epoch[0] == code_ids and by_epoch[1] == code_ids
        assert 0 < len(by_epoch[2]) < len(code_ids)

    def test_empty_weights_for_missing_source_only(self, spark, corpus):
        out, plan = S.mix_corpus(
            corpus, "id", "source", "tokens", {"ghost": 1.0}, 1000
        )
        assert plan == {"ghost": (0, 0.0)}
        assert out.count() == 0
