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
