"""Curation ops (ops/curation.py): deterministic shuffle order,
quality-weighted sampling, token-budget selection — reproducibility,
Python-hash parity, budget accuracy, and the threshold-walk contract."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import curation as C
from search_engine_spark.ops.sampling import BUCKETS

N = 3000


def _h(i, salt):
    return int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def table(spark):
    # quality spread over [0, 1), token mass varying with id
    return spark.range(N).select(
        F.col("id"),
        ((F.col("id") % 100) / 100.0).alias("qual"),
        (F.col("id") % 50 + 1).alias("tok"),
    ).cache()


class TestShuffle:
    def test_matches_python_and_deterministic(self, spark, table):
        rows = C.shuffle_rows(table, "id", n_shards=8).collect()
        again = C.shuffle_rows(table, "id", n_shards=8).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
        # python replay: shard + rank within shard by (hash, id)
        by_shard = {}
        for i in range(N):
            by_shard.setdefault(_h(i, "shuffle") % 8, []).append(i)
        exp = {}
        for s, ids in by_shard.items():
            ids.sort(key=lambda i: (_h(i, "shuffle"), i))
            for pos, i in enumerate(ids):
                exp[i] = (s, pos)
        got = {r["id"]: (r["shuffle_shard"], r["shuffle_pos"]) for r in rows}
        assert got == exp

    def test_positions_are_dense_per_shard(self, spark, table):
        rows = C.shuffle_rows(table, "id", n_shards=4).collect()
        per = {}
        for r in rows:
            per.setdefault(r["shuffle_shard"], []).append(r["shuffle_pos"])
        for s, ps in per.items():
            assert sorted(ps) == list(range(len(ps)))

    def test_cluster_size_independent(self, spark, table):
        a = {
            r["id"]: (r["shuffle_shard"], r["shuffle_pos"])
            for r in C.shuffle_rows(
                table.repartition(2), "id", n_shards=8
            ).collect()
        }
        b = {
            r["id"]: (r["shuffle_shard"], r["shuffle_pos"])
            for r in C.shuffle_rows(
                table.repartition(13), "id", n_shards=8
            ).collect()
        }
        assert a == b

    def test_validation(self, spark, table):
        with pytest.raises(ValueError):
            C.shuffle_rows(table, "id", n_shards=0)


class TestQualitySample:
    def test_matches_python(self, spark, table):
        got = {
            r["id"]
            for r in C.quality_sample(table, "id", "qual").collect()
        }
        exp = {
            i
            for i in range(N)
            if (_h(i, "qsample") % BUCKETS)
            < math.floor((i % 100) / 100.0 * BUCKETS)
        }
        assert got == exp

    def test_acceptance_tracks_quality(self, spark, table):
        kept = C.quality_sample(table, "id", "qual")
        lo = kept.filter(F.col("qual") < 0.2).count()
        hi = kept.filter(F.col("qual") >= 0.8).count()
        # ~0.1 acceptance below 0.2 vs ~0.9 above 0.8
        assert hi > lo * 3

    def test_scale_clamps(self, spark, table):
        all_in = C.quality_sample(table, "id", "qual", scale=1e9)
        # every quality > 0 row passes at huge scale
        assert all_in.count() == table.filter(F.col("qual") > 0).count()
        none = C.quality_sample(table, "id", "qual", scale=0.0)
        assert none.count() == 0
        with pytest.raises(ValueError):
            C.quality_sample(table, "id", "qual", scale=-1)

    def test_null_quality_drops(self, spark):
        df = spark.range(10).select(
            F.col("id"),
            F.when(F.col("id") < 5, F.lit(None).cast("double"))
            .otherwise(F.lit(1.0))
            .alias("qual"),
        )
        got = {r["id"] for r in C.quality_sample(df, "id", "qual").collect()}
        assert got == set(range(5, 10))


class TestTokenBudget:
    def _py_select(self, rows, budget, n_bins, salt="budget"):
        bins = {}
        binned = []
        for i, q, tok in rows:
            if q is None or tok <= 0:
                continue
            b = min(int(math.floor(max(min(q, 1.0), 0.0) * n_bins)), n_bins - 1)
            bins[b] = bins.get(b, 0) + tok
            binned.append((i, b, tok))
        t, frac = C.budget_threshold(bins, budget, n_bins)
        if t is None:
            return {i for i, _, _ in binned}
        cut = int(math.floor(frac * BUCKETS))
        return {
            i
            for i, b, _ in binned
            if b > t or (b == t and (_h(i, salt) % BUCKETS) < cut)
        }

    def test_matches_python_replay(self, spark, table):
        budget = 20_000
        got = {
            r["id"]
            for r in C.select_token_budget(
                table, "id", "qual", "tok", budget, n_bins=100
            ).collect()
        }
        rows = [(i, (i % 100) / 100.0, i % 50 + 1) for i in range(N)]
        assert got == self._py_select(rows, budget, 100)

    def test_budget_accuracy_and_quality_order(self, spark, table):
        total = table.agg(F.sum("tok")).collect()[0][0]
        budget = int(total * 0.3)
        sel = C.select_token_budget(
            table, "id", "qual", "tok", budget, n_bins=100
        ).cache()
        mass = sel.agg(F.sum("tok")).collect()[0][0]
        # within one bin's mass of the budget
        assert abs(mass - budget) < total / 100 + 1
        # kept docs are the high-quality end: min kept quality bin
        # >= max dropped quality bin - 1 (threshold bin splits)
        kept_min = sel.agg(F.min("qual")).collect()[0][0]
        dropped = table.join(sel.select("id"), "id", "left_anti")
        dropped_max = dropped.agg(F.max("qual")).collect()[0][0]
        assert kept_min >= dropped_max - 0.011

    def test_budget_bigger_than_corpus_keeps_all(self, spark, table):
        sel = C.select_token_budget(
            table, "id", "qual", "tok", 10**12, n_bins=100
        )
        assert sel.count() == N

    def test_validation(self, spark, table):
        with pytest.raises(ValueError):
            C.select_token_budget(table, "id", "qual", "tok", 0)
        with pytest.raises(ValueError):
            C.select_token_budget(table, "id", "qual", "tok", 10, n_bins=0)

    def test_threshold_walk_contract(self):
        # whole corpus fits
        assert C.budget_threshold({5: 10}, 100, 10) == (None, 0.0)
        # exact fit at a bin boundary -> next bin down becomes a
        # zero-fraction threshold (keeps nothing extra)
        t, f = C.budget_threshold({9: 50, 8: 50, 7: 50}, 100, 10)
        assert t == 7 and f == 0.0
        # partial threshold bin
        t, f = C.budget_threshold({9: 50, 8: 100}, 100, 10)
        assert t == 8 and abs(f - 0.5) < 1e-12
        # empty bins are skipped
        t, f = C.budget_threshold({9: 30, 2: 40}, 50, 10)
        assert t == 2 and abs(f - 0.5) < 1e-12


class TestCapPerKey:
    def test_matches_python_and_cap_holds(self, spark, table):
        df = table.withColumn("dom", (F.col("id") % 7).cast("string"))
        capped = C.cap_per_key(df, "id", "dom", 50)
        rows = capped.collect()
        per = {}
        for r in rows:
            per.setdefault(r["dom"], []).append(r["id"])
        assert all(len(v) <= 50 for v in per.values())
        # python replay: per key, 50 lowest (hash, id)
        exp = {}
        for i in range(N):
            exp.setdefault(str(i % 7), []).append(i)
        for k, ids in exp.items():
            ids.sort(key=lambda i: (_h(i, "cap"), i))
            exp[k] = set(ids[:50])
        got = {k: set(v) for k, v in per.items()}
        assert got == exp

    def test_small_keys_kept_whole(self, spark):
        df = spark.range(10).select(
            F.col("id"), F.lit("only").alias("dom")
        )
        assert C.cap_per_key(df, "id", "dom", 100).count() == 10

    def test_deterministic_across_partitioning(self, spark, table):
        df = table.withColumn("dom", (F.col("id") % 5).cast("string"))
        a = {r["id"] for r in C.cap_per_key(df.repartition(3), "id", "dom", 40).collect()}
        b = {r["id"] for r in C.cap_per_key(df.repartition(17), "id", "dom", 40).collect()}
        assert a == b

    def test_validation(self, spark, table):
        with pytest.raises(ValueError):
            C.cap_per_key(table.withColumn("dom", F.lit("x")), "id", "dom", 0)
