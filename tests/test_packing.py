"""Sequence packing (ops/packing.py) vs exact Python recomputation.

The assignment must be identical across runs AND across input
partitionings (the cluster-size-independence property), offsets must
stay inside the budget, and the stats report must match recomputation.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import packing as P

N = 3000
BUDGET = 512
SHARDS = 16


def _py_hash(i, salt="pack"):
    return int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:15], 16)


def _py_pack(rows):
    """rows: [(id, tokens)] -> {id: (shard, seq, offset)}"""
    by_shard = {}
    for i, t in rows:
        if t <= 0:
            continue
        by_shard.setdefault(_py_hash(i) % SHARDS, []).append(i)
    out = {}
    tok = dict(rows)
    for shard, ids in by_shard.items():
        ids.sort(key=lambda i: (_py_hash(i), i))
        run = 0
        for i in ids:
            seq, off = divmod(run, BUDGET)
            out[i] = (shard, seq, off)
            run += tok[i]
    return out


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 97 + 3).alias("tokens"),
    ).cache()


class TestPackSequences:
    def test_matches_python_exactly(self, spark, table):
        got = {
            r["id"]: (r["pack_shard"], r["pack_seq"], r["pack_offset"])
            for r in P.pack_sequences(
                table, "id", "tokens", BUDGET, n_shards=SHARDS
            ).collect()
        }
        rows = [(r["id"], r["tokens"]) for r in table.collect()]
        assert got == _py_pack(rows)

    def test_partitioning_invariant(self, spark, table):
        a = {
            (r["id"], r["pack_shard"], r["pack_seq"])
            for r in P.pack_sequences(
                table, "id", "tokens", BUDGET, n_shards=SHARDS
            ).collect()
        }
        b = {
            (r["id"], r["pack_shard"], r["pack_seq"])
            for r in P.pack_sequences(
                table.repartition(13), "id", "tokens", BUDGET,
                n_shards=SHARDS,
            ).collect()
        }
        assert a == b

    def test_offsets_inside_budget_and_seqs_dense(self, spark, table):
        packed = P.pack_sequences(
            table, "id", "tokens", BUDGET, n_shards=SHARDS
        )
        rows = packed.collect()
        assert all(0 <= r["pack_offset"] < BUDGET for r in rows)
        # within a shard, seqs start at 0 and are contiguous
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["pack_shard"], set()).add(r["pack_seq"])
        for shard, seqs in by_shard.items():
            assert seqs == set(range(max(seqs) + 1)), shard

    def test_stats_and_validation(self, spark, table):
        packed = P.pack_sequences(
            table, "id", "tokens", BUDGET, n_shards=SHARDS
        )
        st = P.pack_stats(packed, "tokens", BUDGET)
        rows = [(r["id"], r["tokens"]) for r in table.collect()]
        want = _py_pack(rows)
        # packs = chunks OCCUPIED per shard (ceil of shard token mass)
        shard_tok = {}
        tok = dict(rows)
        for i, (s, _, _) in want.items():
            shard_tok[s] = shard_tok.get(s, 0) + tok[i]
        assert st["packs"] == sum(
            -(-t // BUDGET) for t in shard_tok.values()
        )
        assert st["tokens"] == sum(t for _, t in rows)
        assert 0.5 < st["mean_fill"] <= 1.0 + 100 / BUDGET
        tok = dict(rows)
        straddle = sum(
            1 for i, (s, q, off) in want.items()
            if off + tok[i] > BUDGET
        )
        assert st["straddle_frac"] == pytest.approx(
            straddle / len(want), abs=1e-12
        )
        with pytest.raises(ValueError):
            P.pack_sequences(table, "id", "tokens", 0)
        with pytest.raises(ValueError):
            P.pack_sequences(table, "id", "tokens", 10, n_shards=0)

    def test_zero_token_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (2, 5), (3, -2)], "id long, tokens long"
        )
        rows = P.pack_sequences(df, "id", "tokens", 16, n_shards=2).collect()
        assert [r["id"] for r in rows] == [2]


class TestLongDocs:
    def test_stats_count_occupied_packs_not_start_packs(self, spark):
        # ONE 1000-token doc at budget 100 occupies 10 packs; counting
        # start-packs would report 1 pack at 1000% fill
        df = spark.createDataFrame([(1, 1000)], "id long, tokens long")
        packed = P.pack_sequences(df, "id", "tokens", 100, n_shards=1)
        st = P.pack_stats(packed, "tokens", 100)
        assert st["packs"] == 10
        assert st["mean_fill"] == pytest.approx(1.0)
        assert st["straddle_frac"] == 1.0
