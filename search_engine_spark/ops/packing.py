"""Sequence packing for training-data pipelines — concat-and-chunk.

LLM training consumes fixed-length sequences; the standard pipeline
concatenates documents in a deterministic order and chunks the token
stream every `budget` tokens (GPT-style packing).  At 100 TB the
concat order cannot be a global sort — this op pins the distributed
version:

  shard   = md5(id|salt) % n_shards      (row-local, deterministic)
  order   = (hash, id) within the shard  (no global coordination)
  offset  = running token sum within the shard BEFORE this doc
  pack    = (shard, floor(offset / budget))

A document belongs to the pack where it STARTS in the concatenated
stream (the downstream tokenizer splits its tokens across the pack
boundary; a row-level engine assigns the start pack and the offset so
that split is computable).  Everything is native window arithmetic —
ONE shuffle (the per-shard repartition the window needs), no Python,
no driver state; shard count scales with the cluster and each shard's
packing is independent of every other's, so adding executors never
changes the assignment (determinism across cluster sizes — the same
property the sampling ops pin).

The same arithmetic runs verbatim in DuckDB (contract oracle) and
Python (tests).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, md5int_sql


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each row a training pack: adds `pack_shard`, `pack_seq`
    (chunk ordinal within the shard), and `pack_offset` (the doc's
    token offset INSIDE its pack, in [0, budget)).  Rows with
    non-positive token counts are dropped (they occupy no stream
    positions)."""
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if n_shards <= 0:
        raise ValueError("n_shards must be > 0")
    h = md5int_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))
    )
    base = (
        df.filter(F.col(token_col) > 0)
        .withColumn("_ph", h)
        .withColumn(
            "pack_shard", (F.col("_ph") % n_shards).cast("long")
        )
    )
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(F.col("_ph"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offset = (
        F.sum(F.col(token_col)).over(w) - F.col(token_col)
    ).alias("_off")
    return (
        base.withColumn("_off", offset)
        .withColumn(
            "pack_seq", F.floor(F.col("_off") / budget).cast("long")
        )
        .withColumn(
            "pack_offset",
            (F.col("_off") - F.col("pack_seq") * budget).cast("long"),
        )
        .drop("_ph", "_off")
    )


def pack_sql(
    id_expr: str,
    token_expr: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> Tuple[str, str, str]:
    """DuckDB building blocks for contract oracles: returns
    (shard_sql, stream_offset_sql, budget_literal) — the SHARD
    expression, the RAW running token offset (the window cumsum before
    this row's tokens), and the budget as a string.  Callers derive
    pack_seq = floor(offset / budget) and pack_offset = offset -
    pack_seq * budget themselves (see __spark_entry__._sql_pack_assign)
    — the offset is a window expression, so inlining it once into a CTE
    and deriving both columns from the alias is the cheaper SQL."""
    h = md5int_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}'")
    shard = f"({h}) % {n_shards}"
    off = (
        f"sum({token_expr}) OVER (PARTITION BY {shard} "
        f"ORDER BY ({h}), {id_expr} "
        f"ROWS UNBOUNDED PRECEDING) - {token_expr}"
    )
    return shard, off, str(budget)


def pack_stats(packed: DataFrame, token_col: str, budget: int) -> dict:
    """Packing-quality report: pack count, mean fill ratio, and the
    fraction of docs that straddle a pack boundary (their tokens spill
    into the next pack) — ONE shard-level aggregate.

    `packs` counts the budget-sized chunks each shard's token stream
    OCCUPIES — ceil(shard_tokens / budget) summed over shards — not
    the packs where some document starts: a single 10×budget document
    occupies 10 packs, so counting distinct start-packs would report 1
    pack at 1000% fill.  mean_fill is therefore ≤ 1, and measures how
    completely the final chunk of each shard is used."""
    rows = (
        packed.groupBy("pack_shard")
        .agg(
            F.sum(token_col).alias("t"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col("pack_offset") + F.col(token_col) > budget
                ).cast("long")
            ).alias("strad"),
        )
        .collect()
    )
    tokens = sum(int(r["t"]) for r in rows)
    n_docs = sum(int(r["n"]) for r in rows)
    packs = sum(-(-int(r["t"]) // budget) for r in rows)  # ceil div
    straddle = sum(int(r["strad"]) for r in rows)
    return {
        "packs": packs,
        "tokens": tokens,
        "mean_fill": tokens / (packs * budget) if packs else 0.0,
        "straddle_frac": straddle / n_docs if n_docs else 0.0,
    }
