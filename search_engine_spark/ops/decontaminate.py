"""Benchmark decontamination for training-data pipelines.

Before pretraining, every serious pipeline checks the corpus against
evaluation benchmarks and drops (or flags) documents that leak test
data — the n-gram overlap procedure described in public model reports
(GPT-3 appendix C, PaLM §7, Llama 2 §A.6): a document is contaminated
when any length-n token window also appears in a benchmark text.

Spark shape, sized for 100 TB corpora vs ~MB-scale benchmarks:

  docs  → canonical tokens → DISTINCT n-gram shingles → explode
  bench → same → global DISTINCT  (benchmark side is tiny)
  inner join on gram — bench side BROADCAST by default, so the
  doc-gram stream never shuffles; per-doc counts come from ONE
  partial-aggregated groupBy(doc_id).  With broadcast_bench=False the
  join degrades to sort-merge for pathological benchmark sizes.

Everything is native column work (the tokenizer and shingler are the
md5/regex column expressions shared with ops/dedup — no Python in the
row path), and the DuckDB twin reproduces counts exactly via
ops/common.tokens_sql + shingles_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import shingles_col
from search_engine_spark.text.tokenizer import raw_tokens_col


def _distinct_grams(
    df: DataFrame, text_col: str, n: int, id_col: str = None
) -> DataFrame:
    cols = ([F.col(id_col).alias("id")] if id_col else []) + [
        raw_tokens_col(F.col(text_col)).alias("_toks")
    ]
    # separate projection so the shingle HOF doesn't re-evaluate the
    # tokenizer regex per element (same rationale as ops/dedup)
    toks = df.select(*cols)
    out = toks.select(
        *([F.col("id")] if id_col else []),
        F.explode(
            F.array_distinct(shingles_col(F.col("_toks"), n))
        ).alias("gram"),
    )
    return out


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document benchmark n-gram overlap.

    Returns one row per input doc (zero-filled — docs shorter than n
    tokens have n_grams 0 and are never contaminated):
      (id, n_grams, n_matched, contaminated)
    n_grams    — distinct n-gram shingles in the doc
    n_matched  — of those, how many appear in ANY benchmark text
    contaminated — n_matched > 0 (the published rule: one leaked
                   window flags the doc; callers wanting a fraction
                   threshold can filter on n_matched / n_grams)
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    doc_grams = _distinct_grams(docs, text_col, n, id_col)
    bench_grams = (
        _distinct_grams(bench, bench_text_col, n)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    # ONE scan of the corpus gram stream: the left join marks benchmark
    # grams in place, so gram count AND match count fall out of the
    # same partial-aggregated groupBy — tokenize+shingle (the dominant
    # cost at scale) runs once, not once per aggregate
    per_doc = (
        doc_grams.join(bench_grams, "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_matched"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_overlap_fraction: float = 0.0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop contaminated docs: keep rows whose matched-gram fraction is
    <= max_overlap_fraction (default 0.0 = any overlap drops, the
    strict published rule).  Pure filter composition — the flag join is
    an id-keyed hash join back onto the input, all columns kept."""
    flags = ngram_contamination(
        docs, bench, id_col, text_col, bench_text_col, n,
        broadcast_bench=broadcast_bench,
    )
    bad = flags.filter(
        (F.col("n_grams") > 0)
        & (
            F.col("n_matched").cast("double")
            / F.col("n_grams").cast("double")
            > F.lit(float(max_overlap_fraction))
        )
    ).select(F.col("id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")
