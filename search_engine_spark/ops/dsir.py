"""DSIR-style data selection via hashed n-gram importance weights.

Public method: "Data Selection for Language Models via Importance
Resampling" (Xie et al. 2023, arXiv:2302.03169).  A target corpus
(e.g. Wikipedia-quality text) and a raw pool are both reduced to
bag-of-hashed-ngram (unigram+bigram) counts over a FIXED number of
hash buckets; every raw document scores the log importance weight

    log w(x) = Σ_{gram g ∈ x} [ log p_target(b(g)) − log p_raw(b(g)) ]

with add-one-smoothed bucket probabilities, and the selected subset is
the top-k by weight (the paper's Gumbel-resampling variant adds hash-
seeded Gumbel noise; the deterministic top-k variant is what ships as
the oracle-checked contract entry — see `noise`).

Spark shape, sized for the paper's own design point (B fixed at ~10k
regardless of corpus size):
- ONE explode produces gram occurrences (≈ 2× token count), persisted
  MEMORY_AND_DISK across its consumers (bucket counting, the totals
  collect, the scoring join) so the corpus-sized explode executes once
  per call, and released before the weights frame is returned;
- bucket counting is a map-side-combinable groupBy over B keys —
  the aggregate output is B-sized no matter how big the corpus, and
  is collected driver-side so the ratio table becomes a LITERAL
  frame (one gram branch in the final plan, not two);
- the (bucket → log-ratio) table is broadcast (B rows) and each raw
  gram occurrence picks up its ratio with NO shuffle;
- per-doc weight is one groupBy(id) sum — the only corpus-sized
  shuffle;
- selection is a global top-k (TakeOrderedAndProject).
Hashing is md5-based (ops.common.md5int_col), NOT Spark's hash(), so
DuckDB/Python replicas produce identical buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, md5int_sql

DEFAULT_BUCKETS = 256


def _bigrams(tokens: Column) -> Column:
    """Space-joined bigrams of the `__toks` array column (the caller
    aliases its token column to `__toks` first — the SQL lambda needs a
    stable name).  Empty array for 0/1-token docs."""
    del tokens  # documents the binding; the expr reads __toks directly
    return F.when(
        F.size(F.col("__toks")) >= 2,
        F.expr(
            "transform(slice(__toks, 1, size(__toks) - 1), "
            "(x, i) -> concat(x, ' ', element_at(__toks, i + 2)))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def dsir_log_weights(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    is_target: Column,
    n_buckets: int = DEFAULT_BUCKETS,
    keep_cached: bool = False,
) -> DataFrame:
    """Per-RAW-document log importance weight (id, log_w round-6).

    `is_target` marks the reference-distribution rows; they shape the
    bucket probabilities but are not scored (a selection never returns
    them).  Weights are comparable only within one call (they depend
    on both corpora's totals).

    `keep_cached=False` (the default) returns an UNcached frame — the
    default path cannot leak a cache entry no matter what the caller
    does (ADVICE r4); the cost is that each downstream action re-runs
    the gram explode once.  Callers issuing SEVERAL actions over the
    weights pass `keep_cached=True` to get the frame back persisted
    and eagerly materialized (while the gram cache is still warm), and
    then OWN the matching `.unpersist()` — dsir_select is the model
    caller."""
    from pyspark import StorageLevel

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    B = int(n_buckets)
    toks = F.col("__toks")
    grams = (
        docs.select(
            F.col(id_col).alias("id"),
            is_target.alias("_tgt"),
            F.col(tokens_col).alias("__toks"),
        )
        .select(
            "id",
            "_tgt",
            F.explode(F.concat(toks, _bigrams(toks))).alias("gram"),
        )
        .select(
            "id", "_tgt", (md5int_col(F.col("gram")) % B).alias("_b")
        )
    )
    # The gram lineage feeds TWO computations (the bucket-count
    # collect and the scoring join).  Persist it across them —
    # MEMORY_AND_DISK, fault-tolerant: an executor loss recomputes from
    # lineage, unlike a localCheckpoint.  With keep_cached=True the
    # per-doc weights (id + double per raw doc, negligible next to the
    # corpus) are also persisted and materialized while the gram cache
    # is warm, then the gram blocks release; with the default the
    # weights frame stays lazy and uncached — leak-proof, one extra
    # gram pass at the caller's action.
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # ONE action over the cached grams: the per-bucket counts are
        # ≤ B rows (the paper fixes B regardless of corpus size), so
        # collect them and re-emit the ratio table as a LITERAL frame.
        # This leaves exactly one gram branch in the returned plan —
        # with a lineage-backed ratios frame, every caller action on
        # the (uncached-by-default) weights would re-run the explode
        # TWICE, once for the broadcast build and once for the scan
        # (round-5 review).  Totals are exact integer sums; the
        # log-ratio stays a JVM-side expression over exact int
        # literals, so weights are bit-identical to the lineage form.
        count_rows = grams.groupBy("_b").agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).alias("cr"),
        ).collect()
        nt = sum(int(r["ct"]) for r in count_rows)
        nr = sum(int(r["cr"]) for r in count_rows)
        spark = docs.sparkSession
        counts_lit = spark.createDataFrame(
            [(int(r["_b"]), int(r["ct"]), int(r["cr"]))
             for r in count_rows],
            "_b long, ct long, cr long",
        )
        ratios = counts_lit.select(
            "_b",
            (
                F.log((F.col("ct") + 1.0) / F.lit(float(nt + B)))
                - F.log((F.col("cr") + 1.0) / F.lit(float(nr + B)))
            ).alias("_r"),
        )
        w = (
            grams.filter(~F.col("_tgt"))
            .join(F.broadcast(ratios), "_b")
            .groupBy("id")
            .agg(F.round(F.sum("_r"), 6).alias("log_w"))
        )
        if keep_cached:
            w = w.persist(StorageLevel.MEMORY_AND_DISK)
            w.count()  # materialize before the gram cache is released
        return w
    finally:
        grams.unpersist()


def dsir_select(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    is_target: Column,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    noise: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight (id, log_w).

    noise=True adds the paper's Gumbel perturbation, made deterministic
    and engine-reproducible by seeding each document's uniform draw
    from md5(seed || id): g = -ln(-ln(u)), u ∈ (0, 1).

    The k-row selection is materialized eagerly and the intermediate
    weights cache released before returning — a dsir_select caller
    never holds (or leaks) the corpus-sized weights frame; use
    dsir_log_weights directly to keep the full weight table
    (keep_cached=True if you want it persisted — then .unpersist() it
    when done)."""
    w = dsir_log_weights(
        docs, id_col, tokens_col, is_target, n_buckets, keep_cached=True
    )
    sel = w
    if noise:
        u = (
            (md5int_col(F.concat(F.lit(f"{seed}|"), F.col("id").cast("string")))
             % 1_000_000).cast("double") + 0.5
        ) / 1_000_000.0
        sel = sel.withColumn(
            "log_w", F.round(F.col("log_w") - F.log(-F.log(u)), 6)
        )
    sel = sel.orderBy(F.desc("log_w"), F.asc("id")).limit(int(k))
    try:
        rows = sel.collect()  # k rows — bounded driver data
        return docs.sparkSession.createDataFrame(rows, sel.schema)
    finally:
        w.unpersist()


def dsir_ratio_sql(
    tok_rel: str,
    target_pred: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB CTE block reproducing the bucket log-ratio pipeline over a
    tokenized relation `tok_rel(doc_id, l)`; `target_pred` is a SQL
    predicate over doc_id marking the target rows.  Returns CTEs
    `g/gb/cnt/tot` and leaves `w(doc_id, log_w)` for the caller."""
    B = int(n_buckets)
    return f"""
g AS (SELECT doc_id, t AS gram FROM {tok_rel}, unnest(l) AS u(t)
      UNION ALL
      SELECT doc_id, l[i] || ' ' || l[i + 1]
      FROM {tok_rel}, unnest(range(1, len(l))) AS r(i)),
gb AS (SELECT doc_id, ({target_pred}) AS tgt,
              {md5int_sql('gram')} % {B} AS b FROM g),
cnt AS (SELECT b,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
        FROM gb GROUP BY b),
tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt),
w AS (SELECT doc_id,
             round(sum( ln((ct + 1.0) / (nt + {B}))
                      - ln((cr + 1.0) / (nr + {B})) ), 6) AS log_w
      FROM gb JOIN cnt USING (b), tot
      WHERE NOT tgt GROUP BY doc_id)"""
