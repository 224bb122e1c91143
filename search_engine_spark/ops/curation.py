"""Corpus-curation ops for training-data pipelines: deterministic
training order, quality-weighted sampling, and token-budget selection.

These are the three selection/ordering steps a 100-TB curation run
performs after scoring (ops/textstats.py) and dedup (ops/dedup.py):

- `shuffle_rows` — the global "shuffle the training data" step.  At
  scale a true global random permutation is a total-order sort of the
  whole corpus; the standard distributed relaxation (and what this op
  pins) is hash-sharding: shard = md5(id|salt) % n_shards, then an
  independent deterministic order WITHIN each shard.  Readers stream
  shards in any order; the composition is statistically
  indistinguishable from a global shuffle for training purposes while
  costing ONE partition-local window (no global sort, no driver
  state), and the assignment is identical on any cluster size.

- `quality_sample` — soft quality filtering (the FineWeb/DCLM shape):
  each row survives with probability proportional to its quality
  score, deterministically — keep iff md5-bucket(id) < quality ×
  BUCKETS.  A hard threshold throws away every "pretty good" doc; the
  soft version keeps quality mass proportional.  Pure row-local
  WHERE clause: stays inside the scan's WholeStageCodegen, composes
  with partition pruning, zero shuffle.

- `select_token_budget` — "take the best docs up to a token budget"
  (curriculum / budgeted-corpus construction).  The naive plan is a
  global sort by quality + running cumsum — a total-order window that
  single-threads at 100 TB.  This op pins the scale-honest two-pass
  version: (1) ONE tiny histogram aggregate (quality binned to
  `n_bins` buckets, token mass per bucket — n_bins rows to the
  driver, corpus-size-independent), (2) the driver walks bins from
  best to worst to find the threshold bin and the fractional keep
  rate inside it, (3) ONE row-local filter: keep bins above the
  threshold entirely, hash-sample the threshold bin at the remainder
  fraction.  Selected token mass lands within one bin's width of the
  budget (exact in expectation inside the threshold bin — the same
  pinned trade-off as ops/sampling.mix_corpus); resolution is
  1/n_bins of the quality range, and no stage ever materializes a
  global order.

Every op hashes a stable id (md5 → 60-bit int, identical in Spark /
DuckDB / Python — ops/common.py) so the driver's Spark-vs-DuckDB gate
runs the IDENTICAL selection, and reruns/engines agree row-for-row.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, md5int_sql
from search_engine_spark.ops.sampling import BUCKETS, _bucket_col, bucket_sql


def shuffle_rows(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic distributed training-order shuffle: adds
    `shuffle_shard` (md5(id|salt) % n_shards) and `shuffle_pos` (the
    row's 0-based position within its shard, ordered by (hash, id) —
    the id tiebreak makes the order total even on hash collisions).

    ONE shuffle (the window's partition-by), shard-local window, no
    global sort.  Shard count scales with the cluster; the
    (shard, pos) assignment is a pure function of the row id, so the
    same corpus shuffles identically on 8 cores or 800 executors."""
    if n_shards <= 0:
        raise ValueError("n_shards must be > 0")
    h = md5int_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))
    )
    # collision-proof temp name: callers may legitimately carry their
    # own _-prefixed window columns
    out = df.withColumn("_sgs_sh", h).withColumn(
        "shuffle_shard", (F.col("_sgs_sh") % n_shards).cast("int")
    )
    w = Window.partitionBy("shuffle_shard").orderBy(
        F.col("_sgs_sh"), F.col(id_col)
    )
    return (
        out.withColumn(
            "shuffle_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("_sgs_sh")
    )


def shuffle_sql(
    id_expr: str, n_shards: int, salt: str = "shuffle"
) -> Tuple[str, str]:
    """DuckDB twins: (shard expression, hash expression for the
    within-shard ORDER BY)."""
    h = md5int_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}'")
    return f"CAST({h} % {n_shards} AS INTEGER)", h


def quality_sample(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    scale: float = 1.0,
    salt: str = "qsample",
) -> DataFrame:
    """Keep each row with probability clamp(quality × scale, 0, 1),
    deterministically by id hash (soft quality filter).  `scale`
    sharpens (<1) or flattens (>1) the acceptance curve.  Quality
    NULLs drop (no score — no pass), matching the oracle's WHERE."""
    if scale < 0:
        raise ValueError("scale must be >= 0")
    p = F.least(
        F.greatest(F.col(quality_col) * F.lit(float(scale)), F.lit(0.0)),
        F.lit(1.0),
    )
    b = _bucket_col(F.col(id_col), salt)
    return df.filter(b < F.floor(p * BUCKETS).cast("long"))


def quality_sample_sql(
    id_expr: str, quality_expr: str, scale: float, salt: str = "qsample"
) -> str:
    """DuckDB twin of the keep predicate."""
    b = bucket_sql(id_expr, salt)
    p = f"least(greatest(({quality_expr}) * {float(scale)!r}, 0.0), 1.0)"
    return f"({b} < CAST(floor({p} * {BUCKETS}) AS BIGINT))"


def cap_per_key(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_per_key: int,
    salt: str = "cap",
) -> DataFrame:
    """Cap rows per key — the "at most N pages per domain" curation
    step.  WHICH rows survive is deterministic: each key keeps its
    max_per_key lowest-(md5(id|salt), id) rows, so the kept subset is
    an unbiased hash-sample of the key's rows, identical across
    engines and reruns (a popularity- or recency-biased cap would just
    change the window's ORDER BY).

    ONE shuffle (the window's partition-by on the key).  Hot keys are
    the point of the op — a domain with 10^8 pages sorts only ITS rows
    within its partitions; the cap bounds the OUTPUT, and the window's
    rank never needs more than a streaming pass per key."""
    if max_per_key <= 0:
        raise ValueError("max_per_key must be > 0")
    h = md5int_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))
    )
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_sgs_rn", F.row_number().over(w))
        .filter(F.col("_sgs_rn") <= int(max_per_key))
        .drop("_sgs_rn")
    )


def cap_per_key_sql(
    id_expr: str,
    key_expr: str,
    max_per_key: int,
    salt: str = "cap",
    source: str = "documents",
) -> str:
    """DuckDB twin: the same hash-ordered row_number cap (the hash is
    projected once in the inner query, not recomputed per reference)."""
    h = md5int_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}'")
    return f"""
SELECT * EXCLUDE (_rn, _h) FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_expr}
                               ORDER BY _h, {id_expr}) AS _rn
  FROM (SELECT *, {h} AS _h FROM {source}))
WHERE _rn <= {int(max_per_key)}"""


def budget_threshold(
    bin_mass: Dict[int, int], budget: int, n_bins: int
) -> Tuple[Optional[int], float]:
    """Driver-side threshold walk (exposed for tests/oracles): given
    per-bin token mass, return (threshold_bin, keep_fraction) — bins
    above the threshold keep everything, the threshold bin keeps a
    `keep_fraction` hash-sample, bins below drop.  (None, 0.0) means
    the whole corpus fits the budget."""
    cum = 0
    for b in range(n_bins - 1, -1, -1):
        m = int(bin_mass.get(b, 0))
        if m <= 0:
            continue
        if cum + m <= budget:
            cum += m
        else:
            return b, (budget - cum) / m
    return None, 0.0


def select_token_budget(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    token_col: str,
    budget: int,
    n_bins: int = 1000,
    salt: str = "budget",
) -> DataFrame:
    """Select the highest-quality rows whose token mass approximates
    `budget` — two passes, no global sort (see module docstring).

    Quality is clamped to [0, 1] and binned to `n_bins` buckets; rows
    with NULL quality or non-positive tokens never qualify.  The
    threshold bin is hash-sampled at the remainder fraction, so the
    kept token mass matches the budget in expectation within the bin
    (deterministic membership, like every sampling op here)."""
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if n_bins <= 0:
        raise ValueError("n_bins must be > 0")
    q = F.least(
        F.greatest(F.col(quality_col).cast("double"), F.lit(0.0)),
        F.lit(1.0),
    )
    bin_ = F.least(
        F.floor(q * n_bins).cast("long"), F.lit(n_bins - 1).cast("long")
    )
    base = df.filter(
        F.col(quality_col).isNotNull() & (F.col(token_col) > 0)
    ).withColumn("_qbin", bin_)
    # pass 1: n_bins-row histogram — corpus-size-independent driver load
    mass_rows = (
        base.groupBy("_qbin").agg(F.sum(F.col(token_col)).alias("_m"))
        .collect()
    )
    bin_mass = {int(r["_qbin"]): int(r["_m"]) for r in mass_rows}
    t, frac = budget_threshold(bin_mass, int(budget), int(n_bins))
    if t is None:
        return base.drop("_qbin")
    cut = int(math.floor(frac * BUCKETS))
    b = _bucket_col(F.col(id_col), salt)
    # pass 2: pure row-local filter
    return base.filter(
        (F.col("_qbin") > t) | ((F.col("_qbin") == t) & (b < cut))
    ).drop("_qbin")


def select_token_budget_sql(
    id_expr: str,
    quality_expr: str,
    token_expr: str,
    budget_expr: str,
    n_bins: int,
    salt: str = "budget",
    source: str = "documents",
    id_out: str = "doc_id",
) -> str:
    """DuckDB twin: the SAME histogram → threshold → filter pipeline as
    pure SQL (threshold bin = highest bin whose cumulative-from-top
    mass overflows the budget; floor() keeps the fraction→bucket cut
    bit-identical to the driver's math.floor)."""
    bucket = bucket_sql(id_expr, salt)
    return f"""
WITH rows_ AS (
  SELECT {id_expr} AS {id_out}, ({token_expr}) AS tok,
         CAST(least(floor(least(greatest(CAST({quality_expr} AS DOUBLE), 0.0), 1.0)
                          * {n_bins}), {n_bins - 1}) AS BIGINT) AS qbin,
         {bucket} AS bkt
  FROM {source}
  WHERE ({quality_expr}) IS NOT NULL AND ({token_expr}) > 0),
mass AS (SELECT qbin, sum(tok) AS m FROM rows_ GROUP BY qbin),
cum AS (
  SELECT qbin, m,
         coalesce(sum(m) OVER (ORDER BY qbin DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS above
  FROM mass),
thr AS (
  SELECT qbin AS t,
         CAST(floor((({budget_expr}) - above)::DOUBLE / m * {BUCKETS})
              AS BIGINT) AS cut
  FROM cum WHERE above + m > ({budget_expr})
  ORDER BY qbin DESC LIMIT 1)
SELECT r.{id_out}
FROM rows_ r
WHERE NOT EXISTS (SELECT 1 FROM thr)
   OR r.qbin > (SELECT t FROM thr)
   OR (r.qbin = (SELECT t FROM thr) AND r.bkt < (SELECT cut FROM thr))"""
