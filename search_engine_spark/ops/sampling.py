"""Deterministic sampling for training-data curation.

A 100-TB training pipeline samples constantly — smoke subsets,
per-source quotas, train/val/test splits — and at that scale the
sample must be (a) reproducible across reruns and engines and (b) a
pure row-local filter (no shuffle, no RNG state, no driver round-trip).
Every op here hashes a stable id column (md5 → 60-bit int, identical in
Spark / DuckDB / Python — ops/common.py) and keeps a row iff its hash
bucket falls in the requested range:

- `sample(df, id_col, fraction)` — Bernoulli-style p-fraction sample.
- `stratified_sample(df, id_col, strata_col, fractions)` — per-stratum
  fractions (the `df.sampleBy` shape, but deterministic and
  engine-portable; strata missing from the dict keep NOTHING, matching
  sampleBy).
- `split(df, id_col, weights)` — disjoint, exhaustive train/val/test
  style assignment (a `_split` label column).

Scale: each is a WHERE clause on a hash of columns already in the row —
Catalyst keeps it inside the scan's WholeStageCodegen, it composes with
partition pruning, and the same row always lands in the same bucket on
any cluster size.  The salt argument decorrelates independent samples
(sample(0.1, salt=a) vs salt=b overlap ~1%, not 100%).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, md5int_sql

# hash buckets per unit interval; 10^6 gives fraction resolution 1e-6
BUCKETS = 1_000_000


def _bucket_col(id_col: Column, salt: str) -> Column:
    return md5int_col(
        F.concat(id_col.cast("string"), F.lit(f"|{salt}"))
    ) % BUCKETS


def bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of the bucket assignment."""
    return (
        md5int_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}'")
        + f" % {BUCKETS}"
    )


def sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~fraction of rows, deterministically by id hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        _bucket_col(F.col(id_col), salt) < int(round(fraction * BUCKETS))
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Dict[str, float],
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic fractions (df.sampleBy shape).

    Strata absent from `fractions` are dropped entirely — same contract
    as sampleBy.  The hash is over the id (not the stratum), so a row
    keeps its fate if its stratum's fraction is unchanged.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    thresh = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k), F.lit(int(round(v * BUCKETS))))
        ]
    )
    t = thresh[F.col(strata_col)]
    return df.filter(
        t.isNotNull() & (_bucket_col(F.col(id_col), salt) < t)
    )


def split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[Tuple[str, float]],
    salt: str = "split",
) -> DataFrame:
    """Disjoint exhaustive assignment: adds a `_split` label column.

    weights: ordered (name, weight) pairs; weights are normalized, the
    LAST split absorbs rounding remainder so the assignment is total.
    """
    names = [n for n, _ in weights]
    ws = [float(w) for _, w in weights]
    if len(names) != len(set(names)):
        raise ValueError("duplicate split names")
    if any(w < 0 for w in ws) or sum(ws) <= 0:
        raise ValueError("weights must be non-negative, sum > 0")
    total = sum(ws)
    bounds: List[int] = []
    acc = 0.0
    for w in ws[:-1]:
        acc += w / total
        bounds.append(int(round(acc * BUCKETS)))
    b = _bucket_col(F.col(id_col), salt)
    # when-chains evaluate first-match: ascending bounds, `b < bound`
    expr = None
    for name, bound in zip(names[:-1], bounds):
        expr = (
            F.when(b < bound, F.lit(name))
            if expr is None
            else expr.when(b < bound, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn("_split", expr)


def mix_plan(
    avail: Dict[str, int],
    weights: Dict[str, float],
    total_tokens: int,
    allow_upsample: bool = False,
) -> Dict[str, Tuple[int, float]]:
    """Per-source (full_epochs, remainder_fraction) to hit a target
    mixture — pure driver math, exposed for tests/oracles.

    target_s = weight_s/Σweights × total_tokens; ratio = target/avail.
    Without upsampling the ratio caps at 1 (you can't sample more than
    exists); with it, ratio k.f means k full passes over the source
    plus an f-fraction sample — how LLM data mixtures repeat
    under-represented sources across epochs.  Sources with a weight but
    no rows are reported as (0, 0.0)."""
    ws = {k: float(v) for k, v in weights.items()}
    if not ws or any(v < 0 for v in ws.values()) or sum(ws.values()) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    if total_tokens <= 0:
        raise ValueError("total_tokens must be > 0")
    wsum = sum(ws.values())
    plan: Dict[str, Tuple[int, float]] = {}
    for s, w in sorted(ws.items()):
        a = int(avail.get(s, 0))
        if a <= 0:
            plan[s] = (0, 0.0)
            continue
        ratio = (w / wsum) * total_tokens / a
        if not allow_upsample:
            ratio = min(ratio, 1.0)
        full = int(ratio)
        plan[s] = (full, ratio - full)
    return plan


def mix_corpus(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_col: str,
    weights: Dict[str, float],
    total_tokens: int,
    salt: str = "mix",
    allow_upsample: bool = False,
) -> Tuple[DataFrame, Dict[str, Tuple[int, float]]]:
    """Deterministic weighted corpus mixing — the training-data
    "data mixture" op: sample each source so the sampled TOKEN mass
    approximates weight_s × total_tokens.  Returns (mixed rows with an
    `_epoch` column, the per-source plan).

    Row-level hash sampling at the planned fraction gives expected
    token mass = fraction × available (exact in expectation, not per
    run — the pinned trade-off every hash-sampled pipeline makes); the
    sample itself is fully deterministic given (id, salt).  Upsampled
    sources emit full copies `_epoch` 0..k-1 plus an epoch-salted
    remainder sample at `_epoch` k, so repeated rows stay
    distinguishable downstream.

    Physical shape: ONE tiny groupBy(source).sum(token) planning pass,
    then per-source codegen'd hash filters unioned over the same scan —
    no shuffle of data rows, composes with partition pruning; at 100 TB
    the plan job is seconds and the mix itself is a WHERE clause."""
    rows = (
        df.groupBy(source_col).agg(F.sum(F.col(token_col)).alias("a"))
        .collect()
    )
    # sum() is NULL when every token value in a source is null (e.g.
    # size(null array) rows) — such a source has no sampleable mass
    avail = {r[0]: int(r["a"] or 0) for r in rows}
    plan = mix_plan(avail, weights, total_tokens, allow_upsample)
    parts: List[DataFrame] = []
    for s, (full, frac) in plan.items():
        src = df.filter(F.col(source_col) == s)
        if full > 0:
            # ONE explode over an epoch sequence — a per-epoch union
            # branch would grow the Catalyst plan linearly with the
            # upsample ratio (a 1000x ratio must not mean 1000 scans)
            parts.append(
                src.withColumn(
                    "_epoch",
                    F.explode(
                        F.sequence(F.lit(0), F.lit(int(full) - 1))
                    ),
                )
            )
        if frac > 0.0:
            cut = int(round(frac * BUCKETS))
            parts.append(
                src.filter(
                    _bucket_col(F.col(id_col), f"{salt}|ep{full}") < cut
                ).withColumn("_epoch", F.lit(full))
            )
    if not parts:
        return df.withColumn("_epoch", F.lit(0)).limit(0), plan
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, plan
