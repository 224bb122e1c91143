"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline; one scan, one
  TakeOrderedAndProject — no shuffle beyond the final top-k merge.
- LSH-bucketed top-k: random-hyperplane sign buckets (deterministic
  seeded planes) prune the scan to matching buckets — the 100 TB path;
  approximate (bucket recall), verified in tests against brute force
  for recall, not equality.
- IVF-style variant: k-means-free coarse quantizer using hyperplane
  buckets as cells with multi-probe.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import cosine_col, dot_col


def _as_double_array(values: Sequence[float]):
    return F.array(*[F.lit(float(v)) for v in values])


def brute_force_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector."""
    q = _as_double_array(query_vec)
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def _bucket_col(vec_col, planes: np.ndarray):
    bits = None
    for j, plane in enumerate(planes):
        d = dot_col(vec_col, _as_double_array(plane))
        bit = F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def lsh_bucketed_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only buckets within `probe_hamming` bits
    of the query's bucket (multi-probe LSH).  At scale the bucket column
    is a parquet partition key, so the probe prunes partitions."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = 0
    for j, plane in enumerate(planes):
        if float(plane @ qv) >= 0:
            qbits |= 1 << j

    probe: List[int] = [qbits]
    if probe_hamming >= 1:
        probe += [qbits ^ (1 << j) for j in range(n_planes)]
    if probe_hamming >= 2:
        probe += [
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]

    bucketed = emb.withColumn("_bucket", _bucket_col(F.col(vec_col), planes))
    q = _as_double_array(query_vec)
    return (
        bucketed.filter(F.col("_bucket").isin(probe))
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def pairwise_topk_join(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Batch ANN: top-k corpus neighbors for EVERY query row via
    broadcast of the (small) query side + per-query window top-k."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")
    )
    joined = emb.crossJoin(F.broadcast(q)).select(
        "q_id",
        F.col(id_col).alias("id"),
        F.round(cosine_col(F.col(vec_col), F.col("q_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
