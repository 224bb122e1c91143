"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline; one scan, one
  TakeOrderedAndProject — no shuffle beyond the final top-k merge.
- LSH-bucketed top-k: random-hyperplane sign buckets (deterministic
  seeded planes) prune the scan to matching buckets — the 100 TB path;
  approximate (bucket recall), verified in tests against brute force
  for recall, not equality.
- IVF top-k: spherical k-means coarse quantizer (trained driver-side on
  a deterministic sample, FAISS-style), one Arrow pass assigns cells,
  queries probe the nprobe nearest cells only — partition-pruned when
  the assigned table is written partitionBy("_cell").
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
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


def kmeans_centroids(
    sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd k-means on L2-normalized vectors (spherical
    k-means — the IVF coarse quantizer for cosine similarity).  Pure
    numpy on a driver-collected SAMPLE: training the quantizer on a
    bounded sample and broadcasting the centroids is the standard IVF
    recipe (FAISS-style) — the full corpus is never collected."""
    rng = np.random.RandomState(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cent[c] = m / n
    return cent


def assign_cells(
    emb: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """Add `_cell` = nearest-centroid id, one vectorized Arrow pass
    (batch matmul against the broadcast centroid matrix).  At scale the
    assigned table is written `partitionBy("_cell")`, so queries prune
    to nprobe partitions."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    return emb.withColumn("_cell", nearest(F.col(vec_col)))


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    train_sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: spherical-k-means cells + nprobe probing.

    Train: deterministic sample (hash-ordered prefix) -> Lloyd iterations
    driver-side -> centroids broadcast.  Query: rank cells by centroid
    similarity, scan only the nprobe best (partition-pruned at scale),
    exact cosine within them.  Approximate by design; tests verify
    recall against brute_force_topk, not equality."""
    # Deterministic, engine-replicable sample: order by md5(id) — the
    # hermetic oracle (pure python hashlib + numpy over the same
    # parquet) reproduces the exact sample, hence the exact centroids.
    from search_engine_spark.ops.common import md5int_col

    sample_rows = (
        emb.select(F.col(id_col).cast("string").alias("_id"), F.col(vec_col))
        .orderBy(md5int_col(F.col("_id")), F.col("_id"))
        .limit(train_sample)
        .collect()
    )
    if not sample_rows:
        return emb.sparkSession.createDataFrame([], "id long, cosine double")
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, n_cells, iters=iters, seed=seed)

    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    order = np.argsort(-(cent @ qv))
    probe = [int(c) for c in order[: max(1, nprobe)]]

    assigned = assign_cells(emb, id_col, vec_col, cent)
    q = _as_double_array(query_vec)
    return (
        assigned.filter(F.col("_cell").isin(probe))
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
