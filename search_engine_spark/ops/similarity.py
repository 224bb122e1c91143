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


def _empty_topk(emb: DataFrame, id_col: str, score_name: str) -> DataFrame:
    """Empty result preserving the INPUT's id type — a hardcoded
    `id long` schema would make the empty-corpus path union-incompatible
    with the string-id results the non-empty path produces."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    return emb.sparkSession.createDataFrame(
        [],
        StructType([
            StructField("id", emb.schema[id_col].dataType),
            StructField(score_name, DoubleType()),
        ]),
    )


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
        return _empty_topk(emb, id_col, "cosine")
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


def pq_codebooks(
    sample: np.ndarray,
    centroids: np.ndarray,
    m_subvectors: int,
    n_codes: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks over COARSE RESIDUALS — the
    IVF-PQ training step (FAISS recipe): normalize the sample, assign
    each vector to its nearest coarse centroid, split the residual
    into m_subvectors contiguous sub-vectors, and run plain Lloyd
    k-means (n_codes codes) independently per subspace.  Pure numpy on
    the driver sample; returns (m, n_codes, dim/m)."""
    x = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    d = x.shape[1]
    if d % m_subvectors != 0:
        raise ValueError(
            f"dim {d} not divisible by m_subvectors {m_subvectors}"
        )
    dsub = d // m_subvectors
    resid = x - centroids[(x @ centroids.T).argmax(axis=1)]
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m_subvectors):
        sub = resid[:, j * dsub:(j + 1) * dsub]
        cb = sub[
            rng.choice(len(sub), size=min(n_codes, len(sub)),
                       replace=False)
        ].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(axis=1)
            for c in range(len(cb)):
                mem = sub[a == c]
                if len(mem):
                    cb[c] = mem.mean(axis=0)
        if len(cb) < n_codes:  # tiny samples: pad with repeats
            cb = np.vstack([cb] * ((n_codes // len(cb)) + 1))[:n_codes]
        books.append(cb)
    return np.stack(books)


def encode_pq(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    books: np.ndarray,
) -> DataFrame:
    """Add `_cell` (coarse assignment) and `_codes` (per-subspace PQ
    codes of the residual) in ONE vectorized Arrow pass.  At 10^12
    vectors this is the stored index: 1 int + m uint8 codes per vector
    instead of dim floats (the raw vectors live only in cold storage
    for optional refine)."""
    cent = centroids.astype(np.float64)
    bks = books.astype(np.float64)
    m, _n_codes, dsub = bks.shape

    @F.pandas_udf("struct<_cell: int, _codes: array<int>>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                           1e-12)
        cells = (x @ cent.T).argmax(axis=1)
        resid = x - cent[cells]
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = resid[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - bks[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame(
            {"_cell": cells.astype(np.int32),
             "_codes": list(codes)}
        )

    return emb.withColumn("_pq", enc(F.col(vec_col))).select(
        "*", F.col("_pq._cell").alias("_cell"),
        F.col("_pq._codes").alias("_codes"),
    ).drop("_pq")


def ivfpq_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m_subvectors: int = 4,
    n_codes: int = 16,
    train_sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    refine: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k — the 10^12-vector scale path: coarse
    IVF cells prune the corpus to nprobe partitions, and within them
    scoring reads only the PQ codes via asymmetric distance computation
    (ADC): approx_dot(q, v) = q·centroid(cell) + Σ_j LUT_j[code_j]
    where LUT_j = codebook_j @ q_sub is a tiny per-query table.  Both
    sides normalized, so the score approximates cosine.  The LUTs
    become literal arrays and the whole scoring expression is native
    (element_at + map lookup) — vectors are never touched at query
    time unless `refine` > 0, which exact-rescores the top `refine` ADC
    candidates (returns `cosine`; refine=0 returns approximate
    `score`).  Deterministic end-to-end (hash-ordered training sample,
    seeded k-means); recall vs brute force is pinned by tests, not
    equality."""
    from search_engine_spark.ops.common import md5int_col

    sample_rows = (
        emb.select(F.col(id_col).cast("string").alias("_id"),
                   F.col(vec_col))
        .orderBy(md5int_col(F.col("_id")), F.col("_id"))
        .limit(train_sample)
        .collect()
    )
    if not sample_rows:
        return _empty_topk(emb, id_col, "score")
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, n_cells, iters=iters, seed=seed)
    books = pq_codebooks(
        sample, cent, m_subvectors, n_codes, iters=iters, seed=seed
    )
    m, _nc, dsub = books.shape

    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    cell_scores = cent @ qv
    probe = [int(c) for c in np.argsort(-cell_scores)[: max(1, nprobe)]]

    encoded = encode_pq(emb, id_col, vec_col, cent, books).filter(
        F.col("_cell").isin(probe)
    )
    cell_term = F.create_map(
        *[x for c in probe
          for x in (F.lit(c), F.lit(float(cell_scores[c])))]
    )[F.col("_cell")]
    adc = cell_term
    for j in range(m):
        lut = books[j] @ qv[j * dsub:(j + 1) * dsub]
        adc = adc + F.element_at(
            F.array(*[F.lit(float(v)) for v in lut]),
            F.col("_codes")[j] + 1,
        )
    scored = encoded.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_vec"),
        F.round(adc, 6).alias("score"),
    )
    if refine <= 0:
        return (
            scored.drop("_vec")
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(k)
        )
    q = _as_double_array(query_vec)
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(max(int(refine), k))
        .select(
            "id",
            F.round(cosine_col(F.col("_vec"), q), 6).alias("cosine"),
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
