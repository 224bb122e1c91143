"""Persisted ANN index (ops/ann_index.py): build/query split.

The scale contract under test:
- searching a loaded index NEVER retrains or re-encodes — the stored
  table is read back with the `_cell`/`_bucket` filter on the PARTITION
  column, so only nprobe partition directories are physically opened
  (verified via input_file_name over the executed scan, not just the
  plan text — see also tests/test_plans.py for the plan pin).
- results are identical to the per-query convenience paths
  (ivf_topk / ivfpq_topk / lsh_bucketed_topk) with the same params,
  since both share the same trainer/encoder.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import ann_index as AI
from search_engine_spark.ops import similarity as S

DIM = 16
N = 300
SEED = 9


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(SEED)
    centers = rng.randn(4, DIM) * 3.0
    rows = []
    for i in range(N):
        c = centers[i % 4]
        rows.append((i, (c + rng.randn(DIM)).astype(float).tolist()))
    return spark.createDataFrame(rows, "id long, vec array<double>").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return emb.filter(F.col("id") == 0).collect()[0]["vec"]


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "ivf_idx")
    AI.ann_build(emb, "id", "vec", d, kind="ivf",
                 n_cells=8, train_sample=256, iters=5, seed=3)
    return d


def _rows(df):
    return [tuple(r) for r in df.collect()]


class TestIvfPersisted:
    def test_matches_convenience_path(self, spark, emb, qvec, ivf_dir):
        idx = AI.ann_load(spark, ivf_dir)
        got = _rows(idx.search(qvec, k=10, nprobe=2))
        ref = _rows(S.ivf_topk(emb, "id", "vec", qvec, k=10, n_cells=8,
                               nprobe=2, train_sample=256, iters=5, seed=3))
        assert got == ref

    def test_partition_pruning_is_physical(self, spark, emb, qvec, ivf_dir):
        idx = AI.ann_load(spark, ivf_dir)
        probe = idx.probe_cells(qvec, 2)
        cand = idx._vectors().filter(F.col("_cell").isin(probe))
        files = {
            r[0]
            for r in cand.select(F.input_file_name()).distinct().collect()
        }
        touched_cells = set()
        for f in files:
            part = [p for p in f.split("/") if p.startswith("_cell=")]
            assert part, f"non-partitioned file read: {f}"
            touched_cells.add(int(part[0].split("=")[1]))
        assert touched_cells == set(probe)
        # and the stored layout actually has more cells than we probed
        all_cells = {
            int(p.split("=")[1])
            for p in os.listdir(os.path.join(ivf_dir, AI.VECTORS_DIR))
            if p.startswith("_cell=")
        }
        assert len(all_cells) > len(probe)

    def test_search_batch_matches_per_query(self, spark, emb, ivf_dir):
        idx = AI.ann_load(spark, ivf_dir)
        qdf = emb.filter(F.col("id") < 3).select(
            F.col("id").alias("qid"), F.col("vec").alias("qv")
        )
        batch = idx.search_batch(qdf, "qid", "qv", k=5, nprobe=2)
        for r in qdf.collect():
            single = _rows(idx.search(list(r["qv"]), k=5, nprobe=2))
            got = sorted(
                [(t[1], t[2]) for t in _rows(batch) if t[0] == r["qid"]],
                key=lambda t: (-t[1], t[0]),
            )
            assert got == single


class TestIvfPqPersisted:
    def test_matches_convenience_path(self, spark, emb, qvec, tmp_path):
        d = str(tmp_path / "ivfpq_idx")
        AI.ann_build(emb, "id", "vec", d, kind="ivfpq", n_cells=8,
                     m_subvectors=4, n_codes=16, train_sample=256,
                     iters=5, seed=3)
        idx = AI.ann_load(spark, d)
        got = _rows(idx.search(qvec, k=10, nprobe=2, refine=30))
        ref = _rows(S.ivfpq_topk(emb, "id", "vec", qvec, k=10, n_cells=8,
                                 nprobe=2, m_subvectors=4, n_codes=16,
                                 train_sample=256, iters=5, seed=3,
                                 refine=30))
        assert got == ref

    def test_codes_only_footprint(self, spark, emb, qvec, tmp_path):
        d = str(tmp_path / "ivfpq_codes")
        AI.ann_build(emb, "id", "vec", d, kind="ivfpq", n_cells=8,
                     m_subvectors=4, n_codes=16, train_sample=256,
                     iters=5, seed=3, store_vectors=False)
        idx = AI.ann_load(spark, d)
        stored = idx._vectors()
        assert "vec" not in stored.columns  # codes-only: true PQ footprint
        res = idx.search(qvec, k=10, nprobe=2)
        assert res.columns == ["id", "score"]
        assert res.count() == 10
        with pytest.raises(ValueError, match="refine"):
            idx.search(qvec, k=10, nprobe=2, refine=30)


class TestLshPersisted:
    def test_matches_convenience_path(self, spark, emb, qvec, tmp_path):
        d = str(tmp_path / "lsh_idx")
        AI.ann_build(emb, "id", "vec", d, kind="lsh", n_planes=6, seed=5)
        idx = AI.ann_load(spark, d)
        got = _rows(idx.search(qvec, k=10, probe_hamming=1))
        ref = _rows(S.lsh_bucketed_topk(emb, "id", "vec", qvec, k=10,
                                        n_planes=6, probe_hamming=1, seed=5))
        assert got == ref

    def test_bucket_pruning_is_physical(self, spark, emb, qvec, tmp_path):
        d = str(tmp_path / "lsh_idx2")
        AI.ann_build(emb, "id", "vec", d, kind="lsh", n_planes=6, seed=5)
        idx = AI.ann_load(spark, d)
        probe = idx.probe_buckets(qvec, 1)
        cand = idx._vectors().filter(F.col("_bucket").isin(probe))
        files = {
            r[0]
            for r in cand.select(F.input_file_name()).distinct().collect()
        }
        for f in files:
            assert "_bucket=" in f
            b = int([p for p in f.split("/") if p.startswith("_bucket=")][0]
                    .split("=")[1])
            assert b in probe


def test_build_refuses_bad_kind(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="unknown ANN kind"):
        AI.ann_build(emb, "id", "vec", str(tmp_path / "x"), kind="hnsw")
    with pytest.raises(ValueError, match="store_vectors"):
        AI.ann_build(emb, "id", "vec", str(tmp_path / "y"), kind="ivf",
                     store_vectors=False)
