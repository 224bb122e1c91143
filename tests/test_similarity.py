"""ANN similarity ops (ops/similarity.py): exact baseline vs numpy
ground truth, LSH/IVF recall versus brute force, IVF determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import similarity as S

DIM = 16
N = 300
SEED = 9


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(SEED)
    # clustered corpus: 4 gaussian blobs -> IVF cells have real structure
    centers = rng.randn(4, DIM) * 3.0
    rows = []
    for i in range(N):
        c = centers[i % 4]
        rows.append((i, (c + rng.randn(DIM)).astype(float).tolist()))
    return spark.createDataFrame(rows, "id long, vec array<double>").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return emb.filter(F.col("id") == 0).collect()[0]["vec"]


def _numpy_topk(emb_df, qv, k):
    rows = emb_df.collect()
    q = np.asarray(qv)
    sims = []
    for r in rows:
        v = np.asarray(r["vec"])
        c = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        sims.append((round(c, 6), r["id"]))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return [(i, c) for c, i in sims[:k]]


def test_brute_force_matches_numpy(spark, emb, qvec):
    got = [
        (r["id"], r["cosine"])
        for r in S.brute_force_topk(emb, "id", "vec", qvec, k=10).collect()
    ]
    want = _numpy_topk(emb, qvec, 10)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-6


def test_lsh_recall(spark, emb, qvec):
    exact = {i for i, _ in _numpy_topk(emb, qvec, 10)}
    got = {
        r["id"]
        for r in S.lsh_bucketed_topk(
            emb, "id", "vec", qvec, k=10, n_planes=6, probe_hamming=2
        ).collect()
    }
    assert len(exact & got) >= 7  # multi-probe recall on clustered data


def test_ivf_recall_and_determinism(spark, emb, qvec):
    exact = {i for i, _ in _numpy_topk(emb, qvec, 10)}
    a = S.ivf_topk(
        emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=2,
        train_sample=128, iters=5, seed=7,
    ).collect()
    b = S.ivf_topk(
        emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=2,
        train_sample=128, iters=5, seed=7,
    ).collect()
    assert [(r["id"], r["cosine"]) for r in a] == [
        (r["id"], r["cosine"]) for r in b
    ]
    got = {r["id"] for r in a}
    # query belongs to a blob; probing 2/4 cells must keep most of top-k
    assert len(exact & got) >= 7


def test_ivf_nprobe_all_cells_is_exact(spark, emb, qvec):
    got = [
        (r["id"], r["cosine"])
        for r in S.ivf_topk(
            emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=4,
            train_sample=128, iters=5, seed=7,
        ).collect()
    ]
    assert got == [
        (r["id"], r["cosine"])
        for r in S.brute_force_topk(emb, "id", "vec", qvec, k=10).collect()
    ]


def test_pairwise_topk_join(spark, emb):
    queries = emb.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = S.pairwise_topk_join(emb, "id", "vec", queries, "qid", "qvec", k=5)
    rows = got.collect()
    assert {r["q_id"] for r in rows} == {0, 1, 2}
    for qid in (0, 1, 2):
        mine = [r for r in rows if r["q_id"] == qid]
        assert len(mine) == 5
        # self is its own nearest neighbor
        assert max(mine, key=lambda r: r["cosine"])["id"] == qid


class TestEmbeddingNearDupLSH:
    """LSH-bucketed near-dup pairs (ops/dedup.py): exact precision
    (every emitted pair really clears the cosine threshold — it's a
    subset of the brute-force pairs) and multi-table recall on a
    corpus with planted near-duplicates."""

    @pytest.fixture(scope="class")
    def dup_emb(self, spark):
        rng = np.random.RandomState(11)
        rows = []
        for i in range(120):
            v = rng.randn(DIM)
            rows.append((2 * i, v.astype(float).tolist()))
            # planted near-dup: tiny perturbation -> cosine ~0.999
            rows.append((2 * i + 1, (v + 0.02 * rng.randn(DIM)).astype(float).tolist()))
        return spark.createDataFrame(rows, "id long, vec array<double>").cache()

    def test_subset_of_brute_and_high_recall(self, spark, dup_emb):
        from search_engine_spark.ops import dedup as D

        brute = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in D.embedding_near_dup_pairs(
                dup_emb, "id", "vec", threshold=0.95
            ).collect()
        }
        assert len(brute) >= 100  # the planted pairs all qualify
        lsh = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in D.embedding_near_dup_pairs_lsh(
                dup_emb, "id", "vec", threshold=0.95,
                dim=DIM, n_planes=8, n_tables=3, seed=7,
            ).collect()
        }
        # exact precision: subset with identical cosines
        for p, c in lsh.items():
            assert p in brute and abs(c - brute[p]) < 1e-9
        # multi-table recall on ~0.999-cosine pairs: miss prob per
        # table (1-(1-θ/π)^8)≈0.10 -> ~1e-3 over 3 tables
        assert len(lsh) >= 0.97 * len(brute)

    def test_dispatcher_defaults_to_lsh(self, spark, dup_emb):
        """embedding_near_dup (the obvious name) routes to the LSH
        scale path by default; 'exact' opts into the O(n^2) baseline;
        unknown methods refuse loudly."""
        import pytest

        from search_engine_spark.ops import dedup as D

        via_default = D.embedding_near_dup(
            dup_emb, "id", "vec", threshold=0.95,
            dim=DIM, n_planes=8, n_tables=3, seed=7,
        ).collect()
        via_lsh = D.embedding_near_dup_pairs_lsh(
            dup_emb, "id", "vec", threshold=0.95,
            dim=DIM, n_planes=8, n_tables=3, seed=7,
        ).collect()
        assert sorted(map(tuple, via_default)) == sorted(map(tuple, via_lsh))
        n_exact = D.embedding_near_dup(
            dup_emb, "id", "vec", threshold=0.95, method="exact"
        ).count()
        assert n_exact >= len(via_default)
        with pytest.raises(ValueError, match="unknown method"):
            D.embedding_near_dup(dup_emb, "id", "vec", method="ann")

    def test_more_tables_monotone(self, spark, dup_emb):
        from search_engine_spark.ops import dedup as D

        n1 = D.embedding_near_dup_pairs_lsh(
            dup_emb, "id", "vec", threshold=0.95, dim=DIM,
            n_planes=8, n_tables=1, seed=7,
        ).count()
        n3 = D.embedding_near_dup_pairs_lsh(
            dup_emb, "id", "vec", threshold=0.95, dim=DIM,
            n_planes=8, n_tables=3, seed=7,
        ).count()
        assert n3 >= n1


class TestIVFPQ:
    """IVF-PQ: ADC scoring over coarse cells + product-quantized
    residuals — recall vs brute force, determinism, refine exactness."""

    def test_recall_and_determinism(self, spark, emb, qvec):
        exact = {i for i, _ in _numpy_topk(emb, qvec, 10)}
        a = S.ivfpq_topk(
            emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=2,
            m_subvectors=16, n_codes=16,
        ).collect()
        b = S.ivfpq_topk(
            emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=2,
            m_subvectors=16, n_codes=16,
        ).collect()
        assert [(r["id"], r["score"]) for r in a] == [
            (r["id"], r["score"]) for r in b
        ]
        got = {r["id"] for r in a}
        # fine PQ (1-dim subvectors) on clustered data: most of the
        # true top-10; coarser m trades recall for bytes — the refine
        # test below pins the production path
        assert len(exact & got) >= 7, sorted(got)

    def test_refine_rescores_exactly(self, spark, emb, qvec):
        refined = S.ivfpq_topk(
            emb, "id", "vec", qvec, k=10, n_cells=4, nprobe=2,
            m_subvectors=4, n_codes=16, refine=50,
        ).collect()
        true_cos = dict(_numpy_topk(emb, qvec, len(emb.collect())))
        for r in refined:
            assert abs(r["cosine"] - true_cos[r["id"]]) < 1e-6
        exact = {i for i, _ in _numpy_topk(emb, qvec, 10)}
        assert len(exact & {r["id"] for r in refined}) >= 8

    def test_adc_approximates_cosine(self, spark, emb, qvec):
        """Mean |ADC - true cosine| over the probed cells must be small
        relative to the score scale (the quantization error budget)."""
        rows = S.ivfpq_topk(
            emb, "id", "vec", qvec, k=50, n_cells=4, nprobe=4,
            m_subvectors=8, n_codes=16,
        ).collect()
        true_cos = dict(_numpy_topk(emb, qvec, len(emb.collect())))
        errs = [abs(r["score"] - true_cos[r["id"]]) for r in rows]
        assert sum(errs) / len(errs) < 0.08, sum(errs) / len(errs)

    def test_bad_subvector_split_refused(self, spark, emb, qvec):
        with pytest.raises(ValueError):
            S.ivfpq_topk(emb, "id", "vec", qvec, m_subvectors=5)
