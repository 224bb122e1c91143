"""Near-dup dedup clustering: connected components (transitive closure
over LSH pairs) and the one-survivor-per-cluster dedup operator."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import dedup as D


def test_cc_transitivity_and_separate_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "id_a long, id_b long",
    )
    comp = {
        r["id"]: r["comp"] for r in D.connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_long_path_converges(spark):
    # path 0-1-2-...-6: min label needs ~diameter rounds to reach the end
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    rows = D.connected_components(pairs).collect()
    assert len(rows) == 7
    assert {r["comp"] for r in rows} == {0}


def test_cc_refuses_unconverged(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        D.connected_components(pairs, max_iter=2)


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(pairs).count() == 0


def test_minhash_dedup_keeps_one_per_cluster(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "from home across seven green hills toward the bright morning sun "
    ) * 4
    docs = [
        (1, base),
        (2, base + " trailing extra words here"),
        (3, base + " slightly different trailing suffix"),
        (4, "completely different text about spark shuffle partitions "
            "broadcast joins and adaptive execution planning " * 6),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = D.minhash_dedup_pairs(df, "doc_id", "text", jaccard_threshold=0.5)
    paired = {
        x for r in pairs.collect() for x in (r["id_a"], r["id_b"])
    }
    assert paired and 4 not in paired  # 1/2/3 near-dup, 4 distinct
    out = {r["doc_id"] for r in D.minhash_dedup(
        df, "doc_id", "text", jaccard_threshold=0.5
    ).collect()}
    assert 4 in out            # unpaired docs always survive
    assert min(paired) in out  # survivor is the cluster's min id
    assert len(out) == 4 - (len(paired) - 1)


def test_minhash_dedup_all_distinct_is_identity(spark):
    docs = [
        (i, f"unique document number {i} with its own special topic "
            f"covering subject{i} theme{i} variant{i} " * 5)
        for i in range(1, 5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert D.minhash_dedup(df, "doc_id", "text").count() == 4


class TestLineDedup:
    """C4-style corpus-level exact line dedup: a distinct line survives
    only at its first (id, pos) occurrence — vs a Python oracle."""

    def test_first_occurrence_wins(self, spark):
        from search_engine_spark.ops.dedup import line_dedup

        rows = [
            (1, "unique one.\nCookie banner text\nbody of doc one."),
            (2, "Cookie banner text\nbody of doc two.\nFooter line"),
            (3, "Footer line\nCookie banner text\nunique three."),
            (4, "   \n\n"),                      # only blank lines
            (5, "repeated inside\nrepeated inside\nunique five."),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: r for r in line_dedup(df, "doc_id", "text").collect()
        }
        # python oracle
        seen, want = set(), {}
        for doc_id, text in rows:
            lines = [l.strip() for l in text.split("\n") if l.strip()]
            kept = []
            for l in lines:
                if l not in seen:
                    seen.add(l)
                    kept.append(l)
            want[doc_id] = (len(lines), len(kept), "\n".join(kept))
        assert set(out) == {r[0] for r in rows}  # every doc kept
        for doc_id, (n_lines, n_kept, clean) in want.items():
            r = out[doc_id]
            assert r["n_lines"] == n_lines
            assert r["n_kept"] == n_kept
            assert r["clean_text"] == clean
        # the shared banner survives exactly once, in doc 1
        all_clean = "\n".join(v[2] for v in want.values())
        assert all_clean.count("Cookie banner text") == 1
        assert "Cookie banner text" in want[1][2]
        # within-doc repeats collapse too
        assert want[5][2].count("repeated inside") == 1


class TestSubstringDedup:
    """Span-level exact dedup (Lee et al. 2021 at word k-grams) vs a
    brute-force Python oracle: first occurrence (by id, then position)
    owns each k-gram; later occurrences — cross-doc AND within-doc —
    lose their covered tokens, overlaps merged."""

    ROWS = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # shares words 0..7 with doc 1, then diverges
        (2, "alpha beta gamma delta epsilon zeta eta theta NEW tail"),
        # overlapping duplicate spans (words 0..8 shared with doc 1)
        (3, "alpha beta gamma delta epsilon zeta eta theta iota other"),
        # within-doc repetition of its own 8-gram
        (4, "p q r s t u v w p q r s t u v w"),
        (5, "too short for any span"),
        (6, ""),
    ]
    K = 8

    @staticmethod
    def _oracle(rows, k):
        seen = {}
        occs = []  # (id, pos, gram) in (id, pos) order
        for i, t in sorted(rows):
            ws = t.split()
            for p in range(max(0, len(ws) - k + 1)):
                occs.append((i, p, " ".join(ws[p:p + k])))
        dup = {}
        for i, p, g in occs:  # already (id, pos)-sorted
            if g in seen:
                dup.setdefault(i, set()).update(range(p, p + k))
            else:
                seen[g] = (i, p)
        out = {}
        for i, t in rows:
            ws = t.split()
            d = dup.get(i, set())
            kept = [w for j, w in enumerate(ws) if j not in d]
            ratio = round(len(d) / max(len(ws), 1), 6)
            out[i] = (len(ws), len(d), ratio, " ".join(kept))
        return out

    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {
            r["id"]: (
                r["n_tokens"], r["n_dup_tokens"], r["dup_ratio"],
                r["clean_text"],
            )
            for r in D.substring_dedup(df, "doc_id", "text", k=self.K)
            .collect()
        }
        want = self._oracle(self.ROWS, self.K)
        assert got == want
        # the scenario assertions the fixture encodes
        assert want[1][1] == 0                      # owner keeps all
        assert want[2][1] == 8                      # one span removed
        assert want[2][3] == "NEW tail"
        assert want[3][1] == 9                      # two overlapping spans merge
        assert want[3][3] == "other"
        assert want[4][1] == 8                      # within-doc repeat
        assert want[4][3] == "p q r s t u v w"
        assert want[5][1] == 0 and want[6] == (0, 0, 0.0, "")

    def test_corpus_fuzz_vs_oracle(self, spark):
        import random

        rng = random.Random(11)
        vocab = [f"w{j}" for j in range(12)]  # tiny vocab -> many collisions
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: (
                r["n_tokens"], r["n_dup_tokens"], r["dup_ratio"],
                r["clean_text"],
            )
            for r in D.substring_dedup(df, "doc_id", "text", k=4).collect()
        }
        assert got == self._oracle(rows, 4)

    def test_hypothesis_random_corpora(self, spark):
        """Property: engine == brute-force oracle on arbitrary small
        corpora (tiny vocab maximizes shared spans; k=3 maximizes span
        interactions), including all-empty and single-doc corpora."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        doc = st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0,
            max_size=14,
        ).map(" ".join)

        @settings(
            max_examples=12, deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(st.lists(doc, min_size=1, max_size=8))
        def check(texts):
            rows = list(enumerate(texts))
            df = spark.createDataFrame(rows, "doc_id long, text string")
            got = {
                r["id"]: (
                    r["n_tokens"], r["n_dup_tokens"], r["dup_ratio"],
                    r["clean_text"],
                )
                for r in D.substring_dedup(df, "doc_id", "text", k=3)
                .collect()
            }
            assert got == self._oracle(rows, 3)

        check()


class TestConfigGuards:
    def test_bands_must_divide_num_hashes(self, spark):
        from search_engine_spark.ops.dedup import minhash_dedup_pairs

        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d f")], "id long, text string"
        )
        with pytest.raises(ValueError, match="divide"):
            minhash_dedup_pairs(df, "id", "text", num_hashes=128, bands=5)

    def test_embedding_lsh_infers_dim(self, spark):
        from search_engine_spark.ops.dedup import (
            embedding_near_dup_pairs,
            embedding_near_dup_pairs_lsh,
        )

        # 16-dim vectors WITHOUT passing dim: candidates must still be
        # a subset of (and for near-identical pairs, include) the brute
        # result — a dim mismatch would NULL the planes and not crash,
        # so assert the pair is actually FOUND
        rows = [
            (1, [1.0] * 8 + [0.0] * 8),
            (2, [1.0] * 8 + [0.0] * 7 + [0.01]),
            (3, [0.0] * 8 + [1.0] * 8),
        ]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs_lsh(
                df, "id", "vec", threshold=0.9, n_tables=4
            ).collect()
        }
        assert (1, 2) in got
        with pytest.raises(ValueError):
            embedding_near_dup_pairs_lsh(df, "id", "vec", n_tables=0)

    def test_embedding_lsh_dim_from_index_meta(
        self, spark, tmp_path, monkeypatch
    ):
        """With a persisted ANN index over the same table, the dim
        probe reads meta.json (driver-local) instead of running a
        Spark action — VERDICT r3 item 7: with validate_dim=False
        (the plan-construction-pure opt-out) .first() must NOT
        fire.  The default keeps one cheap .first() cross-check of
        meta['dim'] — see test_embedding_lsh_rejects_stale_dim."""
        from pyspark.sql import DataFrame

        from search_engine_spark.ops.ann_index import ann_build
        from search_engine_spark.ops.dedup import (
            embedding_near_dup_pairs_lsh,
        )

        rows = [
            (1, [1.0] * 8 + [0.0] * 8),
            (2, [1.0] * 8 + [0.0] * 7 + [0.01]),
            (3, [0.0] * 8 + [1.0] * 8),
        ]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        idx_dir = str(tmp_path / "annidx")
        ann_build(df, "id", "vec", idx_dir, kind="lsh", n_planes=4)

        def no_first(self, *a, **k):  # pragma: no cover - guard
            raise AssertionError(".first() probe fired despite index meta")

        monkeypatch.setattr(DataFrame, "first", no_first)
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs_lsh(
                df, "id", "vec", threshold=0.9, n_tables=4,
                index_dir=idx_dir, validate_dim=False,
            ).collect()
        }
        assert (1, 2) in got

    def test_embedding_lsh_rejects_stale_dim(self, spark, tmp_path):
        """A STALE index — same column names, table re-embedded at a
        different dimension — must refuse under the default
        validate_dim=True probe instead of silently mis-hashing
        every row (ADVICE r4)."""
        from search_engine_spark.ops.ann_index import ann_build
        from search_engine_spark.ops.dedup import (
            embedding_near_dup_pairs_lsh,
        )

        old = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "id long, vec array<double>",
        )
        idx_dir = str(tmp_path / "stale")
        ann_build(old, "id", "vec", idx_dir, kind="lsh", n_planes=4)
        re_embedded = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
            "id long, vec array<double>",
        )
        with pytest.raises(ValueError, match="stale index"):
            embedding_near_dup_pairs_lsh(
                re_embedded, "id", "vec", index_dir=idx_dir
            )
        # the opt-out skips the probe (caller owns the invariant)
        embedding_near_dup_pairs_lsh(
            re_embedded, "id", "vec", index_dir=idx_dir,
            validate_dim=False,
        )


class TestSemDedup:
    """SemDeDup (ops/dedup.py:semdedup): cluster-then-dedup with the
    keep-least-prototypical rule, checked on planted duplicate groups."""

    def _rows(self):
        # two well-separated clusters on orthogonal axes; within
        # cluster A a near-identical duplicate pair (ids 1,2) plus a
        # distinct member (3); cluster B all distinct; one zero vector
        return [
            (1, [1.0, 0.0, 0.0, 0.05]),
            (2, [1.0, 0.0, 0.0, 0.06]),   # dup of 1
            (3, [0.7, 0.0, 0.0, -0.7]),   # same cluster, not a dup
            (10, [0.0, 1.0, 0.0, 0.0]),
            (11, [0.0, 0.7, 0.7, 0.0]),
            (99, [0.0, 0.0, 0.0, 0.0]),   # zero-norm: excluded, no crash
        ]

    def test_keeps_least_prototypical_of_dup_group(self, spark):
        from search_engine_spark.ops.dedup import semdedup

        df = spark.createDataFrame(self._rows(), "id long, vec array<double>")
        out = semdedup(df, "id", "vec", n_clusters=2, threshold=0.95,
                       train_sample=16, iters=4, seed=1).collect()
        kept = {r["id"] for r in out}
        assert 99 not in kept                    # zero vector excluded
        assert {3, 10, 11} <= kept               # non-dups all survive
        assert len(kept & {1, 2}) == 1           # exactly one of the pair
        # the survivor is the one with the SMALLER centroid cosine
        cc = {r["id"]: r["cent_cos"] for r in out}
        dup_kept = (kept & {1, 2}).pop()
        # recompute both members' centroid cos from a fresh assignment
        both = {
            r["id"]: r["cent_cos"]
            for r in semdedup(df, "id", "vec", n_clusters=2, threshold=2.0,
                              train_sample=16, iters=4, seed=1).collect()
        }  # threshold > 1: nothing drops, so both cc values visible
        other = ({1, 2} - {dup_kept}).pop()
        assert (both[dup_kept], dup_kept) <= (both[other], other)
        assert cc[dup_kept] == both[dup_kept]

    def test_no_cartesian_join_and_identity_when_no_dups(self, spark):
        from search_engine_spark.ops.dedup import semdedup

        df = spark.createDataFrame(self._rows(), "id long, vec array<double>")
        out = semdedup(df, "id", "vec", n_clusters=2, threshold=0.999999,
                       train_sample=16, iters=4, seed=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # nothing above the near-1.0 threshold except exact re-scans of
        # the same vector never happen (ids are distinct) -> identity
        # minus the zero vector
        assert {r["id"] for r in out.collect()} == {1, 2, 3, 10, 11}

    def test_rejects_bad_clusters(self, spark):
        from search_engine_spark.ops.dedup import semdedup

        df = spark.createDataFrame(self._rows(), "id long, vec array<double>")
        with pytest.raises(ValueError):
            semdedup(df, "id", "vec", n_clusters=0)

    @staticmethod
    def _synth_corpus(n_singles, n_pairs, dim=32):
        """Deterministic pseudo-random unit-ish vectors: families share
        a base vector (md5-seeded sines), twins add 0.001 jitter.
        Random 32-dim directions have |cos| ~ 0.18, far under the 0.9
        threshold, so only planted twins are near-dups."""
        import hashlib
        import math

        def base(key):
            return [
                math.sin(int(hashlib.md5(
                    f"{key}|{j}".encode()
                ).hexdigest()[:15], 16) % 100_000)
                for j in range(dim)
            ]

        rows, pairs = [], []
        rid = 0
        for s in range(n_singles):
            rows.append((rid, base(f"s{s}")))
            rid += 1
        for p in range(n_pairs):
            v = base(f"p{p}")
            a, b = rid, rid + 1
            rows.append((a, v))
            rows.append((b, [
                x + 0.001 * math.sin(int(hashlib.md5(
                    f"j{p}|{j}".encode()
                ).hexdigest()[:15], 16) % 100_000)
                for j, x in enumerate(v)
            ]))
            pairs.append((a, b))
            rid += 2
        return rows, pairs

    def _check_planted(self, spark, n_singles, n_pairs, **kw):
        from search_engine_spark.ops.dedup import semdedup

        rows, pairs = self._synth_corpus(n_singles, n_pairs)
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        out = semdedup(df, "id", "vec", threshold=0.9, seed=7, **kw)
        res = out.collect()
        kept = {r["id"] for r in res}
        # every singleton survives (random directions never reach 0.9)
        assert set(range(n_singles)) <= kept
        # planted pairs collapse, modulo rare k-means cell splits
        split = sum(1 for a, b in pairs if a in kept and b in kept)
        assert all(a in kept or b in kept for a, b in pairs)
        assert split <= max(1, n_pairs // 10), f"{split}/{n_pairs} split"
        return res

    def test_auto_k_planted_dups_two_corpus_sizes(self, spark):
        """VERDICT r3 item 3: n_clusters=None derives k from corpus
        size.  Same generator at 60 and 240 rows, target cluster 30:
        auto-k 2 vs 8 — the larger corpus must actually use more
        cells (constant per-cell join cost), and planted dups must
        collapse at both sizes."""
        small = self._check_planted(
            spark, 50, 5, target_cluster_size=30, train_sample=256
        )
        large = self._check_planted(
            spark, 200, 20, target_cluster_size=30, train_sample=256
        )
        n_cells_small = len({r["_cell"] for r in small})
        n_cells_large = len({r["_cell"] for r in large})
        assert n_cells_small <= 2
        assert n_cells_large >= 4, (
            f"auto-k did not scale: {n_cells_large} cells at 240 rows"
        )

    def test_build_keep_matches_inline_and_prunes(self, spark, tmp_path):
        """semdedup_build persists the assignment partitionBy(_cell);
        keep() reproduces the inline result exactly, and a cell-scoped
        keep prunes every other partition at the scan (the
        PartitionFilters plan pin, mirroring the IVF index test)."""
        from search_engine_spark.ops.dedup import (
            semdedup,
            semdedup_build,
            semdedup_load,
        )

        rows, _ = self._synth_corpus(30, 10)
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        bdir = str(tmp_path / "semdedup")
        built = semdedup_build(
            df, "id", "vec", bdir, n_clusters=4, train_sample=256,
            seed=7,
        )
        inline = {
            (r["id"], r["_cell"], r["cent_cos"])
            for r in semdedup(
                df, "id", "vec", n_clusters=4, train_sample=256,
                threshold=0.9, seed=7,
            ).collect()
        }
        persisted = {
            (r["id"], r["_cell"], r["cent_cos"])
            for r in built.keep(0.9).collect()
        }
        assert inline == persisted
        # reload from disk: same result, no retraining
        again = {
            (r["id"], r["_cell"], r["cent_cos"])
            for r in semdedup_load(spark, bdir).keep(0.9).collect()
        }
        assert again == persisted
        # cell-scoped pass: the scan must carry a _cell PartitionFilter
        scoped = built.keep(0.9, cells=[0])
        plan = scoped._jdf.queryExecution().executedPlan().toString()
        filters = [
            seg.split("]", 1)[0]
            for seg in plan.split("PartitionFilters: [")[1:]
        ]
        assert filters, "no PartitionFilters in plan"
        assert any("_cell" in f for f in filters), filters
        # and the scoped result is the cell-0 slice of the full keep
        full_cell0 = {t for t in persisted if t[1] == 0}
        assert {
            (r["id"], r["_cell"], r["cent_cos"])
            for r in scoped.collect()
        } == full_cell0
        # cells may be a one-shot iterable (generator): consumed once
        gen = (c for c in [0])
        assert {
            (r["id"], r["_cell"], r["cent_cos"])
            for r in built.keep(0.9, cells=gen).collect()
        } == full_cell0

    def test_giant_cluster_worst_case_bounded(self, spark):
        """VERDICT r4 item 2: a degenerate embedding distribution (one
        giant near-identical cluster) must not recreate the O(n²) join
        inside one cell.  max_cell_size hash-splits the oversized cell:
        per-(cell,sub) cardinality is bounded, the giant duplicate
        family retains at most ceil(|c|/cap) survivors (vs exactly 1
        unbounded), every distinct row still survives, and the result
        is deterministic."""
        import math

        from search_engine_spark.ops.dedup import (
            _semdedup_assign,
            _semdedup_train,
            _subsplit_oversized,
            semdedup,
        )

        N_GIANT, CAP = 120, 30
        base = [math.sin(j * 0.7) for j in range(8)]
        rows = [
            (i, [x + 0.0005 * math.sin(i * 31 + j) for j, x in
                 enumerate(base)])
            for i in range(N_GIANT)
        ]
        # a few far-away distinct rows (orthogonal-ish axis)
        for s in range(5):
            rows.append((1000 + s,
                         [0.0] * 4 + [math.cos(s + j) for j in range(4)]))
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        kw = dict(n_clusters=2, train_sample=256, threshold=0.9, seed=3)

        unbounded = {r["id"] for r in semdedup(
            df, "id", "vec", max_cell_size=None, **kw).collect()}
        capped = {r["id"] for r in semdedup(
            df, "id", "vec", max_cell_size=CAP, **kw).collect()}
        giant_unbounded = {i for i in unbounded if i < 1000}
        giant_capped = {i for i in capped if i < 1000}
        # the giant family may share its cell with the distinct rows
        # (k-means chooses), so bound by the worst-case sub count of
        # the WHOLE corpus landing in one cell
        n_sub_bound = -(-len(rows) // CAP)
        assert len(giant_unbounded) == 1
        assert 1 <= len(giant_capped) <= n_sub_bound
        # distinct rows survive identically under both settings
        assert {i for i in unbounded if i >= 1000} == \
               {i for i in capped if i >= 1000}
        # the unbounded winner is among the capped survivors (it wins
        # its own sub-cell: domination order is unchanged within one)
        assert giant_unbounded <= giant_capped
        # determinism of the hash split
        again = {r["id"] for r in semdedup(
            df, "id", "vec", max_cell_size=CAP, **kw).collect()}
        assert again == capped

        # per-(cell, sub) cardinality bound on the split itself: each
        # oversized cell splits into exactly ceil(|c|/cap) hash
        # sub-cells, none carrying more than ~2× the cap (hash slack),
        # so one task's pair work is ~cap², not |c|²
        cent = _semdedup_train(df, "id", "vec", 2, 256, 5, 3,
                               target_cluster_size=5000)
        assigned = _semdedup_assign(df, "id", "vec", cent)
        cell_sizes = {
            r["_cell"]: r["count"]
            for r in assigned.groupBy("_cell").count().collect()
        }
        oversized = {c: n for c, n in cell_sizes.items() if n > CAP}
        assert oversized  # the giant family forces at least one
        sized = _subsplit_oversized(assigned, CAP)
        assert sized is not None
        counts = sized.groupBy("_cell", "_sub").count().collect()
        for c, n in oversized.items():
            groups = [r for r in counts if r["_cell"] == c]
            assert len(groups) == -(-n // CAP), (c, n, groups)
            assert all(r["count"] <= 2 * CAP for r in groups), groups

    def test_subsplit_noop_below_cap(self, spark):
        """No oversized cell -> _subsplit_oversized returns None and
        the keep plan stays the original single-key join (the contract
        entry's shape is unchanged by the cap)."""
        from search_engine_spark.ops.dedup import (
            _semdedup_assign,
            _semdedup_train,
            _subsplit_oversized,
        )

        rows, _ = self._synth_corpus(10, 3)
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        cent = _semdedup_train(df, "id", "vec", 4, 256, 5, 7,
                               target_cluster_size=5000)
        assigned = _semdedup_assign(df, "id", "vec", cent)
        assert _subsplit_oversized(assigned, 1000) is None
        with pytest.raises(ValueError):
            _subsplit_oversized(assigned, 0)

    def test_load_names_partial_build(self, spark, tmp_path):
        """assigned/ without meta.json (the commit marker, written
        last) is a crashed build — semdedup_load must say so, not
        raise a bare FileNotFoundError (ADVICE r4)."""
        import os

        from search_engine_spark.ops.dedup import semdedup_load

        bdir = str(tmp_path / "crashed")
        os.makedirs(os.path.join(bdir, "assigned"))
        with pytest.raises(ValueError, match="partial semdedup build"):
            semdedup_load(spark, bdir)
        # a plain missing dir still surfaces as the usual file error
        with pytest.raises(FileNotFoundError):
            semdedup_load(spark, str(tmp_path / "nowhere"))

    def test_embedding_lsh_rejects_foreign_index_meta(
        self, spark, tmp_path
    ):
        """index_dir meta recorded over different columns must refuse
        loudly — a silently wrong dim would NULL the planes and
        degrade the bucketed join to O(n^2)."""
        from search_engine_spark.ops.ann_index import ann_build
        from search_engine_spark.ops.dedup import (
            embedding_near_dup_pairs_lsh,
        )

        rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        idx_dir = str(tmp_path / "other")
        ann_build(
            df.withColumnRenamed("vec", "other_vec"),
            "id", "other_vec", idx_dir, kind="lsh", n_planes=4,
        )
        with pytest.raises(ValueError, match="wrong index"):
            embedding_near_dup_pairs_lsh(
                df, "id", "vec", index_dir=idx_dir
            )
