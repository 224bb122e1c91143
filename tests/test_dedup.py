"""Near-dup dedup clustering: connected components (transitive closure
over LSH pairs) and the one-survivor-per-cluster dedup operator."""

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
