"""Three-way agreement of the BM25 implementations (index/scoring.py):
pure-Python scalar, numpy (block packer / WAND), and Spark Column —
plus the DuckDB SQL rendering.  A drift here corrupts block-max pruning
silently, so they are pinned against each other to 1e-9."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.index.scoring import (
    B,
    K1,
    idf_col,
    idf_np,
    idf_py,
    saturation_col,
    score_col,
    score_np,
    score_py,
    score_sql,
)

CASES = [
    # (tf, dl, df, n_docs, avgdl)
    (1, 10, 1, 3, 12.0),
    (3, 25, 2, 100, 20.5),
    (7, 500, 40, 1000, 133.7),
    (1, 1, 999, 1000, 50.0),
    (120, 50000, 1, 10**9, 420.0),
]


def test_py_vs_np():
    for tf, dl, df, n, avgdl in CASES:
        a = score_py(tf, dl, idf_py(n, df), avgdl)
        b = float(
            score_np(
                np.array([tf]), np.array([dl]), idf_np(n, np.array([df])), avgdl
            )[0]
        )
        assert abs(a - b) < 1e-9


def test_py_vs_spark_col(spark):
    rows = [(float(tf), float(dl), float(df)) for tf, dl, df, _, _ in CASES]
    for (tf, dl, df, n, avgdl), (ctf, cdl, cdf) in zip(CASES, rows):
        got = (
            spark.range(1)
            .select(
                score_col(
                    F.lit(ctf), F.lit(cdl), idf_col(n, F.lit(cdf)), avgdl
                ).alias("s")
            )
            .collect()[0]["s"]
        )
        assert abs(got - score_py(tf, dl, idf_py(n, df), avgdl)) < 1e-9


def test_saturation_times_idf_is_score(spark):
    for tf, dl, df, n, avgdl in CASES:
        got = (
            spark.range(1)
            .select(
                (
                    idf_col(n, F.lit(float(df)))
                    * saturation_col(F.lit(float(tf)), F.lit(float(dl)), avgdl)
                ).alias("s")
            )
            .collect()[0]["s"]
        )
        assert abs(got - score_py(tf, dl, idf_py(n, df), avgdl)) < 1e-9


def test_py_vs_duckdb_sql():
    con = duckdb.connect()
    for tf, dl, df, n, avgdl in CASES:
        expr = score_sql(str(tf), str(dl), str(df), str(n), repr(avgdl))
        got = con.execute(f"SELECT {expr} AS s").fetchone()[0]
        assert abs(got - score_py(tf, dl, idf_py(n, df), avgdl)) < 1e-9


def test_lucene_default_constants():
    # SURVEY.md §3.1 step 5: reference never configures similarity ->
    # Lucene defaults
    assert K1 == 1.2 and B == 0.75
    # idf form: ln(1 + (N - df + 0.5)/(df + 0.5)), always > 0
    assert idf_py(3, 3) == pytest.approx(math.log(1 + 0.5 / 3.5))
    assert idf_py(10**12, 10**12) > 0
