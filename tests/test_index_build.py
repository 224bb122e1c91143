"""Index-build pipeline tests: checkpoint/resume convergence and the
per-stage metrics table (north rule: resumable from per-partition
checkpoints with lineage + metrics)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from search_engine_spark.index import builder as B
from search_engine_spark.index.builder import build_index
from search_engine_spark.synth import synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, 300).cache()


def _index_fingerprint(spark, root: str):
    """Order-insensitive content digest of the postings + docs tables."""
    post = (
        spark.read.parquet(os.path.join(root, "postings"))
        .select("term", "first_doc_id", "count", "block_max_score")
        .orderBy("term", "first_doc_id")
        .collect()
    )
    docs = spark.read.parquet(os.path.join(root, "docs")).count()
    return (docs, [tuple(r) for r in post])


def test_resume_skips_completed_and_converges(spark, pages, monkeypatch):
    """Kill the build mid-way (after the first posting bucket group),
    rerun with resume=True, and require the final index to equal a
    from-scratch build; completed stages must not recompute."""
    ref_dir = tempfile.mkdtemp(prefix="sgs_ref_")
    res_dir = tempfile.mkdtemp(prefix="sgs_res_")
    try:
        build_index(
            spark, pages, ref_dir, num_buckets=8, bucket_groups=4,
            num_partitions=4, run_extraction=False, resume=False,
        )

        # interrupted first attempt: die after bucket group 1 commits
        orig = B._Manifest.mark_done
        calls = {"blocks": 0}

        def dying(self, stage, pk, rows, wall_ms, nbytes=0, fingerprint=None):
            orig(self, stage, pk, rows, wall_ms, nbytes, fingerprint)
            if stage == "blocks":
                calls["blocks"] += 1
                if calls["blocks"] == 2:
                    raise RuntimeError("simulated executor loss")

        monkeypatch.setattr(B._Manifest, "mark_done", dying)
        with pytest.raises(RuntimeError, match="simulated"):
            build_index(
                spark, pages, res_dir, num_buckets=8, bucket_groups=4,
                num_partitions=4, run_extraction=False, resume=True,
            )
        monkeypatch.setattr(B._Manifest, "mark_done", orig)

        manifest = spark.read.parquet(os.path.join(res_dir, "manifest"))
        done_before = {
            (r["stage"], r["partition_key"])
            for r in manifest.filter(F.col("status") == "done").collect()
        }
        assert ("docs", 0) in done_before and ("blocks", 0) in done_before
        assert ("blocks", 3) not in done_before

        # resumed run completes the remaining groups only
        docs_mtime = os.path.getmtime(os.path.join(res_dir, "docs"))
        build_index(
            spark, pages, res_dir, num_buckets=8, bucket_groups=4,
            num_partitions=4, run_extraction=False, resume=True,
        )
        assert os.path.getmtime(os.path.join(res_dir, "docs")) == docs_mtime

        assert _index_fingerprint(spark, res_dir) == _index_fingerprint(
            spark, ref_dir
        )
    finally:
        shutil.rmtree(ref_dir, ignore_errors=True)
        shutil.rmtree(res_dir, ignore_errors=True)


def test_manifest_lineage_rows(spark, pages):
    out = tempfile.mkdtemp(prefix="sgs_man_")
    try:
        build_index(
            spark, pages, out, num_buckets=8, num_partitions=4,
            run_extraction=False, resume=False,
        )
        man = spark.read.parquet(os.path.join(out, "manifest"))
        stages = {r["stage"] for r in man.select("stage").distinct().collect()}
        assert {"docs", "tf", "stats", "blocks"} <= stages
        assert man.filter(F.col("wall_ms") < 0).count() == 0
        assert man.select("build_id").distinct().count() == 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_verify_extraction_invariant(spark, pages):
    """verify_extraction=True re-extracts html and requires byte-identity
    with the stored text column (north-rule per-row invariant); a
    corrupted text column must fail the build and leave a manifest row."""
    ok_dir = tempfile.mkdtemp(prefix="sgs_vx_")
    bad_dir = tempfile.mkdtemp(prefix="sgs_vxb_")
    try:
        build_index(
            spark, pages, ok_dir, num_buckets=8, num_partitions=4,
            run_extraction=True, verify_extraction=True, resume=False,
        )
        man = spark.read.parquet(os.path.join(ok_dir, "manifest"))
        vrow = man.filter(F.col("stage") == "extract_verify").collect()
        assert len(vrow) == 1 and vrow[0]["rows"] == 0

        corrupted = pages.withColumn(
            "text",
            F.when(F.col("url").endswith("/page/1"), F.lit("tampered"))
            .otherwise(F.col("text")),
        )
        with pytest.raises(Exception, match="byte-identity"):
            build_index(
                spark, corrupted, bad_dir, num_buckets=8, num_partitions=4,
                run_extraction=True, verify_extraction=True, resume=False,
            )
    finally:
        shutil.rmtree(ok_dir, ignore_errors=True)
        shutil.rmtree(bad_dir, ignore_errors=True)


def test_stage_metrics_collected_when_ui_enabled(spark, pages):
    """The collector must see shuffle bytes for the build's
    groupBy/repartition stages (conftest enables spark.ui)."""
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("spark.ui disabled in this environment")
    out = tempfile.mkdtemp(prefix="sgs_met_")
    try:
        build_index(
            spark, pages, out, num_buckets=8, num_partitions=4,
            run_extraction=False, resume=False, collect_metrics=True,
        )
        met = spark.read.parquet(os.path.join(out, "metrics"))
        assert met.count() > 0
        agg = met.agg(
            F.sum("shuffle_write_bytes").alias("sw"),
            F.sum("executor_run_time_ms").alias("rt"),
        ).collect()[0]
        assert agg["sw"] > 0 and agg["rt"] > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
