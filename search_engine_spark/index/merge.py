"""Incremental index maintenance: batch upsert, tombstones, compaction.

Reference parity: the indexer service continuously overwrites documents
by id = sha256(url) — single upsert `es.index(id=..., doc)` at
backend/indexer_service/indexer.py:236-247, bulk at indexer.py:249-271,
and Postgres `INSERT ... ON CONFLICT (id) DO UPDATE` at
indexer.py:273-293.  Lucene realizes overwrite-by-id as: tombstone the
old doc in its segment's deleted-docs bitmap, append the new doc in a
fresh segment, and fold tombstones out at segment merge.  This module
mirrors that shape Spark-first:

  merge_pages(spark, index_dir, new_pages)
    1. builds a DELTA index of the batch under <root>/deltas/<build_id>
       with doc_ids offset above the base index's max (ids never collide)
    2. appends the delta's posting blocks into the base postings table —
       sound because the query engine aggregates contributions per
       doc_id across any number of block runs per term, so base and
       delta blocks coexist like Lucene segments
    3. tombstones the OLD doc_ids of re-crawled urls (semi-join of base
       docs against the batch's urls) into <root>/tombstones
    4. merges term_stats (df summed, max_tf max-of-max, min_dl
       min-of-min; max_score set NULL — it was exact only under the old
       corpus stats) and corpus_stats (counts/sums add)

  Post-merge semantics match Lucene's: document frequency and N still
  count tombstoned docs until compaction (Lucene's docFreq/docCount do
  the same for deleted docs), so scores drift slightly from a fresh
  rebuild until compact_index() — but top-k never *returns* a
  tombstoned doc (the query engine anti-joins them), and WAND pruning
  stays exact because per-block upper bounds are recomputed from
  (max_tf, min_dl) under the current stats at query time
  (query/bm25.py), never read from stale block_max_score.

  compact_index(spark, index_dir, out_dir)
    rewrites the index without tombstoned docs: unions the base + delta
    tf stage tables, anti-joins tombstones, recomputes exact stats, and
    re-packs posting blocks — a fresh index whose ranking is identical
    to a from-scratch build over the surviving documents (doc_ids are
    preserved, scores exact; verified by tests/test_merge.py).

Scale notes (10^12 docs): the only per-merge work is proportional to
the BATCH (delta build + one semi-join against base docs on url — a
shuffle-free broadcast join for typical batch sizes) plus a union-
aggregate over the two small stats tables.  Nothing rewrites the base
postings until compaction, which is the same stats+blocks pipeline as a
full build minus extraction/tokenization (the dominant cost).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import schemas
from search_engine_spark.index.builder import (
    DEFAULT_BLOCK_SIZE,
    DEFAULT_NUM_BUCKETS,
    IndexPaths,
    _Manifest,
    build_index,
    write_corpus_stats,
)


@dataclass
class MergeResult:
    build_id: str
    delta_root: str
    new_docs: int
    tombstoned: int


def _deltas_root(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "deltas")


def delta_roots(paths: IndexPaths) -> List[str]:
    root = _deltas_root(paths)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )


def tombstones_path(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "tombstones")


def has_tombstones(paths: IndexPaths) -> bool:
    p = tombstones_path(paths)
    return os.path.isdir(p) and any(
        f.endswith(".parquet") for f in os.listdir(p)
    )


def read_tombstones(spark: SparkSession, paths: IndexPaths) -> Optional[DataFrame]:
    if not has_tombstones(paths):
        return None
    return spark.read.schema(schemas.TOMBSTONES).parquet(tombstones_path(paths))


def live_docs(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """The docs table minus tombstoned rows — the live-document view."""
    docs = spark.read.parquet(paths.docs)
    tomb = read_tombstones(spark, paths)
    if tomb is None:
        return docs
    return docs.join(
        F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
    )


def _replace_dir(spark: SparkSession, tmp: str, dst: str) -> None:
    """Atomically-ish swap dst <- tmp via the Hadoop FileSystem API (so
    the same code path works on HDFS; on a local FS it's two renames)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(dst).getFileSystem(conf)
    old = dst + ".old"
    if fs.exists(Path(old)):
        fs.delete(Path(old), True)
    if fs.exists(Path(dst)):
        fs.rename(Path(dst), Path(old))
    fs.rename(Path(tmp), Path(dst))
    if fs.exists(Path(old)):
        fs.delete(Path(old), True)


def merge_pages(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    num_partitions: Optional[int] = None,
    run_extraction: bool = True,
    build_id: Optional[str] = None,
    index_fields: Optional[bool] = None,
) -> MergeResult:
    """Upsert a batch of pages into an existing index (A9/A10/A11).

    Re-crawled urls (batch url already in the docs table) replace their
    old document: the old doc_id is tombstoned, the new one indexed.
    num_buckets/block_size must match the base build (the delta's
    posting blocks land in the same term_bucket partition layout).

    Resumable like the build itself: pass an explicit build_id and a
    crashed merge can be re-run — each splice sub-step writes its own
    manifest row (stage "merge_<step>", fingerprint build_id) and a
    rerun skips completed steps, so delta blocks are never appended
    twice.  With a fresh random build_id every call is a new merge.
    """
    paths = IndexPaths(index_dir)
    build_id = build_id or uuid.uuid4().hex[:12]
    man = _Manifest(spark, paths, build_id)
    # fielded base index -> fielded delta (unless caller overrides)
    if index_fields is None:
        index_fields = os.path.isdir(paths.field_stats)

    def step_done(step: str) -> bool:
        try:
            import pyarrow.dataset as pads

            pdf = (
                pads.dataset(paths.manifest, format="parquet")
                .to_table(columns=["stage", "status", "input_fingerprint"])
                .to_pandas()
            )
            return bool(
                (
                    (pdf["stage"] == f"merge_{step}")
                    & (pdf["status"] == "done")
                    & (pdf["input_fingerprint"] == build_id)
                ).any()
            )
        except Exception:
            return False

    base_docs = spark.read.parquet(paths.docs)
    next_id = int(
        base_docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    ) + 1

    # 1) delta build (its own full IndexPaths tree; extraction/tokenize/
    #    tf/stats/blocks all batch-local, ids offset past the base).
    #    Internally resumable via its own manifest under delta_root.
    delta_root = os.path.join(_deltas_root(paths), build_id)
    delta = build_index(
        spark,
        new_pages,
        delta_root,
        num_buckets=num_buckets,
        block_size=block_size,
        num_partitions=num_partitions,
        resume=True,
        build_id=build_id,
        run_extraction=run_extraction,
        id_offset=next_id,
        index_fields=index_fields,
    )
    delta_docs = spark.read.parquet(delta.docs)
    n_new = delta_docs.count()

    # 2) tombstone old doc_ids of re-crawled urls.  Batch urls are tiny
    #    relative to the base — broadcast semi-join, no base shuffle.
    n_tomb = 0
    if not step_done("tombstones"):
        tomb = (
            base_docs.join(
                F.broadcast(delta_docs.select("url").distinct()), "url", "left_semi"
            )
            .select("doc_id", "url")
            .withColumn("build_id", F.lit(build_id))
        )
        # Exclude docs already tombstoned by a previous merge (idempotence).
        prior = read_tombstones(spark, paths)
        if prior is not None:
            tomb = tomb.join(
                F.broadcast(prior.select("doc_id")), "doc_id", "left_anti"
            )
        n_tomb = tomb.count()
        if n_tomb:
            tomb.write.mode("append").parquet(tombstones_path(paths))
        man.mark_done("merge_tombstones", 0, n_tomb, 0, fingerprint=build_id)

    # 3) splice the delta into the base tables: postings append into the
    #    same term_bucket partition dirs; docs append.
    if not step_done("postings"):
        (
            spark.read.schema(schemas.POSTINGS).parquet(delta.postings)
            .write.mode("append").partitionBy("term_bucket")
            .parquet(paths.postings)
        )
        man.mark_done("merge_postings", 0, -1, 0, fingerprint=build_id)
    if not step_done("docs"):
        delta_docs.write.mode("append").parquet(paths.docs)
        man.mark_done("merge_docs", 0, n_new, 0, fingerprint=build_id)

    # 4) merged stats.  df/N keep counting tombstoned docs until
    #    compaction (Lucene docFreq semantics); max_score is NULLed —
    #    stale under the new corpus stats — so the query engine falls
    #    back to the merge-safe score(max_tf, min_dl) bound.
    if not step_done("stats"):
        base_ts = spark.read.parquet(paths.term_stats)
        delta_ts = spark.read.parquet(delta.term_stats)
        merged_ts = (
            base_ts.unionByName(delta_ts)
            .groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.lit(None).cast("double").alias("max_score"),
                F.first("term_bucket").alias("term_bucket"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_dl").alias("min_dl"),
            )
            .select("term", "df", "max_score", "term_bucket", "max_tf", "min_dl")
        )
        ts_tmp = paths.term_stats + ".tmp"
        merged_ts.write.mode("overwrite").parquet(ts_tmp)
        _replace_dir(spark, ts_tmp, paths.term_stats)

        base_cs = spark.read.parquet(paths.corpus_stats).collect()[0]
        delta_cs = spark.read.parquet(delta.corpus_stats).collect()[0]
        n_docs = int(base_cs["n_docs"]) + int(delta_cs["n_docs"])
        total = int(base_cs["total_tokens"]) + int(delta_cs["total_tokens"])
        write_corpus_stats(
            paths.corpus_stats, n_docs, float(total) / max(n_docs, 1), total
        )
        if index_fields and os.path.isdir(delta.field_stats):
            merged_fs = (
                spark.read.parquet(paths.field_stats)
                .unionByName(spark.read.parquet(delta.field_stats))
                .groupBy("field")
                .agg(F.sum("total_tokens").alias("total_tokens"))
                .withColumn("n_docs", F.lit(n_docs).cast("long"))
                .withColumn(
                    "avgdl",
                    F.col("total_tokens") / F.greatest(F.lit(1), F.col("n_docs")),
                )
                .select("field", "n_docs", "avgdl", "total_tokens")
            )
            fs_tmp = paths.field_stats + ".tmp"
            merged_fs.write.mode("overwrite").parquet(fs_tmp)
            _replace_dir(spark, fs_tmp, paths.field_stats)
        # NOT crash-atomic across the two small stat tables; the window
        # is two driver-side writes.  A crash exactly between them is
        # healed by compact_index (recomputes both exactly); term_stats
        # itself can't double-merge because this step is guarded.
        man.mark_done("merge_stats", 0, -1, 0, fingerprint=build_id)

    man.mark_done("merge", 0, n_new, 0, nbytes=n_tomb, fingerprint=build_id)
    return MergeResult(build_id, delta_root, n_new, n_tomb)


def is_merged(spark: SparkSession, paths: IndexPaths) -> bool:
    """True if the index has ever taken an incremental merge (stats may
    be Lucene-style approximate; per-block bounds must be recomputed)."""
    try:
        import pyarrow.dataset as pads

        stages = (
            pads.dataset(paths.manifest, format="parquet")
            .to_table(columns=["stage"])
            .column("stage")
            .to_pylist()
        )
        return "merge" in stages
    except Exception:
        return False


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_groups: int = 1,
    num_partitions: Optional[int] = None,
) -> IndexPaths:
    """Fold tombstones out: write a fresh index over the live docs.

    Skips extraction/tokenization entirely — the surviving (doc_id,
    term, tf, dl) rows from the base and every delta are unioned,
    tombstones anti-joined, and only the stats + posting-block stages
    re-run (the manifest pre-marks docs/tf done, so build_index resumes
    straight into them).  Ranking over the compacted index is exact:
    same doc_ids, stats recomputed over exactly the live corpus.
    """
    src = IndexPaths(index_dir)
    dst = IndexPaths(out_dir)
    build_id = uuid.uuid4().hex[:12]
    man = _Manifest(spark, dst, build_id)

    tf_parts = [src.tf_stage] + [
        IndexPaths(d).tf_stage for d in delta_roots(src)
    ]
    tf = spark.read.parquet(*tf_parts)
    docs = live_docs(spark, src)
    tomb = read_tombstones(spark, src)
    if tomb is not None:
        tf = tf.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")

    tf.write.mode("overwrite").parquet(dst.tf_stage)
    docs.write.mode("overwrite").parquet(dst.docs)
    n_live = spark.read.parquet(dst.docs).count()
    man.mark_done("docs", 0, n_live, 0, fingerprint="compact:" + index_dir)
    man.mark_done("tf", 0, -1, 0)

    return build_index(
        spark,
        None,
        out_dir,
        num_buckets=num_buckets,
        block_size=block_size,
        bucket_groups=bucket_groups,
        num_partitions=num_partitions,
        resume=True,
        build_id=build_id,
        # the compacted tf table already carries namespaced field terms;
        # this just re-derives exact field_stats for the live corpus
        index_fields=os.path.isdir(src.field_stats),
    )
