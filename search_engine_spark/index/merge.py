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
    0. dedupes the batch by url (last write wins, like ES overwrite-by-
       id applied in order) and resolves num_buckets/block_size/fields
       from the index's persisted build_config — never from guesses
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

  Crash-safety protocol (plain parquet has no ACID appends — that is
  what the Iceberg table layer would buy; this is the honest parquet
  equivalent):
  - tombstone appends are unguarded: duplicates are harmless under
    anti-join semantics
  - posting/doc appends are bracketed by start/done manifest rows; a
    rerun that finds start-without-done REFUSES to continue and points
    at compact_index, which rebuilds postings from the authoritative
    (idempotent) tf stage tables
  - the stats step snapshots term_stats/corpus_stats/field_stats to
    <name>.premerge.<build_id> via rename before writing merged
    versions; a rerun re-derives from the snapshot, so df can never
    double-count

  compact_index(spark, index_dir, out_dir)
    rewrites the index without tombstoned docs: unions the base + delta
    tf stage tables, anti-joins tombstones, recomputes exact stats, and
    re-packs posting blocks — a fresh index whose ranking is identical
    to a from-scratch build over the surviving documents (doc_ids are
    preserved, scores exact; verified by tests/test_merge.py).  Also
    the universal repair for a merge that crashed mid-splice.

All filesystem probing goes through the Hadoop FileSystem API resolved
from the path (local / hdfs:// / s3a:// alike) — never os.path, which
only sees the driver's local disk.

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
from typing import Dict, List, Optional

from pyspark.errors import AnalysisException, ParseException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark import schemas
from search_engine_spark.index.builder import (
    IndexPaths,
    _Manifest,
    build_index,
    read_build_config,
    write_corpus_stats,
    write_term_stats,
)


@dataclass
class MergeResult:
    build_id: str
    delta_root: str
    new_docs: int
    tombstoned: int


# ---------------------------------------------------------------------------
# Hadoop-FS helpers (portable across local / hdfs / s3 index roots)
# ---------------------------------------------------------------------------


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    return Path(path).getFileSystem(conf), Path


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, Path = _hadoop(spark, path)
    return bool(fs.exists(Path(path)))


def _fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, Path = _hadoop(spark, src)
    fs.rename(Path(src), Path(dst))


def _fs_delete(spark: SparkSession, path: str, strict: bool = False) -> None:
    """Recursive delete via the Hadoop FileSystem API — works for
    local, hdfs:// and s3a:// roots alike (shutil.rmtree silently
    no-ops on remote URIs, which is exactly the stale-postings hazard
    builder.py's fresh-rebuild path must avoid).  strict=True raises
    if the path survives the delete instead of letting a later
    mode('append') write duplicate postings on top of stale ones."""
    fs, Path = _hadoop(spark, path)
    if fs.exists(Path(path)):
        ok = fs.delete(Path(path), True)
        if strict and (not ok or fs.exists(Path(path))):
            raise IOError(
                f"fresh-rebuild clearing failed to delete {path}; "
                "refusing to append over stale index artifacts"
            )


def _fs_subdirs(spark: SparkSession, path: str) -> List[str]:
    fs, Path = _hadoop(spark, path)
    if not fs.exists(Path(path)):
        return []
    out = []
    for st in fs.listStatus(Path(path)):
        if st.isDirectory():
            out.append(str(st.getPath().toString()))
    return sorted(out)


def _fs_has_parquet(spark: SparkSession, path: str) -> bool:
    fs, Path = _hadoop(spark, path)
    if not fs.exists(Path(path)):
        return False
    for st in fs.listStatus(Path(path)):
        if str(st.getPath().getName()).endswith(".parquet"):
            return True
    return False


# ---------------------------------------------------------------------------
# index-side views
# ---------------------------------------------------------------------------


def _deltas_root(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "deltas")


def delta_roots(spark: SparkSession, paths: IndexPaths) -> List[str]:
    return _fs_subdirs(spark, _deltas_root(paths))


def tombstones_path(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "tombstones")


def read_tombstones(spark: SparkSession, paths: IndexPaths) -> Optional[DataFrame]:
    if not _fs_has_parquet(spark, tombstones_path(paths)):
        return None
    return spark.read.schema(schemas.TOMBSTONES).parquet(tombstones_path(paths))


def live_docs(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """The docs table minus tombstoned rows — the live-document view."""
    docs = spark.read.schema(schemas.DOCS).parquet(paths.docs)
    tomb = read_tombstones(spark, paths)
    if tomb is None:
        return docs
    return docs.join(
        F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
    )


def _replace_dir(spark: SparkSession, tmp: str, dst: str) -> None:
    """Atomically-ish swap dst <- tmp via the Hadoop FileSystem API (so
    the same code path works on HDFS; on a local FS it's two renames)."""
    fs, Path = _hadoop(spark, dst)
    old = dst + ".old"
    if fs.exists(Path(old)):
        fs.delete(Path(old), True)
    if fs.exists(Path(dst)):
        fs.rename(Path(dst), Path(old))
    fs.rename(Path(tmp), Path(dst))
    if fs.exists(Path(old)):
        fs.delete(Path(old), True)


def _resolve_config(
    spark: SparkSession,
    paths: IndexPaths,
    num_buckets: Optional[int],
    block_size: Optional[int],
    index_fields: Optional[bool],
    index_positions: Optional[bool] = None,
):
    """Resolve build parameters from the index's persisted build_config.

    A bucket-count mismatch between base and delta silently loses
    results (delta blocks land in term_bucket partitions the query's
    pruning filter never scans), so explicit args that contradict the
    stored config are an error, not a preference."""
    cfg = read_build_config(paths.build_config)
    if cfg is None:
        # pre-config index: trust the caller (legacy path)
        from search_engine_spark.index.builder import (
            DEFAULT_BLOCK_SIZE,
            DEFAULT_NUM_BUCKETS,
        )

        return (
            num_buckets or DEFAULT_NUM_BUCKETS,
            block_size or DEFAULT_BLOCK_SIZE,
            bool(index_fields)
            if index_fields is not None
            else _fs_exists(spark, paths.field_stats),
            bool(index_positions)
            if index_positions is not None
            else _fs_exists(spark, paths.pos_postings),
            _fs_exists(spark, paths.shingle_stats),
        )
    for name, given, stored in (
        ("num_buckets", num_buckets, cfg["num_buckets"]),
        ("block_size", block_size, cfg["block_size"]),
        ("index_fields", index_fields, cfg["index_fields"]),
        ("index_positions", index_positions, cfg["index_positions"]),
    ):
        if given is not None and given != stored:
            raise ValueError(
                f"{name}={given} contradicts the index's build_config "
                f"({name}={stored}); a mismatched merge would silently "
                f"lose search results"
            )
    return (
        cfg["num_buckets"],
        cfg["block_size"],
        cfg["index_fields"],
        cfg["index_positions"],
        cfg.get("index_shingles", False),
    )


def merge_pages(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    num_buckets: Optional[int] = None,
    block_size: Optional[int] = None,
    num_partitions: Optional[int] = None,
    run_extraction: bool = True,
    build_id: Optional[str] = None,
    index_fields: Optional[bool] = None,
    index_positions: Optional[bool] = None,
) -> MergeResult:
    """Upsert a batch of pages into an existing index (A9/A10/A11).

    Re-crawled urls (batch url already in the docs table) replace their
    old document: the old doc_id is tombstoned, the new one indexed.
    A url appearing multiple times WITHIN the batch keeps only its
    latest version (warc_ts desc; deterministic tie-breaks) — ES
    overwrite-by-id applied in order keeps the last write too.
    num_buckets/block_size/index_fields are resolved from the index's
    persisted build_config; passing conflicting values raises.

    Resumable: pass an explicit build_id and a crashed merge can be
    re-run — completed sub-steps are skipped via manifest rows.  If a
    crash landed INSIDE a posting/doc append (start-without-done), the
    rerun refuses and points at compact_index, the universal repair.
    """
    paths = IndexPaths(index_dir)
    build_id = build_id or uuid.uuid4().hex[:12]
    man = _Manifest(spark, paths, build_id)
    num_buckets, block_size, index_fields, index_positions, _ = (
        _resolve_config(
            spark, paths, num_buckets, block_size, index_fields,
            index_positions,
        )
    )

    def step_state(step: str) -> Optional[str]:
        """'done' | 'start' | None for this build's sub-step."""
        try:
            from search_engine_spark.index.builder import read_parquet_table

            pdf = read_parquet_table(
                paths.manifest,
                columns=["stage", "status", "input_fingerprint"],
            ).to_pandas()
            mine = pdf[
                (pdf["stage"] == f"merge_{step}")
                & (pdf["input_fingerprint"] == build_id)
            ]
            if (mine["status"] == "done").any():
                return "done"
            if (mine["status"] == "start").any():
                return "start"
            return None
        except Exception:
            return None

    def guard_partial(step: str) -> None:
        if step_state(step) == "start":
            raise RuntimeError(
                f"merge {build_id}: a previous attempt crashed inside "
                f"the {step} append — the {step} table may hold a "
                f"partial delta. Plain parquet appends are not atomic; "
                f"rebuild a consistent index with compact_index(spark, "
                f"{index_dir!r}, <new_dir>) (it derives postings from "
                f"the authoritative tf stages), then retire this one."
            )

    # 0) batch-internal dedupe: last write per url wins (deterministic).
    w = Window.partitionBy("url").orderBy(
        F.desc_nulls_last("warc_ts"),
        F.desc(F.length(F.coalesce(F.col("text"), F.lit("")))),
        F.asc(F.xxhash64(F.coalesce(F.col("text"), F.lit("")))),
    )
    new_pages = (
        new_pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    base_docs = spark.read.schema(schemas.DOCS).parquet(paths.docs)
    max_row = base_docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    next_id = (int(max_row) if max_row is not None else -1) + 1

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
        index_positions=index_positions,
    )
    delta_docs = spark.read.schema(schemas.DOCS).parquet(delta.docs)
    n_new = delta_docs.count()

    # 2) tombstone old doc_ids of re-crawled urls.  Batch urls are tiny
    #    relative to the base — broadcast semi-join, no base shuffle.
    #    Unguarded append: duplicate tombstones are harmless (anti-join).
    n_tomb = 0
    if step_state("tombstones") != "done":
        tomb = (
            base_docs.join(
                F.broadcast(delta_docs.select("url").distinct()), "url", "left_semi"
            )
            .select("doc_id", "url")
            .withColumn("build_id", F.lit(build_id))
        )
        prior = read_tombstones(spark, paths)
        if prior is not None:
            tomb = tomb.join(
                F.broadcast(prior.select("doc_id")), "doc_id", "left_anti"
            )
        # persist: count + write must not each re-run the base-docs
        # semi-join (per-batch hot path)
        tomb = tomb.persist()
        try:
            n_tomb = tomb.count()
            if n_tomb:
                tomb.write.mode("append").parquet(tombstones_path(paths))
        finally:
            tomb.unpersist()
        man.mark_done("merge_tombstones", 0, n_tomb, 0, fingerprint=build_id)

    # 3) splice the delta into the base tables: postings append into the
    #    same term_bucket partition dirs; docs append.  start/done
    #    bracket: a crash inside the append is DETECTED, not silently
    #    double-applied (see module docstring).
    if step_state("postings") != "done":
        guard_partial("postings")
        man.mark("merge_postings", status="start", fingerprint=build_id)
        (
            spark.read.schema(schemas.POSTINGS).parquet(delta.postings)
            .write.mode("append").partitionBy("term_bucket")
            .parquet(paths.postings)
        )
        man.mark_done("merge_postings", 0, -1, 0, fingerprint=build_id)
    # positional blocks splice the same way — without it a merged index
    # would silently return phrase results missing every delta doc
    if index_positions and step_state("pos_postings") != "done":
        guard_partial("pos_postings")
        man.mark("merge_pos_postings", status="start", fingerprint=build_id)
        (
            spark.read.schema(schemas.POS_POSTINGS).parquet(delta.pos_postings)
            .write.mode("append").partitionBy("term_bucket")
            .parquet(paths.pos_postings)
        )
        man.mark_done("merge_pos_postings", 0, -1, 0, fingerprint=build_id)
    if step_state("docs") != "done":
        guard_partial("docs")
        man.mark("merge_docs", status="start", fingerprint=build_id)
        delta_docs.write.mode("append").parquet(paths.docs)
        man.mark_done("merge_docs", 0, n_new, 0, fingerprint=build_id)

    # 4) merged stats.  df/N keep counting tombstoned docs until
    #    compaction (Lucene docFreq semantics); max_score is NULLed —
    #    stale under the new corpus stats — so the query engine falls
    #    back to the merge-safe score(max_tf, min_dl) bound.
    #    Idempotent via premerge snapshots: the base stats are renamed
    #    aside FIRST; a crashed-and-rerun step always re-derives from
    #    the pristine snapshot, never from a half-merged table.
    if step_state("stats") != "done":
        pre_ts = paths.term_stats + f".premerge.{build_id}"
        pre_cs = paths.corpus_stats + f".premerge.{build_id}"
        pre_fs = paths.field_stats + f".premerge.{build_id}"
        if not _fs_exists(spark, pre_ts):
            _fs_rename(spark, paths.term_stats, pre_ts)
        if not _fs_exists(spark, pre_cs):
            _fs_rename(spark, paths.corpus_stats, pre_cs)
        if index_fields and not _fs_exists(spark, pre_fs) and _fs_exists(
            spark, paths.field_stats
        ):
            _fs_rename(spark, paths.field_stats, pre_fs)

        base_ts = spark.read.schema(schemas.TERM_STATS).parquet(pre_ts)
        delta_ts = spark.read.schema(schemas.TERM_STATS).parquet(delta.term_stats)
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
        write_term_stats(merged_ts, ts_tmp)
        _replace_dir(spark, ts_tmp, paths.term_stats)

        base_cs = spark.read.parquet(pre_cs).collect()[0]
        delta_cs = spark.read.parquet(delta.corpus_stats).collect()[0]
        n_docs = int(base_cs["n_docs"]) + int(delta_cs["n_docs"])
        total = int(base_cs["total_tokens"]) + int(delta_cs["total_tokens"])
        write_corpus_stats(
            paths.corpus_stats, n_docs, float(total) / max(n_docs, 1), total
        )
        if index_fields and _fs_exists(spark, delta.field_stats):
            merged_fs = (
                spark.read.parquet(pre_fs)
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
        man.mark_done("merge_stats", 0, -1, 0, fingerprint=build_id)
        for pre in (pre_ts, pre_cs, pre_fs):
            _fs_delete(spark, pre)

    man.mark_done("merge", 0, n_new, 0, nbytes=n_tomb, fingerprint=build_id)
    return MergeResult(build_id, delta_root, n_new, n_tomb)


def delete_pages(
    spark: SparkSession,
    index_dir: str,
    urls: Optional[List[str]] = None,
    predicate=None,
    build_id: Optional[str] = None,
) -> int:
    """Delete documents from a live index — the ES `DELETE /_doc/{id}`
    (exact urls) and `_delete_by_query` (docs-table predicate: domain,
    warc_ts, doclen...) surface, realized the Lucene way: matching LIVE
    docs are tombstoned, no segment is rewritten.  The query engine
    masks tombstoned docs from every mode at read time; corpus stats
    keep counting them (Lucene docFreq/docCount semantics — same
    staleness contract as merge_pages, documented there) until
    compact_index folds them out physically.

    Deleting an already-deleted url is a no-op (the match runs against
    the live-docs view), so retries are idempotent.  Returns the number
    of newly tombstoned docs; the manifest gets a `delete` row for
    lineage.
    """
    if (urls is None) == (predicate is None):
        raise ValueError("pass exactly one of urls / predicate")
    paths = IndexPaths(index_dir)
    build_id = build_id or uuid.uuid4().hex[:12]
    docs = live_docs(spark, paths)
    if urls is not None:
        if not urls:
            return 0
        target = spark.createDataFrame([(u,) for u in urls], "url string")
        hit = docs.join(F.broadcast(target), "url", "left_semi")
    else:
        hit = docs.filter(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )
    tomb = hit.select("doc_id", "url").withColumn(
        "build_id", F.lit(build_id)
    )
    # persist so the write doesn't RE-RUN the docs join/filter pipeline
    # after the count (this is the per-batch hot path); the no-op
    # delete still writes nothing
    tomb = tomb.persist()
    try:
        n = tomb.count()
        if n:
            tomb.write.mode("append").parquet(tombstones_path(paths))
    finally:
        tomb.unpersist()
    man = _Manifest(spark, paths, build_id)
    man.mark_done("delete", 0, n, 0, fingerprint=build_id)
    return n


@dataclass(frozen=True)
class UpdateResult:
    build_id: str
    matched: int      # live docs the query matched
    updated: int      # docs actually re-indexed (matched ∩ source)
    missing_source: int  # matched docs absent from source_pages
    merge: Optional[MergeResult]  # None when nothing matched


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    source_pages: DataFrame,
    script: Dict[str, object],
    urls: Optional[List[str]] = None,
    predicate=None,
    match_urls: Optional[DataFrame] = None,
    build_id: Optional[str] = None,
) -> UpdateResult:
    """Update documents in place — the ES `_update_by_query` surface
    (and `POST /_update/{id}` when `urls` pins exact documents).

    ES semantics reproduced exactly: every matching live document is
    re-indexed from its `_source` with the script applied — there is no
    cheaper in-segment mutation; ES pays a full per-doc reindex too.
    Our `_source` store is the caller's pages table (the reference
    keeps it in Postgres `pages` + re-crawls, schema.sql:4-17; its
    upsert-on-recrawl `ON CONFLICT (id) DO UPDATE`, indexer.py:277-291,
    is this operation driven by the crawler instead of a query).

    Match selection (exactly one of, or none for match_all):
    - `urls`: exact document list (ES `_update/{id}`)
    - `predicate`: docs-table predicate, same contract as delete_pages
    - `match_urls`: a DataFrame of urls from a full-text match — the
      DSL computes this from a `match` query via the ids-only pre-pass

    `script` assigns source columns: {column: sql-expr-or-Column},
    evaluated over the matched source rows (so `"lang": "'en'"` pins,
    `"html": "concat(html, ...)"` rewrites).  Only the source-of-truth
    columns {html, warc_ts, lang} are assignable: `url` IS the document
    id (ES likewise forbids `ctx._id` writes in _update_by_query) and
    `text` is derived from `html` by the extraction invariant (F1) —
    update `html` to change indexed content.

    Execution is ONE merge_pages batch: old doc_ids tombstoned, the
    rewritten rows indexed as a delta segment — crash-safe and
    rank-exact under the same contracts as any incremental merge.
    Matched docs whose url is missing from `source_pages` are counted
    in `missing_source` and skipped (ES reports per-doc failures the
    same way).
    """
    selectors = [s is not None for s in (urls, predicate, match_urls)]
    if sum(selectors) > 1:
        raise ValueError("pass at most one of urls / predicate / match_urls")
    if not script:
        raise ValueError("script must assign at least one column")
    bad = set(script) - {"html", "warc_ts", "lang"}
    if bad:
        raise ValueError(
            f"script may only assign source columns html/warc_ts/lang, "
            f"got {sorted(bad)} (url is the document id; text derives "
            f"from html — update html instead)"
        )
    paths = IndexPaths(index_dir)
    build_id = build_id or uuid.uuid4().hex[:12]
    docs = live_docs(spark, paths)
    if urls is not None:
        if not urls:
            return UpdateResult(build_id, 0, 0, 0, None)
        target = spark.createDataFrame([(u,) for u in urls], "url string")
        hit = docs.join(F.broadcast(target), "url", "left_semi")
    elif predicate is not None:
        hit = docs.filter(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )
    elif match_urls is not None:
        hit = docs.join(match_urls.select("url"), "url", "left_semi")
    else:
        hit = docs  # match_all
    # persist: matched-count, the source semi-join, and merge_pages all
    # re-read this frame — without it each action re-runs the live-docs
    # join/filter
    hit_urls = hit.select("url").persist()
    matched = hit_urls.count()
    if not matched:
        hit_urls.unpersist()
        return UpdateResult(build_id, 0, 0, 0, None)
    rows = source_pages.join(hit_urls, "url", "left_semi")
    # ONE try/finally owns the persisted frame: ANY failure below —
    # including non-analysis errors the typed-refusal translation does
    # not cover (bad script value types, missing source columns) —
    # must still release hit_urls, or the cached frame leaks executor
    # memory for the rest of the session
    try:
        try:
            updated_src = rows.withColumns(
                {
                    c: (F.expr(e) if isinstance(e, str) else e).cast(
                        dict(source_pages.dtypes)[c]
                    )
                    for c, e in script.items()
                }
            )
            # force analysis NOW: a malformed or unresolvable script
            # expression must refuse typed here (the documented
            # contract — ValueError naming the gap), not surface as a
            # raw Parse/AnalysisException deep inside the merge job
            updated_src.schema
        except (AnalysisException, ParseException) as e:
            raise ValueError(
                f"invalid _update_by_query script expression: {e}"
            ) from e
        n_src = updated_src.count()
        if not n_src:
            return UpdateResult(build_id, matched, 0, matched, None)
        res = merge_pages(
            spark, index_dir, updated_src, build_id=build_id
        )
    finally:
        hit_urls.unpersist()
    return UpdateResult(
        build_id, matched, res.new_docs, matched - res.new_docs, res
    )


def is_merged(spark: SparkSession, paths: IndexPaths) -> bool:
    """True if the index has ever taken an incremental merge (stats may
    be Lucene-style approximate; per-block bounds must be recomputed)."""
    try:
        from search_engine_spark.index.builder import read_parquet_table

        stages = (
            read_parquet_table(paths.manifest, columns=["stage"])
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
    num_buckets: Optional[int] = None,
    block_size: Optional[int] = None,
    bucket_groups: int = 1,
    num_partitions: Optional[int] = None,
) -> IndexPaths:
    """Fold tombstones out: write a fresh index over the live docs.

    Skips extraction/tokenization entirely — the surviving (doc_id,
    term, tf, dl) rows from the base and every delta are unioned,
    tombstones anti-joined, and only the stats + posting-block stages
    re-run (the manifest pre-marks docs/tf done, so build_index resumes
    straight into them).  Ranking over the compacted index is exact:
    same doc_ids, stats recomputed over exactly the live corpus.  Also
    repairs an index whose merge crashed mid-splice (the tf stages are
    the authoritative source; partially-appended postings are simply
    not read).
    """
    src = IndexPaths(index_dir)
    dst = IndexPaths(out_dir)
    build_id = uuid.uuid4().hex[:12]
    man = _Manifest(spark, dst, build_id)
    num_buckets, block_size, index_fields, index_positions, index_shingles = (
        _resolve_config(spark, src, num_buckets, block_size, None)
    )

    tf_parts = [src.tf_stage] + [
        IndexPaths(d).tf_stage for d in delta_roots(spark, src)
    ]
    tf = spark.read.parquet(*tf_parts)
    docs = live_docs(spark, src)
    tomb = read_tombstones(spark, src)
    if tomb is not None:
        tf = tf.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    tf.write.mode("overwrite").parquet(dst.tf_stage)
    # restore the doc_id-sorted layout (delta appends interleave id
    # ranges across files) — the query's O(k) join-back lookup relies
    # on per-file row-group min/max covering disjoint id ranges
    (
        docs.repartitionByRange(P, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(dst.docs)
    )
    n_live = spark.read.parquet(dst.docs).count()
    if index_positions or index_shingles:
        # the positional and shingle stages re-derive from the tokens
        # stage (tf rows carry neither) — union the base's and every
        # delta's token streams, drop tombstoned docs.  Carrying it for
        # shingles too keeps the phrase-suggester LM rebuildable on the
        # compacted index (build_shingle_stats reads tokens_stage).
        tok_parts = [src.tokens_stage] + [
            IndexPaths(d).tokens_stage for d in delta_roots(spark, src)
        ]
        toks = spark.read.parquet(*tok_parts)
        if tomb is not None:
            toks = toks.join(
                F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
            )
        toks.write.mode("overwrite").parquet(dst.tokens_stage)
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
        index_fields=index_fields,
        index_positions=index_positions,
        # a shingled source compacts to a shingled dest — dropping the
        # suggester LM on compaction would be silent data loss
        index_shingles=index_shingles,
    )


def reindex(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    predicate=None,
    num_buckets: Optional[int] = None,
    block_size: Optional[int] = None,
    bucket_groups: int = 1,
    num_partitions: Optional[int] = None,
    index_fields: Optional[bool] = None,
    index_positions: Optional[bool] = None,
    index_shingles: Optional[bool] = None,
) -> IndexPaths:
    """The ES `_reindex` API as a batch job: write a brand-new index at
    `out_dir` from the LIVE documents of `index_dir` (tombstones folded
    out, deltas merged), optionally restricted by a docs-table
    `predicate` (the reindex body's source.query) and with a DIFFERENT
    physical layout (dest-index settings): num_buckets / block_size may
    change freely — unlike merge/compact, the destination is a new
    index, so no layout contract binds it.

    Settings changes supported:
      index_fields False over a fielded source drops the namespaced
        title/description postings (reindex into a single-field dest);
        True over an unfielded source raises — field token streams were
        never materialized and reindex never re-extracts (ES likewise
        copies _source, it does not re-crawl).
      index_positions / index_shingles may be ENABLED even if the
        source lacked them — both derive from the source's tokens_stage,
        which every build materializes.

    Like compact_index, extraction/tokenization are skipped entirely:
    the surviving tf rows (semi-joined to the kept docs when a
    predicate is given) feed the stats + posting-block stages via the
    pre-marked manifest, so doc_ids are preserved and ranking over the
    new index is exact under its recomputed corpus stats."""
    src = IndexPaths(index_dir)
    dst = IndexPaths(out_dir)
    build_id = uuid.uuid4().hex[:12]
    man = _Manifest(spark, dst, build_id)
    cfg = read_build_config(src.build_config)
    if cfg is None:
        raise ValueError(f"no build_config under {index_dir}")
    num_buckets = int(num_buckets) if num_buckets else cfg["num_buckets"]
    block_size = int(block_size) if block_size else cfg["block_size"]
    dst_fields = cfg["index_fields"] if index_fields is None else bool(index_fields)
    if dst_fields and not cfg["index_fields"]:
        raise ValueError(
            "index_fields=True needs a fielded source index — reindex "
            "never re-extracts title/description token streams"
        )
    # like num_buckets/block_size/index_fields: omitted settings INHERIT
    # the source config — a reindex that silently dropped the source's
    # positional postings or suggester LM would break phrase queries on
    # the replacement index with no signal
    dst_positions = (
        bool(index_positions)
        if index_positions is not None
        else cfg["index_positions"]
    )
    dst_shingles = (
        bool(index_shingles)
        if index_shingles is not None
        else cfg.get("index_shingles", False)
    )

    tf_parts = [src.tf_stage] + [
        IndexPaths(d).tf_stage for d in delta_roots(spark, src)
    ]
    tf = spark.read.parquet(*tf_parts)
    docs = live_docs(spark, src)
    tomb = read_tombstones(spark, src)
    if tomb is not None:
        tf = tf.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")
    if predicate is not None:
        docs = docs.filter(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )
        kept = docs.select("doc_id")
        tf = tf.join(kept, "doc_id", "left_semi")
    if not dst_fields and cfg["index_fields"]:
        tf = tf.filter(~F.col("term").contains("!"))

    P = num_partitions or spark.sparkContext.defaultParallelism * 2
    tf.write.mode("overwrite").parquet(dst.tf_stage)
    (
        docs.repartitionByRange(P, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(dst.docs)
    )
    n_live = spark.read.parquet(dst.docs).count()
    if dst_positions or dst_shingles:
        tok_parts = [src.tokens_stage] + [
            IndexPaths(d).tokens_stage for d in delta_roots(spark, src)
        ]
        toks = spark.read.parquet(*tok_parts)
        if tomb is not None:
            toks = toks.join(
                F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti"
            )
        if predicate is not None:
            toks = toks.join(
                spark.read.parquet(dst.docs).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        toks.write.mode("overwrite").parquet(dst.tokens_stage)
    man.mark_done("docs", 0, n_live, 0, fingerprint="reindex:" + index_dir)
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
        index_fields=dst_fields,
        index_positions=dst_positions,
        index_shingles=dst_shingles,
    )
