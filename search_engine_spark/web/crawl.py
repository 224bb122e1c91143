"""Batch crawl-wave simulator — the reference's crawl loop (§3.2)
re-expressed as deterministic DataFrame waves.

Reference: backend/crawler_service/crawler.py:487-559 (`crawl_url` +
`run`): pop the lowest-priority frontier url, mark it visited BEFORE
fetching (bloom add, crawler.py:495 — failed fetches stay visited),
fetch, extract/normalize/validate links (crawler.py:310-331 — done
inside our `page_links` Arrow pass), save ≤100 edges per page
(crawler.py:474-485), and, while depth < max_depth (crawler.py:509),
enqueue unvisited links at priority `_calculate_priority(link,
depth+1)` (crawler.py:434-458).

Batch re-expression: one WAVE = one `pop_batch(n)` (the reference's own
batch pop, crawler.py:146-153) processed as a single distributed job —
fetch is an equi-join against the pages table (the html is pre-fetched
per the input contract; a url absent from the table IS the failed
fetch).  Waves are inherently sequential (wave k's frontier depends on
wave k-1's links) exactly like the reference's loop; everything within
a wave is distributed.

Scale notes:
- The popped batch is ≤ batch_size rows → it BROADCASTS to the fetch
  join, so the 100-TB pages table is never shuffled; with the pages
  table bucketed/sorted by url the scan prunes to matching buckets.
- frontier / visited / edges are localCheckpoint'd each wave — the
  iterative anti-join lineage stays O(1) deep, same hygiene as
  graph/pagerank.py and ops/dedup.py.
- `orderBy(...).limit(n)` on the frontier compiles to
  TakeOrderedAndProject: per-partition top-n then a single merge, no
  global sort.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from search_engine_spark.web.links import (
    MAX_LINKS_PER_PAGE,
    frontier_add,
    page_links,
)
from search_engine_spark.web.urls import (
    crawl_priority_col,
    domain_col,
    is_valid_url,
    normalize_url,
    path_col,
    should_skip_url,
)

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("priority", DoubleType(), False),
        StructField("depth", IntegerType(), False),
    ]
)

MAX_DEPTH_DEFAULT = 3  # config.py crawler_max_depth default


def seed_frontier(spark: SparkSession, seed_urls: List[str]) -> DataFrame:
    """Seeds enter at priority 0.0, depth 0 (crawler.py:576-582, A5).

    Seeds take the SAME gate as discovered links (extract_links:
    normalize FIRST, then validate + skip-filter the NORMALIZED url —
    crawler.py pushes every url through this path before the
    frontier): a raw 'http://Example.com/a/' seed would never equi-join
    the canonical pages table, and the same page could be crawled twice
    under its raw and normalized keys.  Droppable seeds (invalid /
    skip-listed) simply never enter; callers that must answer per
    REQUESTED url (crawl_and_index) map their results separately."""
    seeds = set()
    for u in seed_urls:
        if not u:
            continue
        try:
            n = normalize_url(u)
        except ValueError:  # urlparse raises e.g. on unbalanced [ ]
            continue
        if is_valid_url(n) and not should_skip_url(n):
            seeds.add(n)
    rows = [(u, 0.0, 0) for u in sorted(seeds)]
    return spark.createDataFrame(rows, schema=FRONTIER_SCHEMA)


def _empty(spark: SparkSession, schema_ddl: str) -> DataFrame:
    return spark.createDataFrame([], schema_ddl)


def robots_block_cond(url, rules_domain, rules_prefix):
    """One disallow rule matches a url when the domain equals and the
    path starts with the rule's prefix — RobotFileParser's effective
    prefix-disallow semantics (crawler.py:164-208, A2) as columns.
    An EMPTY prefix never blocks: RobotFileParser treats a bare
    'Disallow:' line as allow-all, while startswith('') would have
    blocked the whole domain.  An empty URL path reads as '/' —
    RobotFileParser substitutes '/' for it, so 'Disallow: /' must
    block the bare root url too."""
    p = path_col(url)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return (
        (rules_prefix != "")
        & (domain_col(url) == rules_domain)
        & p.startswith(rules_prefix)
    )


def simulate_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seed_urls: List[str],
    waves: int = 3,
    batch_size: int = 50,
    max_depth: int = MAX_DEPTH_DEFAULT,
    robots: Optional[DataFrame] = None,
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Run `waves` crawl waves over the pre-fetched pages table.

    pages: (url, html, …) — the web, as the input contract delivers it.
    robots: optional (domain, path_prefix) DISALLOW rules — the batch
    analogue of RobotsChecker.can_fetch (crawler.py:164-208, 371-374,
    A2): the per-domain robots cache becomes a broadcast rules table;
    a blocked url behaves exactly like a failed fetch (already marked
    visited, yields no page/links/edges), matching `_fetch_page`
    returning None.  No rule for a domain = allowed (the reference is
    permissive on missing/unfetchable robots.txt).
    Returns (crawled, edges, frontier):
      crawled  (url, wave, fetched)  — popped urls per wave; fetched is
               False for frontier urls with no pages row (fetch failure
               — still marked visited, crawler.py:495) or blocked by
               robots.
      edges    (src, dst) distinct   — ≤100 links/page (A12).
      frontier (url, priority, depth) — remaining queue state.
    """
    frontier = seed_frontier(spark, seed_urls)
    visited = _empty(spark, "url string")
    crawled = _empty(spark, "url string, wave int, fetched boolean")
    edges = _empty(spark, "src string, dst string")

    for wave in range(int(waves)):
        # A4: priority-ordered pop (lowest first, url tie-break) of the
        # unvisited head.  TakeOrderedAndProject, then broadcast below.
        batch = (
            frontier.join(visited, "url", "left_anti")
            .orderBy(F.asc("priority"), F.asc("url"))
            .limit(int(batch_size))
            .localCheckpoint()  # pin the pop — reused 4× this wave
        )
        if batch.isEmpty():
            break  # frontier drained (run()'s stop condition)

        # mark visited before "fetching" (crawler.py:495)
        visited = visited.unionByName(batch.select("url")).localCheckpoint(
            eager=False
        )

        # A2: robots disallow as a broadcast anti-join — blocked urls
        # stay visited but fetch nothing (crawler.py:371-374).
        fetchable = batch
        if robots is not None:
            rules = robots.select(
                F.col("domain").alias("_rd"),
                F.col("path_prefix").alias("_rp"),
            )
            fetchable = batch.join(
                F.broadcast(rules),
                robots_block_cond(F.col("url"), F.col("_rd"), F.col("_rp")),
                "left_anti",
            )

        # A1 as a join: broadcast the tiny batch against the huge table.
        fetched = F.broadcast(fetchable).join(pages, "url", "inner")

        # F10 inside one Arrow pass; A12 edge cap; H1 distinct pairs.
        lk = page_links(fetched).localCheckpoint()  # reused 2× below
        new_edges = (
            lk.select(
                F.col("url").alias("src"),
                F.explode(F.slice("links", 1, MAX_LINKS_PER_PAGE)).alias(
                    "dst"
                ),
            )
            .dropDuplicates(["src", "dst"])
        )
        edges = (
            edges.unionByName(new_edges)
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=False)
        )

        fetched_urls = lk.select("url").withColumn("fetched", F.lit(True))
        crawled = crawled.unionByName(
            batch.select("url")
            .join(fetched_urls, "url", "left")
            .select(
                "url",
                F.lit(wave).alias("wave"),
                F.coalesce("fetched", F.lit(False)).alias("fetched"),
            )
        ).localCheckpoint(eager=False)

        # depth gate (crawler.py:509): only links found at depth <
        # max_depth spawn frontier entries, at depth+1 / F15 priority.
        spawning = batch.filter(F.col("depth") < int(max_depth))
        discovered = (
            lk.join(
                F.broadcast(spawning.select("url", "depth")), "url", "inner"
            )
            .select(
                F.explode("links").alias("url"),
                (F.col("depth") + 1).alias("depth"),
            )
            .groupBy("url")
            .agg(F.min("depth").alias("depth"))
            .join(visited, "url", "left_anti")
            .select(
                "url",
                crawl_priority_col(F.col("url"), F.col("depth")).alias(
                    "priority"
                ),
                "depth",
            )
        )

        # A5/H3: pop removes from the queue (ZREM), add keeps the best
        # (lowest) (priority, depth) per url atomically — the shared
        # frontier_add helper (links.py), ONE merge implementation.
        frontier = frontier_add(
            frontier.join(batch.select("url"), "url", "left_anti"),
            discovered,
        ).localCheckpoint()

    return crawled, edges, frontier


def crawl_and_index(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame,
    urls: List[str],
    follow_links: bool = False,
    max_depth: int = 1,
    batch_size: int = 50,
    robots: Optional[DataFrame] = None,
    job_id: Optional[str] = None,
) -> Tuple[DataFrame, Dict[str, object]]:
    """Instant crawl + index (POST /crawl-index, main.py:450-512,
    fetch_and_index_url 328-447): fetch the given urls (the batch
    equi-join against the pages table), optionally follow their links
    `max_depth` further waves, and UPSERT every fetched page into the
    existing index via merge_pages (A9 overwrite-by-id: a re-crawled
    url tombstones its old doc).  Extraction happens inside the merge's
    build pipeline — the same byte-identity path as a fresh build.

    Returns (results, job):
      results (url, success, title, error) — the reference's per-url
        CrawlResult rows; title comes from the index's docs table after
        the merge, error is 'fetch_failed' for urls with no pages row
        (or robots-blocked — the reference likewise folds every failure
        cause into one error string per url).
      job — the crawl_jobs[job_id] summary dict (main.py:520-551
        shape): status/total/completed/failed.
    """
    import uuid as _uuid

    from search_engine_spark.index.merge import merge_pages

    job_id = job_id or _uuid.uuid4().hex[:12]
    # the endpoint answers per REQUESTED url: map each requested string
    # to its canonical frontier key (None for invalid/skip-listed urls,
    # which never enter the crawl but still get a failure row)
    req = []
    for u in urls:
        key = None
        if u:
            try:
                n = normalize_url(u)
                if is_valid_url(n) and not should_skip_url(n):
                    key = n
            except ValueError:
                key = None
        req.append((u, key))

    waves = 1 + (int(max_depth) if follow_links else 0)
    # every requested url must be processed: a batch_size below the
    # seed count would leave the tail in the discarded frontier
    crawled, edges, _ = simulate_crawl(
        spark,
        pages,
        urls,
        waves=waves,
        batch_size=max(int(batch_size), len(urls)),
        max_depth=int(max_depth) if follow_links else 0,
        robots=robots,
    )
    crawled = crawled.localCheckpoint()  # reused: merge input + results
    fetched = crawled.filter(F.col("fetched")).select("url")
    batch = pages.join(F.broadcast(fetched), "url", "inner")
    n_fetched = fetched.count()

    def _docs_or_none():
        """docs table, or None ONLY for does-not-exist — any other
        read failure must raise, not masquerade as an empty index
        (routing a transient error to a fresh rebuild would destroy
        previously merged documents).  Existence is probed via the
        Hadoop FileSystem API (merge._fs_exists), not by parsing
        AnalysisException text: the PATH_NOT_FOUND error class is
        Spark-version-dependent (older releases say 'Path does not
        exist'), and a substring match would turn a fresh dir into a
        hard error on those versions (ADVICE r2)."""
        from search_engine_spark.index.merge import _fs_exists

        docs_path = index_dir.rstrip("/") + "/docs"
        if not _fs_exists(spark, docs_path):
            return None
        return spark.read.parquet(docs_path)

    if n_fetched:
        if _docs_or_none() is not None:
            res = merge_pages(spark, index_dir, batch, build_id=job_id)
            job_id = res.build_id  # the merge's resumable id
        else:
            # brand-new index dir: ES auto-creates the index on first
            # write — bootstrap with a fresh build over the batch,
            # stamped with the SAME job id for manifest correlation
            from search_engine_spark.index.builder import build_index

            build_index(spark, batch, index_dir, resume=False,
                        build_id=job_id)

    if _docs_or_none() is not None:
        # the LIVE view: a re-crawled url's old (tombstoned) doc row
        # must not produce a second result row for the same url
        from search_engine_spark.index.builder import IndexPaths
        from search_engine_spark.index.merge import live_docs

        docs = live_docs(spark, IndexPaths(index_dir)).select(
            "url", "title"
        )
    else:
        docs = _empty(spark, "url string, title string")
    # requested rows (keyed by the CALLER's url string, canonical key
    # joined underneath) + discovered rows from followed links
    req_df = spark.createDataFrame(req, "req_url string, url string")
    requested = (
        req_df.join(crawled, "url", "left")
        .select(
            F.col("req_url").alias("url"),
            F.coalesce(F.col("fetched"), F.lit(False)).alias("success"),
            F.col("url").alias("_key"),
        )
    )
    discovered = (
        crawled.join(
            F.broadcast(req_df.filter(F.col("url").isNotNull())
                        .select("url")),
            "url", "left_anti",
        )
        .select(
            "url",
            F.col("fetched").alias("success"),
            F.col("url").alias("_key"),
        )
    )
    results = (
        requested.unionByName(discovered)
        .join(
            docs.select(F.col("url").alias("_key"), "title"),
            "_key", "left",
        )
        .select(
            "url",
            "success",
            F.when(F.col("success"), F.col("title")).alias("title"),
            F.when(~F.col("success"), F.lit("fetch_failed")).alias("error"),
        )
        .orderBy("url")
        .localCheckpoint()
    )
    total = results.count()
    completed = results.filter(F.col("success")).count()
    job = {
        "job_id": job_id,
        "status": "completed",
        "total": total,
        "completed": completed,
        "failed": total - completed,
    }
    return results, job
