"""Link extraction (F10) and the link-graph / frontier tables (A12, A4/A5).

Reference: backend/crawler_service/crawler.py:310-331 extracts every
`<a href>` from a page with BeautifulSoup, skips blank / '#…' /
'javascript:' / 'mailto:' / 'tel:' hrefs, absolutizes with
urljoin(base, href), normalizes, validates, and de-dups via set() —
losing order.  We emit SORTED distinct links instead (determinism note
in SURVEY §7): same set, reproducible order.

The per-page edge sink (crawler.py:474-485, A12) caps at 100 links per
page and inserts ON CONFLICT DO NOTHING — here: slice(100) → explode →
dropDuplicates.

Spark shape: extraction runs inside the same Arrow `mapInPandas` pass as
text extraction can (stdlib HTMLParser, no per-row JVM↔Python churn);
the edge table is a plain (src, dst) DataFrame.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from search_engine_spark.text.extract import decode_html
from search_engine_spark.web.urls import (
    is_valid_url,
    normalize_url,
    should_skip_url,
)

MAX_LINKS_PER_PAGE = 100  # crawler.py:481

_SKIP_PREFIXES = ("#", "javascript:", "mailto:", "tel:")  # crawler.py:318


class _HrefCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        for k, v in attrs:
            if k == "href" and v is not None:
                self.hrefs.append(v)
                return


def extract_links(html: str, base_url: str) -> List[str]:
    """Python extractor — crawler.py:310-331 semantics, sorted output."""
    p = _HrefCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    out = set()
    for href in p.hrefs:
        href = href.strip()
        if not href or href.startswith(_SKIP_PREFIXES):
            continue
        try:
            absolute = urljoin(base_url, href)
            normalized = normalize_url(absolute)
        except ValueError:
            # urlparse raises on e.g. unbalanced IPv6 brackets — one
            # hostile href must not kill the whole Arrow batch
            continue
        if is_valid_url(normalized) and not should_skip_url(normalized):
            out.add(normalized)
    return sorted(out)


def _links_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "links": [
                    extract_links(decode_html(h), u)
                    for u, h in zip(pdf["url"], pdf["html"])
                ],
            }
        )


_LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("links", ArrayType(StringType()), False),
    ]
)


def page_links(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) -> (url, links: array<string>), Arrow-batched."""
    return pages.select("url", "html").mapInPandas(_links_batches, _LINKS_SCHEMA)


def edges_from_pages(pages: DataFrame) -> DataFrame:
    """Link-graph edge table (A12): ≤100 links/page, distinct (src, dst).

    Scale note: `dropDuplicates` on (src, dst) is the one shuffle; hub
    pages (huge in-degree dst) are fine — dedup is keyed on the pair.
    """
    return (
        page_links(pages)
        .select(
            F.col("url").alias("src"),
            F.explode(F.slice("links", 1, MAX_LINKS_PER_PAGE)).alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )


def restrict_edges_to_known_pages(edges: DataFrame, pages: DataFrame) -> DataFrame:
    """Both-endpoints semi-join (pagerank.py:89-112, C2/A13)."""
    urls = pages.select(F.col("url"))
    return (
        edges.join(urls, edges.src == urls.url, "left_semi")
        .join(urls, F.col("dst") == urls.url, "left_semi")
    )


def frontier_pop_batch(frontier: DataFrame, n: int) -> DataFrame:
    """Priority-ordered frontier pop (crawler.py:137-153, A4/G5):
    lowest priority first, deterministic tie-break on url."""
    return frontier.orderBy(F.asc("priority"), F.asc("url")).limit(n)


def frontier_add(frontier: DataFrame, new_urls: DataFrame) -> DataFrame:
    """Frontier insert (crawler.py:127-135, A5/H3): union + de-dup,
    keeping the lowest-priority entry per url (ZADD keeps latest; min
    is the deterministic batch equivalent).  The winning entry's depth
    rides along in one min(struct) — a frontier row is (url, priority,
    depth) per FRONTIER_SCHEMA, and dropping depth here forced
    crawl.py to re-implement the merge inline."""
    merged = (
        frontier.unionByName(new_urls)
        .groupBy("url")
        .agg(F.min(F.struct("priority", "depth")).alias("_w"))
    )
    return merged.select(
        "url", F.col("_w.priority").alias("priority"),
        F.col("_w.depth").alias("depth"),
    )
