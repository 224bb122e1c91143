"""Deterministic synthetic Common-Crawl-style page corpus.

Every page is a pure function of its row index (seeded numpy RNG per
row), so generation is distributed (spark.range -> mapInPandas), order-
and partitioning-independent, and reproducible — no wall clock, no
network, no external data (FIXTURES.md §1).

The vocabulary mixes Zipf-distributed common words (to exercise hot-term
skew handling in the index build) with rare discriminative terms; HTML
wraps the body with <script>/<style>/<nav>/<footer>/<header>/<aside>
noise the extraction must drop.  The stored `text` column is produced by
the same `extract_content` the engine's Arrow UDF uses, so tests can
assert byte-identity across the distributed boundary.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator, List

import numpy as np
import pandas as pd

from search_engine_spark.schemas import PAGES
from search_engine_spark.text.extract import extract_content

SEED = 42

# ~120 content words over a few "topics" so queries have signal.
_TOPICS: List[List[str]] = [
    "python programming tutorial code function class variable loop module "
    "package library script developer software".split(),
    "machine learning model training data science neural network algorithm "
    "feature gradient tensor dataset prediction".split(),
    "quick brown fox jumps lazy dog forest animal river mountain valley "
    "trail hiking nature wildlife".split(),
    "search engine index query ranking relevance crawler document term "
    "frequency score retrieval corpus posting".split(),
    "database table row column transaction storage partition shuffle join "
    "aggregate filter sort merge spark cluster".split(),
    "web page html browser server request response cache header link "
    "domain protocol crawl fetch parse".split(),
]
_COMMON = (
    "the of and to in is was for with that this are have from they were "
    "time people year work world day way use make good new also its"
).split()

_DOMAINS = [
    "example.com", "docs.example.org", "blog.sample.net", "wiki.demo.io",
    "news.site.com", "dev.portal.org", "data.hub.net", "open.archive.org",
]

_EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _page_words(rng: np.random.RandomState, i: int) -> List[str]:
    topic = _TOPICS[int(rng.randint(0, len(_TOPICS)))]
    second = _TOPICS[int(rng.randint(0, len(_TOPICS)))]
    n = int(rng.randint(40, 400))
    words = []
    for _ in range(n):
        r = rng.rand()
        if r < 0.45:  # Zipf-ish common mass -> hot terms
            # Zipf over the common list
            k = min(int(rng.zipf(1.6)) - 1, len(_COMMON) - 1)
            words.append(_COMMON[k])
        elif r < 0.80:
            words.append(topic[int(rng.randint(0, len(topic)))])
        elif r < 0.95:
            words.append(second[int(rng.randint(0, len(second)))])
        else:  # rare discriminative token
            words.append(f"zq{int(rng.randint(0, 50000))}")
    # sprinkle punctuation / casing variety
    out = []
    for w in words:
        r = rng.rand()
        if r < 0.05:
            w = w.capitalize()
        if r > 0.97:
            w += ","
        out.append(w)
    return out


def make_page(i: int) -> dict:
    """Deterministic page #i -> dict matching the PAGES schema."""
    rng = np.random.RandomState((SEED * 1_000_003 + i) % (2**31 - 1))
    domain = _DOMAINS[i % len(_DOMAINS)]
    url = f"https://{domain}/page/{i}"
    words = _page_words(rng, i)

    # Adversarial rows at fixed indices (FIXTURES.md §1)
    mode = i % 101
    title = f"Page {i}: {' '.join(words[:4])}"
    desc = " ".join(words[4:12])
    if mode == 7:  # empty body
        body_html = ""
    elif mode == 13:  # html entities + punctuation-heavy
        body_html = "<p>Fish &amp; chips &lt;cost&gt; 5 &quot;pounds&quot; -- really?!</p>"
    elif mode == 29:  # digit tokens
        body_html = "<p>" + " ".join(str(int(rng.randint(0, 9999))) for _ in range(30)) + "</p>"
    elif mode == 47:  # >50k chars body (truncation boundary)
        body_html = "<p>" + " ".join(words * (60_000 // max(1, len(" ".join(words))) + 1)) + "</p>"
    else:
        paras = []
        k = 0
        while k < len(words):
            step = int(rng.randint(20, 60))
            paras.append("<p>" + " ".join(words[k : k + step]) + "</p>")
            k += step
        body_html = "\n".join(paras)

    title_tag = "" if mode == 31 else f"<title>{title}</title>"
    n_links = int(rng.randint(0, 8))
    links = [
        f'<a href="https://{_DOMAINS[int(rng.randint(0, len(_DOMAINS)))]}/page/{int(rng.randint(0, max(10, i + 50)))}">link</a>'
        for _ in range(n_links)
    ]
    html = (
        "<html><head>"
        f"{title_tag}"
        f'<meta name="description" content="{desc}">'
        "<style>body { color: #333; }</style>"
        "<script>var tracker = 'noise';</script>"
        "</head><body>"
        "<header>Site Header Navigation</header>"
        "<nav>home | about | contact</nav>"
        f"<h1>{title}</h1>"
        f"{body_html}"
        f"{''.join(links)}"
        "<aside>sidebar ads</aside>"
        "<footer>copyright footer</footer>"
        "</body></html>"
    )
    text = extract_content(html).text
    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=int(rng.randint(0, 365 * 24 * 3600))),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": "en",
    }


def synth_pages(spark, n_pages: int, num_partitions: int | None = None):
    """Distributed deterministic corpus: spark.range -> mapInPandas."""
    num_partitions = num_partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_page(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES.fields])

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES)
    )
