"""HTML -> (title, description, text) extraction.

Reference semantics (backend/crawler_service/crawler.py:333-361):
  - drop <script> <style> <nav> <footer> <header> <aside> subtrees
  - title  = text of first <title>, stripped
  - description = content attr of <meta name="description">, stripped
  - text   = body text with ' ' separators, whitespace collapsed
             (re.sub(r'\\s+', ' ')), truncated to 50,000 chars;
             falls back to whole-document text when no <body> exists

The reference uses BeautifulSoup(html, 'html.parser'); bs4 is not a
dependency here, so we implement the same extraction on the stdlib
html.parser.HTMLParser event stream.  Crucially, bs4's html.parser
backend uses THIS SAME tokenizer — the only behavior bs4 adds is tree
building, and the parts that matter here are small and public:

  * an end tag ``</x>`` pops the open-element stack down TO AND
    INCLUDING the nearest open ``x`` (``BeautifulSoup._popToTag``); an
    end tag with no matching open element is ignored.  So in
    ``<div><nav>a</div>b``, ``</div>`` closes the nav too and ``b`` is
    OUTSIDE the removed subtree (kept).
  * void elements (br/meta/img/...) never hold children.
  * decompose happens on the finished tree, so "first <title>" /
    "first matching <meta>" means first in post-decompose document
    order — a match inside a removed subtree does not count.
  * ``soup.find('body')`` / the no-body whole-doc fallback: the
    fallback text includes head/title text (everything in the tree).
  * ``get_text(strip=True)`` strips each string and joins the
    non-empty ones with the separator ('' for title, ' ' for text);
    comments/declarations/CDATA are not strings (bs4>=4.9) and are
    excluded.

These semantics are pinned by a differential test against an
independent mini-DOM oracle (tests/bs4_oracle.py) over an adversarial
fixture battery + property fuzzing (tests/test_extract_differential.py).

THE INVARIANT the engine must hold (BASELINE.json input_hint): the
distributed Arrow UDF output is byte-identical per url to this
function's output — both sides call `extract_content`, and tests assert
equality across the Spark boundary.

Pure stdlib, deterministic, safe to ship to executors.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, NamedTuple

import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
_REMOVED_TAGS = frozenset({"script", "style", "nav", "footer", "header", "aside"})
# HTML void elements never nest / close (subset relevant to depth tracking).
_VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)

MAX_TEXT_CHARS = 50_000  # crawler.py:361
MAX_TITLE_CHARS = 500  # indexer.py:227
MAX_DESC_CHARS = 1_000  # indexer.py:228


class Extracted(NamedTuple):
    title: str
    description: str
    text: str


class _Extractor(HTMLParser):
    """Single-pass event-stream equivalent of the bs4 pipeline.

    The open-element stack mirrors bs4's tree ancestry: because an
    element's ancestor chain is fixed at creation time (pops only ever
    shrink the stack), "is this text inside the removed/title/body
    subtree of the FINAL tree" is decidable online from the stack state
    at the moment the data event fires.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []  # open non-void elements
        self.removed_open = 0  # open _REMOVED_TAGS elements in stack
        self.title_idx = -1  # stack idx of the designated <title>, -1 = not open
        self.title_done = False
        self.title_parts: list[str] = []
        self.body_idx = -1
        self.body_done = False
        self.saw_body = False
        self.body_parts: list[str] = []
        self.all_parts: list[str] = []
        self.description = ""
        self.desc_done = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            # decompose-first: a meta inside a removed subtree never counts.
            # The FIRST meta[name=description] is designated even when it
            # has no content attr (soup.find returns it; the reference
            # then leaves description empty rather than trying the next).
            if tag == "meta" and not self.desc_done and not self.removed_open:
                d = dict(attrs)
                if d.get("name") == "description":
                    self.desc_done = True
                    if d.get("content"):
                        self.description = d["content"].strip()
            return
        if tag in _REMOVED_TAGS:
            self.removed_open += 1
        elif not self.removed_open:
            if tag == "title" and not self.title_done and self.title_idx < 0:
                self.title_idx = len(self.stack)
            elif tag == "body" and not self.body_done and self.body_idx < 0:
                self.body_idx = len(self.stack)
                self.saw_body = True
        self.stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        # bs4 _popToTag: pop to and including the nearest open `tag`;
        # ignore the end tag if nothing matches.
        stack = self.stack
        for i in range(len(stack) - 1, -1, -1):
            if stack[i] == tag:
                for name in stack[i:]:
                    if name in _REMOVED_TAGS:
                        self.removed_open -= 1
                if self.title_idx >= i:
                    self.title_idx = -1
                    self.title_done = True
                if self.body_idx >= i:
                    self.body_idx = -1
                    self.body_done = True
                del stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if self.removed_open:
            return
        stripped = data.strip()
        if not stripped:
            return
        if self.title_idx >= 0:
            self.title_parts.append(stripped)
        self.all_parts.append(stripped)
        if self.body_idx >= 0:
            self.body_parts.append(stripped)


def extract_content(html: str) -> Extracted:
    """Extract (title, description, text) from an HTML string.

    Mirrors crawler.py:333-361: removed subtrees, title/meta capture,
    title get_text(strip=True) (separator '', per-string strip), body
    get_text(separator=' ', strip=True), \\s+ collapse, [:50000];
    whole-document fallback (head text included) when no <body> exists.
    """
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed markup: keep whatever was parsed (bs4 is lenient too)

    title = "".join(p.title_parts)
    parts = p.body_parts if p.saw_body else p.all_parts
    text = _WS.sub(" ", " ".join(parts)).strip()
    return Extracted(title, p.description, text[:MAX_TEXT_CHARS])


def decode_html(html_bytes) -> str:
    """Shared html-column coercion (None/bytes/str) — the ONE place
    charset handling lives; the link extractor imports it too so both
    paths decode the same bytes identically."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, (bytes, bytearray)):
        return bytes(html_bytes).decode("utf-8", errors="replace")
    return str(html_bytes)


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: html:binary [+ passthrough cols] ->
    title/description/text columns appended.  Arrow-batched; per-row work
    is pure C-accelerated stdlib parsing, no JVM<->Python per-row churn.
    """
    for pdf in batches:
        ex = [extract_content(decode_html(h)) for h in pdf["html"]]
        out = pdf.drop(columns=["html"])
        out["title"] = [e.title[:MAX_TITLE_CHARS] for e in ex]
        out["description"] = [e.description[:MAX_DESC_CHARS] for e in ex]
        out["extracted_text"] = [e.text for e in ex]
        yield out


def extract_tokenize_batches(keep_text: bool = False):
    """mapInPandas factory fusing F1 extraction with the F2 tokenize+
    stem pipeline in ONE Arrow pass: html:binary [+ passthrough cols] ->
    title/description[/extracted_text]/tokens/doclen.

    Why fused Python instead of native column expressions for the
    stopword filter: the higher-order `filter(tokens, ...)` over a
    170-literal array_contains is interpreted (no codegen for HOF
    lambdas) and allocation-heavy — measured ~7 ms/doc CPU and
    memory-bandwidth-bound at local[32] (per-task time RISES with
    parallelism).  The fused pass costs ~2 ms/doc, stems via a
    per-worker cache (each distinct term stemmed once per worker), and
    drops two shuffles (vocabulary distinct + join) from the build.

    keep_text=False omits the (≤50 KB/row) extracted text from the
    Arrow output: shipping it across the JVM boundary just to drop it
    costs ~0.5 GB/100k docs of memory bandwidth — the scarce resource
    at high local core counts.  Pass True only when the caller needs
    the text (byte-identity verification).
    """
    from search_engine_spark.text.tokenizer import tokenize_py_cached

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stem_cache: dict = {}  # lives for the whole partition
        for pdf in batches:
            ex = [extract_content(decode_html(h)) for h in pdf["html"]]
            toks = [tokenize_py_cached(e.text, stem_cache) for e in ex]
            out = pdf.drop(columns=["html"])
            out["title"] = [e.title[:MAX_TITLE_CHARS] for e in ex]
            out["description"] = [e.description[:MAX_DESC_CHARS] for e in ex]
            if keep_text:
                out["extracted_text"] = [e.text for e in ex]
            out["tokens"] = toks
            out["doclen"] = [len(t) for t in toks]
            yield out

    return run


def tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: tokenize+stem a trusted `text` column (no html
    extraction) — the run_extraction=False build path."""
    from search_engine_spark.text.tokenizer import tokenize_py_cached

    stem_cache: dict = {}  # lives for the whole partition
    for pdf in batches:
        toks = [tokenize_py_cached(t or "", stem_cache) for t in pdf["text"]]
        out = pdf.drop(columns=["text"])
        out["tokens"] = toks
        out["doclen"] = [len(t) for t in toks]
        yield out


def extract_df(pages_df, keep=("url", "warc_ts", "lang", "text")):
    """pages(url, warc_ts, html, text, lang) -> extracted columns.

    Runs the extraction UDF over Arrow batches; keeps `text` (the stored
    column) alongside `extracted_text` so callers can assert the
    byte-identity invariant with a native comparison.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    in_fields = [f for f in pages_df.schema.fields if f.name in keep]
    schema = StructType(
        in_fields
        + [
            StructField("title", StringType()),
            StructField("description", StringType()),
            StructField("extracted_text", StringType()),
        ]
    )
    cols = [c for c in pages_df.columns if c in keep or c == "html"]
    return pages_df.select(*cols).mapInPandas(extract_batches, schema=schema)
