"""URL operators — normalize / validate / skip-filter / priority / domain.

Reference semantics (all Python urlparse-based):
  - normalize   backend/crawler_service/crawler.py:284-308
  - should-skip backend/crawler_service/crawler.py:255-282 (B1)
  - is-valid    backend/shared/utils.py:33-40 (B2)
  - priority    backend/crawler_service/crawler.py:434-458 (F15)
  - domain      backend/shared/utils.py:26-30 (F11; keeps the port)

Spark-first: every operator exists as a NATIVE Column expression (regex
on the JVM, inside whole-stage codegen — at 10^12 URLs a per-row Python
urlparse would be the bottleneck) plus a DuckDB-SQL twin generated from
the same regex constants so the driver's oracle gate can diff them, plus
a plain-Python twin (used by the link extractor, which needs urljoin
anyway, and by tests as the reference-fidelity oracle).

Known deviation from urlparse (documented, tested): RFC-2396 ;params on
a trailing path segment are treated as part of the path, so a URL like
`http://x/a/;p` keeps its trailing-slash-stripping behavior slightly
differently.  No corpus URL uses ;params.
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared regex constants (Java regex ∩ RE2-compatible subset).
_RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_NETLOC = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RE_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"  # path+query, no fragment
_RE_FRAGMENT = r"#(.+)$"

SKIP_EXTENSIONS = [
    # crawler.py:255-263 (30 extensions)
    "jpg", "jpeg", "png", "gif", "svg", "webp", "ico",
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx",
    "zip", "rar", "tar", "gz", "7z",
    "mp3", "mp4", "avi", "mov", "wmv",
    "css", "js", "json", "xml",
    "exe", "dmg", "apk",
]
_RE_SKIP_EXT = r"\.(" + "|".join(SKIP_EXTENSIONS) + r")$"


# ---------------------------------------------------------------------------
# native Column expressions
# ---------------------------------------------------------------------------


def scheme_col(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _RE_SCHEME, 1))


def netloc_col(url: Column) -> Column:
    """Authority incl. port — urlparse .netloc (utils.py:26-30 keeps it)."""
    return F.regexp_extract(url, _RE_NETLOC, 1)


def path_query_col(url: Column) -> Column:
    return F.regexp_extract(url, _RE_REST, 1)


def path_col(url: Column) -> Column:
    return F.regexp_extract(path_query_col(url), r"^([^?]*)", 1)


def query_col(url: Column) -> Column:
    """Query including the leading '?' ('' when absent)."""
    return F.regexp_extract(path_query_col(url), r"(\?.*)$", 1)


def domain_col(url: Column) -> Column:
    """utils.py:26-30 — netloc verbatim, port kept, case kept."""
    return netloc_col(url)


def is_valid_url_col(url: Column) -> Column:
    """utils.py:33-40: scheme ∈ {http, https} ∧ netloc ≠ ''.
    (urlparse lowercases the scheme, hence the case-insensitive match.
    urlparse also RAISES on a netloc with unbalanced IPv6 brackets —
    utils.py returns False through its except — so the native twin
    must reject those too.)"""
    nl = netloc_col(url)
    bad_ipv6 = nl.contains("[") != nl.contains("]")
    return (
        scheme_col(url).isin("http", "https")
        & (nl != "")
        & ~bad_ipv6
    )


def should_skip_url_col(url: Column) -> Column:
    """crawler.py:265-282: non-http(s) scheme, skip-listed extension on
    the lowercased path, or a non-empty fragment."""
    return (
        ~scheme_col(url).isin("http", "https")
        | F.lower(path_col(url)).rlike(_RE_SKIP_EXT)
        | (F.regexp_extract(url, _RE_FRAGMENT, 1) != "")
    )


def normalize_url_col(url: Column) -> Column:
    """crawler.py:284-308: drop default port (:80 http / :443 https,
    substring-replace like the reference), lowercase netloc, strip all
    trailing slashes from a non-root path, drop the fragment."""
    scheme = scheme_col(url)
    netloc = netloc_col(url)
    netloc = (
        F.when(scheme == "http", F.replace(netloc, F.lit(":80"), F.lit("")))
        .when(scheme == "https", F.replace(netloc, F.lit(":443"), F.lit("")))
        .otherwise(netloc)
    )
    path = path_col(url)
    path = F.when(path == "/", path).otherwise(F.regexp_replace(path, r"/+$", ""))
    # a bare trailing '?' (empty query) is dropped, as urlunparse does
    # in the Python twin — both paths must emit ONE canonical key
    q = query_col(url)
    q = F.when(q == "?", F.lit("")).otherwise(q)
    return F.concat(scheme, F.lit("://"), F.lower(netloc), path, q)


def crawl_priority_col(url: Column, depth: Column) -> Column:
    """crawler.py:434-458 (F15): depth·10 + path-segment-count·0.5
    − 5·is_root − 1·is_https, floored at 0.  Pure column arithmetic."""
    path = path_col(url)
    n_segments = F.size(F.split(path, "/", -1))
    prio = (
        depth.cast("double") * 10.0
        + n_segments.cast("double") * 0.5
        - F.when(path.isin("", "/"), F.lit(5.0)).otherwise(F.lit(0.0))
        - F.when(scheme_col(url) == "https", F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return F.greatest(F.lit(0.0), prio)


def truncate_col(c: Column, n: int) -> Column:
    """utils.py:50-54 (F13): chars-preserving truncate with '...'."""
    return F.when(
        F.length(c) > n, F.concat(F.substring(c, 1, n - 3), F.lit("..."))
    ).otherwise(c)


def cache_key_col(q: Column, page: Column, size: Column) -> Column:
    """main.py:146 (F8): md5 of 'q:page:size'."""
    return F.md5(F.concat_ws(":", q, page.cast("string"), size.cast("string")))


# ---------------------------------------------------------------------------
# DuckDB-SQL twins (same regex constants)
# ---------------------------------------------------------------------------


def scheme_sql(u: str) -> str:
    return f"lower(regexp_extract({u}, '{_RE_SCHEME}', 1))"


def netloc_sql(u: str) -> str:
    return f"regexp_extract({u}, '{_RE_NETLOC}', 1)"


def path_sql(u: str) -> str:
    return f"regexp_extract(regexp_extract({u}, '{_RE_REST}', 1), '^([^?]*)', 1)"


def query_sql(u: str) -> str:
    return f"regexp_extract(regexp_extract({u}, '{_RE_REST}', 1), '(\\?.*)$', 1)"


def is_valid_url_sql(u: str) -> str:
    nl = netloc_sql(u)
    return (
        f"({scheme_sql(u)} IN ('http','https') AND {nl} <> '' "
        f"AND (contains({nl}, '[') = contains({nl}, ']')))"
    )


def should_skip_url_sql(u: str) -> str:
    return (
        f"({scheme_sql(u)} NOT IN ('http','https') "
        f"OR regexp_matches(lower({path_sql(u)}), '{_RE_SKIP_EXT}') "
        f"OR regexp_extract({u}, '{_RE_FRAGMENT}', 1) <> '')"
    )


def normalize_url_sql(u: str) -> str:
    sch = scheme_sql(u)
    nl = netloc_sql(u)
    nl2 = (
        f"CASE WHEN {sch} = 'http' THEN replace({nl}, ':80', '') "
        f"WHEN {sch} = 'https' THEN replace({nl}, ':443', '') ELSE {nl} END"
    )
    p = path_sql(u)
    p2 = f"CASE WHEN {p} = '/' THEN '/' ELSE regexp_replace({p}, '/+$', '') END"
    q = query_sql(u)
    q2 = f"CASE WHEN {q} = '?' THEN '' ELSE {q} END"
    return f"({sch} || '://' || lower({nl2}) || {p2} || {q2})"


def crawl_priority_sql(u: str, depth: str) -> str:
    p = path_sql(u)
    return (
        f"greatest(0.0, ({depth})::DOUBLE * 10.0 "
        f"+ len(string_split({p}, '/'))::DOUBLE * 0.5 "
        f"- (CASE WHEN {p} IN ('', '/') THEN 5.0 ELSE 0.0 END) "
        f"- (CASE WHEN {scheme_sql(u)} = 'https' THEN 1.0 ELSE 0.0 END))"
    )


# ---------------------------------------------------------------------------
# plain-Python twins (reference-fidelity; used by the link extractor)
# ---------------------------------------------------------------------------


def normalize_url(url: str) -> str:
    """Python mirror of crawler.py:284-308, urlparse-exact."""
    parsed = urlparse(url)
    netloc = parsed.netloc
    if ":80" in netloc and parsed.scheme == "http":
        netloc = netloc.replace(":80", "")
    if ":443" in netloc and parsed.scheme == "https":
        netloc = netloc.replace(":443", "")
    path = parsed.path
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    return urlunparse(
        (parsed.scheme, netloc.lower(), path, parsed.params, parsed.query, "")
    )


def is_valid_url(url: str) -> bool:
    """Python mirror of utils.py:33-40."""
    try:
        parsed = urlparse(url)
        return parsed.scheme in ("http", "https") and bool(parsed.netloc)
    except Exception:
        return False


def should_skip_url(url: str) -> bool:
    """Python mirror of crawler.py:265-282."""
    parsed = urlparse(url)
    if parsed.scheme not in ("http", "https"):
        return True
    path_lower = parsed.path.lower()
    for ext in SKIP_EXTENSIONS:
        if path_lower.endswith("." + ext):
            return True
    return bool(parsed.fragment)


def crawl_priority(url: str, depth: int) -> float:
    """Python mirror of crawler.py:434-458."""
    parsed = urlparse(url)
    priority = depth * 10.0 + len(parsed.path.split("/")) * 0.5
    if parsed.path in ("", "/"):
        priority -= 5.0
    if parsed.scheme == "https":
        priority -= 1.0
    return max(0.0, priority)
