"""URL blocklist filtering for training-data pipelines.

Web-scale corpus curation filters documents by their source URL before
any content-based stage (C4 dropped pages via a badwords blocklist,
RefinedWeb §3.1 scores URLs with a blocklist + keyword weights) — it is
the cheapest gate in the pipeline because it touches only the `url`
column, never the text.

Everything here is a native column expression over two shared regexes
(host and path extraction — the scheme://host[:port]/path shape), so
the filter runs inside the scan's WholeStageCodegen and composes with
partition pruning; the DuckDB twins are generated from the SAME
constants, so the driver's Spark-vs-DuckDB gate pins the semantics.

Matching rules (standard blocklist semantics):
  blocked_domain — host equals a blocked domain OR is a subdomain of
                   one (ends with "." + domain); ports are stripped,
                   hosts lowercased before matching
  blocked_path   — any blocked keyword occurs in the lowercased path
                   (query string and fragment excluded)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared Java-regex ∩ RE2 subset (ops/common.py convention)
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
PORT_RE = r":[0-9]+$"
# authority userinfo ("alice:pw@host") — must be stripped BEFORE domain
# matching or "https://x@blocked.com/" evades every host predicate.
# Greedy ^.*@ matches up to the LAST '@', the same split urlparse and
# browsers use: 'a@b@evil.com' must yield host 'evil.com', not
# 'b@evil.com' (which would evade both the equality and '.domain'
# suffix predicates).  Safe because the HOST_RE capture already
# excludes '/', '?', '#' — the match cannot cross into the path.
USERINFO_RE = r"^.*@"


def host_col(url: Column) -> Column:
    """Lowercased host with any userinfo@ prefix and :port stripped."""
    return F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(url, HOST_RE, 1)),
            USERINFO_RE, "",
        ),
        PORT_RE, "",
    )


def path_col(url: Column) -> Column:
    """Lowercased path (no query/fragment)."""
    return F.lower(F.regexp_extract(url, PATH_RE, 1))


def host_sql(url_expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace(lower(regexp_extract({url_expr}, "
        f"'{HOST_RE}', 1)), '{USERINFO_RE}', ''), '{PORT_RE}', '')"
    )


def path_sql(url_expr: str) -> str:
    return f"lower(regexp_extract({url_expr}, '{PATH_RE}', 1))"


def _domain_pred(host: Column, domains: Sequence[str]) -> Column:
    pred = F.lit(False)
    for d in domains:
        d = d.lower()
        pred = pred | (host == F.lit(d)) | host.endswith(f".{d}")
    return pred


def _path_pred(path: Column, keywords: Sequence[str]) -> Column:
    pred = F.lit(False)
    for kw in keywords:
        pred = pred | path.contains(kw.lower())
    return pred


def domain_pred_sql(host_expr: str, domains: Sequence[str]) -> str:
    parts = ["FALSE"] + [
        f"({host_expr} = '{d.lower()}' OR "
        f"ends_with({host_expr}, '.{d.lower()}'))"
        for d in domains
    ]
    return "(" + " OR ".join(parts) + ")"


def path_pred_sql(path_expr: str, keywords: Sequence[str]) -> str:
    parts = ["FALSE"] + [
        f"contains({path_expr}, '{kw.lower()}')" for kw in keywords
    ]
    return "(" + " OR ".join(parts) + ")"


def url_filter_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    blocked_domains: Sequence[str] = (),
    path_keywords: Sequence[str] = (),
) -> DataFrame:
    """Per-row blocklist verdicts:
    (id, host, blocked_domain, blocked_path, blocked)."""
    host = host_col(F.col(url_col))
    path = path_col(F.col(url_col))
    bd = _domain_pred(host, blocked_domains)
    bp = _path_pred(path, path_keywords)
    return df.select(
        F.col(id_col).alias("id"),
        host.alias("host"),
        bd.alias("blocked_domain"),
        bp.alias("blocked_path"),
        (bd | bp).alias("blocked"),
    )


def apply_url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: Sequence[str] = (),
    path_keywords: Sequence[str] = (),
) -> DataFrame:
    """Keep rows whose URL survives the blocklist — a pure WHERE
    clause, all columns preserved, no joins or shuffles."""
    host = host_col(F.col(url_col))
    path = path_col(F.col(url_col))
    return df.filter(
        ~(
            _domain_pred(host, blocked_domains)
            | _path_pred(path, path_keywords)
        )
    )
