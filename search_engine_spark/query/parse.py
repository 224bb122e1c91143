"""Boolean/phrase query parsing — the reference's QueryProcessor shape,
made executable.

The reference parses quoted phrases and detects AND / OR / NOT operator
flags (backend/ranking_service/tfidf.py:589-626) but never executes
them: the flags are returned and ignored downstream, and NOT operands
are not even separated from positive terms (everything after
tokenization lands in one `terms` list, where "and"/"not" vanish as
stopwords but "or" — absent from the pinned fallback stopword list —
would leak through as a search term).

This module keeps the reference's output shape (raw / terms / phrases /
operators dict) and fixes exactly what executability requires:

  * operands after any ` NOT ` are split into `not_terms` (ES bool
    `must_not`); everything before the first NOT is positive
  * standalone AND / OR / NOT operator words are stripped (case-
    insensitive, like the reference's `.upper()` flag detection)
    before tokenization so "or" cannot leak into the term list

Spark-free on purpose: the pure-Python ranking oracles share this
parser with the engine the same way they share tokenize_py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List

from search_engine_spark.text.tokenizer import tokenize_py

_PHRASE_RE = re.compile(r'"([^"]+)"')
_NOT_SPLIT_RE = re.compile(r"\s+NOT\s+", re.IGNORECASE)
_OP_WORD_RE = re.compile(r"\b(AND|OR|NOT)\b", re.IGNORECASE)


@dataclass
class ParsedQuery:
    """Structured query — reference dict shape (tfidf.py:620-626) plus
    the executable `not_terms` split."""

    raw: str
    terms: List[str] = field(default_factory=list)
    not_terms: List[str] = field(default_factory=list)
    phrases: List[str] = field(default_factory=list)
    operators: Dict[str, bool] = field(default_factory=dict)


def parse_query(query: str) -> ParsedQuery:
    """Parse ``hello AND world NOT spam "exact phrase"`` into structure.

    Mirrors QueryProcessor.parse_query (tfidf.py:589-626): phrases are
    extracted first, operator flags are detected case-insensitively on
    the phrase-free remainder, terms run through the canonical
    tokenizer (lowercase, strip, stopwords, len>=2, Porter stem)."""
    q = query.strip()
    phrases = _PHRASE_RE.findall(q)
    remaining = _PHRASE_RE.sub(" ", q)

    padded = f" {remaining.upper()} "
    operators = {
        "and": " AND " in padded,
        "or": " OR " in padded,
        "not": " NOT " in padded,
    }

    segments = _NOT_SPLIT_RE.split(f" {remaining} ")
    positive = _OP_WORD_RE.sub(" ", segments[0])
    negative = _OP_WORD_RE.sub(" ", " ".join(segments[1:]))

    return ParsedQuery(
        raw=q,
        terms=tokenize_py(positive),
        not_terms=tokenize_py(negative),
        phrases=phrases,
        operators=operators,
    )
