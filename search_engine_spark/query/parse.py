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
operators dict, with the flags detected exactly as the reference does —
case-insensitively over the whole phrase-free remainder) and fixes what
executability requires:

  * operands after any ` NOT ` are split into `not_terms` /
    `not_phrases` (ES bool `must_not`); everything before the first
    NOT is positive.  Phrases are shielded behind placeholders before
    the split so a NOT *inside* quotes ("do not go") never splits, and
    a phrase *after* NOT is negated rather than silently required
  * `positive_and` reports an ` AND ` within the positive segment only
    — the executor keys conjunctive semantics on it, because an AND
    between two negated operands must not force must-semantics on the
    positive terms (operators["and"] stays reference-faithful/global)
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
_PLACEHOLDER_RE = re.compile(r"\x00(\d+)\x00")


@dataclass
class ParsedQuery:
    """Structured query — reference dict shape (tfidf.py:620-626) plus
    the executable must_not split and positive-segment AND flag."""

    raw: str
    terms: List[str] = field(default_factory=list)
    not_terms: List[str] = field(default_factory=list)
    phrases: List[str] = field(default_factory=list)
    not_phrases: List[str] = field(default_factory=list)
    operators: Dict[str, bool] = field(default_factory=dict)
    positive_and: bool = False
    # ES bool.must with an OR-operator match clause: >=1 of the clause's
    # terms is REQUIRED alongside the phrases (inner >=1 join), unlike
    # the boolean-string grammar where bare terms are optional should
    # clauses.  Only consulted when positive_and is False.
    terms_required: bool = False


def _segment_parts(segment: str, all_phrases: List[str]):
    """(terms, phrases) of one NOT-delimited segment: placeholders map
    back to their phrase, the rest tokenizes with operator words
    stripped."""
    phrases = [all_phrases[int(m)] for m in _PLACEHOLDER_RE.findall(segment)]
    text = _PLACEHOLDER_RE.sub(" ", segment)
    return tokenize_py(_OP_WORD_RE.sub(" ", text)), phrases


def parse_query(query: str) -> ParsedQuery:
    """Parse ``hello AND world NOT spam "exact phrase"`` into structure.

    Mirrors QueryProcessor.parse_query (tfidf.py:589-626): phrases are
    extracted first, operator flags are detected case-insensitively on
    the phrase-free remainder, terms run through the canonical
    tokenizer (lowercase, strip, stopwords, len>=2, Porter stem)."""
    q = query.strip()

    # shield phrases behind \x00i\x00 placeholders so the NOT split
    # neither cuts inside quotes nor loses a phrase's polarity
    all_phrases = _PHRASE_RE.findall(q)
    shielded = q
    for i, p in enumerate(all_phrases):
        shielded = shielded.replace(f'"{p}"', f" \x00{i}\x00 ", 1)

    remaining = _PHRASE_RE.sub(" ", q)
    padded = f" {remaining.upper()} "
    operators = {
        "and": " AND " in padded,
        "or": " OR " in padded,
        "not": " NOT " in padded,
    }

    segments = _NOT_SPLIT_RE.split(f" {shielded} ")
    terms, phrases = _segment_parts(segments[0], all_phrases)
    not_terms, not_phrases = _segment_parts(
        " ".join(segments[1:]), all_phrases
    )
    positive_seg = _PLACEHOLDER_RE.sub(" ", segments[0])
    positive_and = " AND " in f" {positive_seg.upper()} "

    return ParsedQuery(
        raw=q,
        terms=terms,
        not_terms=not_terms,
        phrases=phrases,
        not_phrases=not_phrases,
        operators=operators,
        positive_and=positive_and,
    )
