"""ES/Lucene span query family — parse + exact per-doc evaluation.

The reference's Elasticsearch index (created indexer.py:163-206, ES 8.11
per docker-compose.yml:6-36) serves the full span query family
(span_term / span_near / span_or / span_not / span_first /
span_containing / span_within); the reference itself only ever issues
multi_match (main.py:162-189).  Like the rest of the DSL surface, this
module re-expresses the family Spark-first over the engine's positional
postings: the DSL body is parsed driver-side into a tiny picklable tree,
the positional scan + conjunctive gate of the phrase machinery bounds
the shuffle, and the span composition runs per doc inside one Arrow UDF
over docs that already hold every REQUIRED term.

Pinned span semantics (all spans end-exclusive [start, end) over the
FILTERED token stream — the same position space as match_phrase):

- span_term        one span (p, p+1) per occurrence of the normalized
                   token.  A value that analyzes to zero tokens (pure
                   stopword / punctuation) matches nothing; a value that
                   analyzes to several tokens is refused.
- span_or          the de-duplicated union of its clauses' spans.
- span_near        in_order=True: one span per clause, in clause order,
                   non-overlapping (next.start >= prev.end); total gaps
                   = (last.end - first.start) - sum(len) over the CHOSEN
                   chain.  A clause-0 span opens a match iff some chain
                   from it has gaps <= slop; the emitted span is
                   (opener.start, end of the lexicographically
                   (gaps, end)-minimal chain).  Exact via backward DP —
                   NOT Lucene's greedy NearSpansOrdered approximation.
                   in_order=False: term-only clauses with distinct
                   terms; matches = containment-minimal windows holding
                   every term with (width - n_terms) <= slop (the
                   intervals unordered sweep); other unordered clause
                   shapes are refused.
- span_not         include spans with NO exclude span overlapping
                   [start - pre, end + post)  (Lucene SpanNotQuery:
                   kept iff exclude.end <= start - pre or
                   exclude.start >= end + post).
- span_first       match spans with span.end <= end  (positions
                   0-based, end-exclusive: end=1 means "at position 0").
- span_containing  big spans containing >= 1 little span.
- span_within      little spans contained in >= 1 big span.
- span_multi       a wrapped prefix/wildcard/fuzzy/regexp query,
                   rewritten BEFORE parsing into a span_or of raw
                   dictionary terms (BM25Index.rewrite_span_multi —
                   Lucene's SpanMultiTermQueryWrapper); the parser
                   itself refuses unrewritten span_multi nodes.

Scoring follows the engine's phrase convention: the whole span query is
a pseudo-term with tf = number of matching spans and
idf = sum of idf over the DISTINCT positive leaf terms (terms under an
`exclude` subtree contribute nothing), score = BM25(tf, dl, idf_sum,
avgdl).  Unsupported shapes (span_multi, field_masking_span, fields
other than content/text) raise NotImplementedError naming the gap.
"""
from __future__ import annotations

from bisect import bisect_left
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

from ..text.tokenizer import tokenize_py

Span = Tuple[int, int]

_SPAN_KINDS = {
    "span_term", "span_near", "span_or", "span_not", "span_first",
    "span_containing", "span_within", "span_multi",
    # internal leaf produced by BM25Index.rewrite_span_multi: the value
    # is a DICTIONARY term used verbatim (already stemmed — running it
    # through the analyzer again would re-stem and corrupt it)
    "span_raw_term",
}


def is_span_kind(kind: str) -> bool:
    return kind in _SPAN_KINDS


class SpanParse:
    """Driver-side parse result: picklable tree + term bookkeeping.

    tree           nested tuples (see _parse below)
    terms          distinct normalized terms, index = ordinal in tree
    required       ordinals every match must contain, or None when the
                   query is PROVABLY empty (a required branch analyzes
                   to nothing)
    positive_terms distinct terms outside any exclude subtree — the idf
                   pseudo-term components
    """

    def __init__(self, tree, terms, required, positive_terms):
        self.tree = tree
        self.terms: List[str] = terms
        self.required: Optional[FrozenSet[int]] = required
        self.positive_terms: FrozenSet[str] = positive_terms


def _unsupported(what: str):
    raise NotImplementedError(f"span query subset: {what}")


def parse_span_query(node: dict) -> SpanParse:
    """ES span query body (single-key dict) -> SpanParse."""
    ords: Dict[str, int] = {}
    positive: set = set()

    def ordinal(term: str) -> int:
        if term not in ords:
            ords[term] = len(ords)
        return ords[term]

    def parse(n, under_exclude: bool):
        if not isinstance(n, dict) or len(n) != 1:
            _unsupported("span clause must be a single-key object")
        kind, body = next(iter(n.items()))
        if kind == "field_masking_span":
            _unsupported("field_masking_span")
        if kind == "span_multi":
            _unsupported(
                "span_multi must be rewritten against the term "
                "dictionary first (BM25Index.search_spans does this "
                "automatically via rewrite_span_multi)"
            )
        if kind not in _SPAN_KINDS:
            _unsupported(f"clause kind {kind!r}")
        if kind == "span_raw_term":
            if not isinstance(body, dict) or len(body) != 1:
                _unsupported("span_raw_term must name exactly one field")
            field, spec = next(iter(body.items()))
            if field not in ("content", "text"):
                _unsupported(f"span_raw_term on field {field!r}")
            value = str(
                spec.get("value") if isinstance(spec, dict) else spec
            )
            if not value:
                return ("empty",)
            if not under_exclude:
                positive.add(value)
            return ("term", ordinal(value))
        if kind == "span_term":
            if not isinstance(body, dict) or len(body) != 1:
                _unsupported("span_term must name exactly one field")
            field, spec = next(iter(body.items()))
            if field not in ("content", "text"):
                _unsupported(f"span_term on field {field!r}")
            value = spec.get("value") if isinstance(spec, dict) else spec
            toks = tokenize_py(str(value))
            if not toks:
                return ("empty",)
            if len(toks) > 1:
                _unsupported(
                    f"span_term value {value!r} analyzes to several tokens"
                )
            if not under_exclude:
                positive.add(toks[0])
            return ("term", ordinal(toks[0]))
        if kind == "span_or":
            clauses = body.get("clauses") or []
            if not clauses:
                _unsupported("span_or without clauses")
            kids = [parse(c, under_exclude) for c in clauses]
            return ("or", tuple(kids))
        if kind == "span_near":
            clauses = body.get("clauses") or []
            if not clauses:
                _unsupported("span_near without clauses")
            slop = int(body.get("slop", 0))
            in_order = bool(body.get("in_order", False))
            kids = [parse(c, under_exclude) for c in clauses]
            if in_order:
                return ("near_ord", tuple(kids), slop)
            for kid in kids:
                if kid[0] not in ("term", "empty"):
                    _unsupported(
                        "span_near in_order=false over non-term clauses"
                    )
            term_ords = [k[1] for k in kids if k[0] == "term"]
            if len(kids) != len(term_ords):
                return ("empty",)  # an always-empty term clause
            if len(set(term_ords)) != len(term_ords):
                _unsupported("span_near in_order=false with repeated terms")
            return ("near_unord", tuple(term_ords), slop)
        if kind == "span_not":
            if "include" not in body or "exclude" not in body:
                _unsupported("span_not needs include and exclude")
            dist = int(body.get("dist", 0))
            pre = int(body.get("pre", dist))
            post = int(body.get("post", dist))
            inc = parse(body["include"], under_exclude)
            exc = parse(body["exclude"], True)
            return ("not", inc, exc, pre, post)
        if kind == "span_first":
            if "match" not in body or "end" not in body:
                _unsupported("span_first needs match and end")
            return ("first", parse(body["match"], under_exclude),
                    int(body["end"]))
        # span_containing / span_within
        if "big" not in body or "little" not in body:
            _unsupported(f"{kind} needs big and little")
        big = parse(body["big"], under_exclude)
        little = parse(body["little"], under_exclude)
        tag = "containing" if kind == "span_containing" else "within"
        return (tag, big, little)

    tree = parse(node, False)
    terms = [t for t, _ in sorted(ords.items(), key=lambda kv: kv[1])]
    return SpanParse(
        tree, terms, required_ordinals(tree), frozenset(positive)
    )


def required_ordinals(tree) -> Optional[FrozenSet[int]]:
    """Ordinals present in EVERY match; None = provably empty."""
    kind = tree[0]
    if kind == "empty":
        return None
    if kind == "term":
        return frozenset([tree[1]])
    if kind == "or":
        kids = [required_ordinals(k) for k in tree[1]]
        alive = [r for r in kids if r is not None]
        if not alive:
            return None
        out = alive[0]
        for r in alive[1:]:
            out &= r
        return out
    if kind == "near_ord":
        out: FrozenSet[int] = frozenset()
        for k in tree[1]:
            r = required_ordinals(k)
            if r is None:
                return None
            out |= r
        return out
    if kind == "near_unord":
        return frozenset(tree[1])
    if kind == "not":
        return required_ordinals(tree[1])
    if kind == "first":
        return required_ordinals(tree[1])
    # containing / within: both sides must match somewhere
    big = required_ordinals(tree[1])
    little = required_ordinals(tree[2])
    if big is None or little is None:
        return None
    return big | little


def _near_ordered(
    clause_spans: Sequence[List[Span]], slop: int
) -> List[Span]:
    """Exact ordered-near: backward DP for the (gaps, end)-lex-minimal
    chain from every clause-0 span; feasible openers (gaps <= slop)
    emit (opener.start, chain end).  O(sum n_j log n_j) per doc."""
    if any(not spans for spans in clause_spans):
        return []
    last = clause_spans[-1]
    # g[i] = (min total gaps from this span to chain end, end) or None
    g: List[Optional[Tuple[int, int]]] = [(0, e) for (_s, e) in last]
    for j in range(len(clause_spans) - 2, -1, -1):
        nxt = clause_spans[j + 1]
        feas = [
            (nxt[i][0], nxt[i][0] + g[i][0], g[i][1])
            for i in range(len(nxt))
            if g[i] is not None
        ]
        feas.sort()  # by start
        starts = [f[0] for f in feas]
        # suffix lex-min of (start + gaps_from_next, end)
        suf: List[Optional[Tuple[int, int]]] = [None] * (len(feas) + 1)
        for i in range(len(feas) - 1, -1, -1):
            v = (feas[i][1], feas[i][2])
            nv = suf[i + 1]
            suf[i] = v if nv is None or v < nv else nv
        cur = clause_spans[j]
        ng: List[Optional[Tuple[int, int]]] = []
        for (_s, e) in cur:
            i = bisect_left(starts, e)
            best = suf[i] if i < len(feas) else None
            ng.append(None if best is None else (best[0] - e, best[1]))
        g = ng
    out = []
    for (s, _e), r in zip(clause_spans[0], g):
        if r is not None and r[0] <= slop:
            out.append((s, r[1]))
    return sorted(set(out))


def _near_unordered(
    pos_lists: Sequence[Sequence[int]], slop: int
) -> List[Span]:
    """Containment-minimal windows holding one position of every term,
    (width - n) <= slop — the intervals unordered sweep emitting spans."""
    n = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return []
    items = sorted((int(p), i) for i, lst in enumerate(pos_lists)
                   for p in lst)
    cnt = [0] * n
    have = left = 0
    out: List[Span] = []
    for pr, tr in items:
        cnt[tr] += 1
        if cnt[tr] == 1:
            have += 1
        if have < n:
            continue
        while cnt[items[left][1]] > 1:
            cnt[items[left][1]] -= 1
            left += 1
        width = pr - items[left][0] + 1
        if width - n <= slop:
            out.append((items[left][0], pr + 1))
        cnt[items[left][1]] -= 1
        have -= 1
        left += 1
    return sorted(set(out))


def eval_spans(tree, pos: Sequence[Sequence[int]]) -> List[Span]:
    """Evaluate a parsed span tree over one doc's per-ordinal SORTED
    position lists; returns the sorted de-duplicated span list."""
    kind = tree[0]
    if kind == "empty":
        return []
    if kind == "term":
        return [(int(p), int(p) + 1) for p in pos[tree[1]]]
    if kind == "or":
        u: set = set()
        for k in tree[1]:
            u.update(eval_spans(k, pos))
        return sorted(u)
    if kind == "near_ord":
        return _near_ordered(
            [eval_spans(k, pos) for k in tree[1]], tree[2]
        )
    if kind == "near_unord":
        return _near_unordered([pos[o] for o in tree[1]], tree[2])
    if kind == "not":
        inc = eval_spans(tree[1], pos)
        if not inc:
            return []
        exc = eval_spans(tree[2], pos)
        pre, post = tree[3], tree[4]
        return [
            (s, e)
            for (s, e) in inc
            if not any(xs < e + post and xe > s - pre for (xs, xe) in exc)
        ]
    if kind == "first":
        return [sp for sp in eval_spans(tree[1], pos) if sp[1] <= tree[2]]
    big = eval_spans(tree[1], pos)
    little = eval_spans(tree[2], pos)
    if kind == "containing":
        return [
            b for b in big
            if any(ls >= b[0] and le <= b[1] for (ls, le) in little)
        ]
    # within
    return [
        l for l in little
        if any(b[0] <= l[0] and b[1] >= l[1] for b in big)
    ]
