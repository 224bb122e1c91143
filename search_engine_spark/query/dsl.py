"""ES Query-DSL interpreter — run the reference's actual query bodies.

The reference talks to Elasticsearch with JSON query bodies (the
flagship /search request is built at backend/search_api/main.py:162-189:
a `multi_match` over title^3/description^2/content with from/size
pagination and a `_source` projection).  `execute_es_query` accepts
that dict shape directly and lowers it onto the engine's DataFrame
methods, so a user of the reference can paste their ES request body
and get the same ranked result from the Spark engine.

Supported grammar (a documented subset — anything outside it raises
NotImplementedError naming the gap, never a silent wrong answer):

  query nodes
    match            {"match": {"content": "q"}} or
                     {"match": {"content": {"query": q,
                       "operator": "and"|"or",
                       "minimum_should_match": n}}}
                     field "content" scores via the main postings;
                     "title"/"description" via their field namespaces
    multi_match      {"query": q, "fields": ["title^3", ...],
                      "type": best_fields|most_fields|cross_fields,
                      "tie_breaker": f}
    match_phrase     {"content": "q"} or {"content": {"query": q,
                      "slop": n}}
    match_phrase_prefix
                     {"content": {"query": q, "max_expansions": n}}
                     (search-as-you-type)
    match_bool_prefix
                     {"content": {"query": q, "max_expansions": n}}
                     (search-as-you-type, unordered terms)
    prefix/wildcard/fuzzy/regexp
                     {"content": {"value": v, ...opts}}
    more_like_this   {"like": text, "max_query_terms"...}
    query_string     {"query": 'a AND b NOT c "exact phrase"',
                      "default_field": "content",
                      "default_operator": "and"|"or"} — the reference's
                     OWN search-box syntax (QueryProcessor.parse_query,
                     tfidf.py:589-626), executed via search_boolean;
                     Lucene-only syntax (field:term, ^boost, grouping,
                     ranges, fuzzy/prefix suffixes, +/-/! prefixes) is
                     refused, never silently re-tokenized
    simple_query_string
                     {"query": 'a +b -c "phrase"', "fields":
                      ["content"], "default_operator": ...} — the
                     + (and) / | (or) / -term (not) / "" (phrase)
                     operator subset translated onto the same boolean
                     engine; ( ) * ~ refused, mixing + with | refused
                     (single global positive mode, no precedence)
    dis_max          {"queries": [match|match_phrase on content, ...],
                      "tie_breaker": f} — best-clause scoring
    boosting         {"positive": node, "negative": node,
                      "negative_boost": b} — demote, don't exclude
    function_score   {"query": match|match_phrase,
                      "field_value_factor": {"field", "factor",
                        "modifier", "missing"},
                      "functions": [{"filter": term/terms/range/exists,
                        "weight": w, and/or ONE of "field_value_factor"
                        / "random_score" {seed, field} / "gauss"|"exp"|
                        "linear" {field: {origin, scale, offset,
                        decay}}}, ...],
                      "boost_mode", "score_mode", "max_boost"}
    script_score     {"query": node, "script": {"source": painless
                     arithmetic over _score / doc['f'].value /
                     params.x, "params": {...}}, "min_score": m} —
                     translated to ONE native SQL expression
                     (query/painless.py)
    rank_feature     {"field": f, "saturation"|"log"|"sigmoid": {...},
                     "boost": b} — positive-signal scoring off the
                     docs table, postings never touched
    constant_score   {"filter": [...], "boost": b} — pure metadata
                     scan, postings never touched
    ids              {"values": [doc_id, ...]} — point lookup
    term/terms/range/exists
                     metadata fields (docs table) — FILTER CONTEXT
                     only (never scored), as in ES practice
    bool             {"must": [...], "should": [...],
                      "must_not": [...], "filter": [...]}
      · filter: term/terms/range/exists → one docs-table predicate
      · must: ONE scoring clause (match/match_phrase on content)
        plus any filter-type clauses
      · should: match clauses on content (merged OR scoring) when no
        must is present; top-level minimum_should_match applies at
        term level (documented divergence: ES counts clauses)
      · must_not: match (terms) / match_phrase (phrases) on content
  request body
    {"query": ..., "from": n, "size": n, "_source": [cols],
     "sort": ["f" | {"f": "desc"} | {"f": {"order": ...}} | "_score"],
                                        # field-sorted hits
                                        # (search_sorted; track_scores
                                        # honored; match / bool
                                        # must+filter foregrounds)
     "collapse": {"field": f},          # one best result per value
     "rescore": {"window_size": w,      # phrase/match second pass
       "query": {"rescore_query": node, "query_weight": qw,
                 "rescore_query_weight": rw}},
     "highlight": {"fields": {"title": {}, "description": {},
        "content": {"fragment_size": n}},   # highlight_<field> cols;
       "pre_tags": [..], "post_tags": [..]} # content needs pages=
     "aggs": {...}}                     # via execute_es_aggs

Scoring parity notes: a bool with one must match clause and filters is
exactly ES's query+filter (full-corpus stats, filter never reweights —
BM25Index.search_filtered); must_not is an unscored anti-join (filter
context contributes 0).  Pagination `from/size` is served through the
exact total order (score desc, doc_id asc).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.query.parse import ParsedQuery
from search_engine_spark.text.tokenizer import tokenize_py

_SCORING = ("match", "multi_match", "combined_fields", "match_phrase",
            "match_phrase_prefix", "match_bool_prefix", "prefix",
            "wildcard", "fuzzy", "regexp", "more_like_this", "dis_max",
            "boosting", "function_score", "script_score", "rank_feature",
            "query_string", "simple_query_string", "terms_set",
            "intervals", "span_term", "span_near", "span_or", "span_not",
            "span_first", "span_containing", "span_within", "span_multi",
            "pinned", "distance_feature", "wrapper")
_FILTERING = ("term", "terms", "range", "exists", "match_all")

_TEXT_FIELDS = ("content", "title", "description")


def _unsupported(what: str):
    raise NotImplementedError(
        f"ES-DSL subset: {what} is not supported (see query/dsl.py grammar)"
    )


def _one_key(node: Dict, ctx: str) -> Tuple[str, object]:
    if not isinstance(node, dict) or len(node) != 1:
        _unsupported(f"{ctx}: expected a single-key query node, got {node!r}")
    return next(iter(node.items()))


def _as_list(v) -> List:
    return v if isinstance(v, list) else [v]


def _parse_fields(specs: List[str]) -> Dict[str, float]:
    """["title^3", "content"] -> {"title": 3.0, "content": 1.0}."""
    boosts: Dict[str, float] = {}
    for s in specs:
        name, _, b = s.partition("^")
        if name not in _TEXT_FIELDS:
            _unsupported(f"multi_match field {name!r}")
        boosts[name] = float(b) if b else 1.0
    return boosts


# Lucene query_string syntax our boolean grammar does not cover: field
# prefixes, boosts, grouping, ranges, fuzzy/proximity/wildcard suffixes,
# escapes, && / ||, and the +/-/! unary prefixes (a silently-tokenized
# `-spam` would flip a must_not into a should — refuse instead).
_QS_LUCENE_RE = re.compile(r'[:^()\[\]{}*?~\\/!]|&&|\|\||(?:^|\s)[+-]\S')
_PHRASE_STRIP_RE = re.compile(r'-?"[^"]*"')
_SQS_FORBIDDEN_RE = re.compile(r"[()*~]")


def _query_string_args(body) -> Tuple[str, bool]:
    """(raw boolean query, force_and) of a query_string node."""
    if isinstance(body, dict):
        q = body["query"]
        dfield = body.get("default_field", "content")
        dop = str(body.get("default_operator", "or")).lower()
    else:
        q, dfield, dop = body, "content", "or"
    if dfield != "content":
        _unsupported(f"query_string default_field {dfield!r}")
    # scan the phrase-free remainder: quoted content is literal text in
    # Lucene query_string, so specials inside quotes are fine (and the
    # canonical tokenizer strips them anyway)
    if _QS_LUCENE_RE.search(_PHRASE_STRIP_RE.sub(" ", q)):
        _unsupported(
            "query_string Lucene syntax beyond AND/OR/NOT/quotes "
            f"(in {q!r}) — the reference's QueryProcessor subset"
        )
    return q, dop == "and"


def _simple_query_string_args(body) -> Tuple[str, bool]:
    """Translate the ES simple_query_string operator subset onto the
    boolean grammar: + = and, | = or, leading - negates a token or
    phrase, "" = phrase.  Returns (boolean query, force_and)."""
    if isinstance(body, dict):
        q = body["query"]
        fields = _as_list(body.get("fields", ["content"]))
        dop = str(body.get("default_operator", "or")).lower()
    else:
        q, fields, dop = body, ["content"], "or"
    if [f.partition("^")[0] for f in fields] != ["content"]:
        _unsupported(f"simple_query_string fields {fields!r} "
                     "(content only)")
    if _SQS_FORBIDDEN_RE.search(q):
        _unsupported("simple_query_string ( ) * ~ operators "
                     "(precedence / prefix / fuzzy)")
    pos: List[str] = []
    neg: List[str] = []
    rest = q
    for sign, ph in re.findall(r'(-?)"([^"]*)"', q):
        (neg if sign else pos).append(f'"{ph}"')
    rest = _PHRASE_STRIP_RE.sub(" ", rest)
    conj = disj = False
    for tok in rest.replace("+", " + ").replace("|", " | ").split():
        if tok == "+":
            conj = True
        elif tok == "|":
            disj = True
        elif tok == "-":
            _unsupported("simple_query_string dangling '-'")
        elif tok.startswith("-"):
            neg.append(tok[1:])
        else:
            pos.append(tok)
    if conj and disj:
        _unsupported("simple_query_string mixing + and | "
                     "(no precedence in the boolean grammar)")
    out = " ".join(pos)
    if neg:
        out = f"{out} NOT {' '.join(neg)}".strip()
    return out, conj or dop == "and"


def _apply_runtime(body: Dict) -> Dict:
    """Resolve ES `runtime_mappings` — script-defined fields usable in
    filter clauses and agg/composite `field` positions.  Each runtime
    field's painless arithmetic translates to a parenthesized SQL
    expression (query/painless.py), textually substituted wherever the
    body names the field: `field` values, and the field-KEY of
    term/terms/range filter nodes (the engine's field arguments are
    F.expr()'d, so an expression string is a drop-in).  Sorting by a
    runtime field is refused (the sorted path selects sort columns by
    name from the docs layout).  _score is meaningless at field-
    definition time and refused."""
    rts = body.get("runtime_mappings")
    if not rts:
        return body
    from search_engine_spark.query.painless import painless_to_sql

    rmap: Dict[str, str] = {}
    for name, spec in rts.items():
        script = spec.get("script", spec) if isinstance(spec, dict) \
            else spec
        src = script.get("source") if isinstance(script, dict) else script
        if not src:
            _unsupported(f"runtime field {name!r} without a script")
        sql, _flds = painless_to_sql(
            src, script.get("params") if isinstance(script, dict) else None
        )
        if "_score" in sql:
            _unsupported(f"runtime field {name!r} referencing _score")
        rmap[name] = f"({sql})"

    for s in _as_list(body.get("sort", [])):
        key = s if isinstance(s, str) else next(iter(s))
        if key in rmap:
            _unsupported(f"sort on runtime field {key!r}")

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "runtime_mappings":
                    continue
                if (
                    k in ("term", "terms", "range")
                    and isinstance(v, dict)
                    and len(v) == 1
                ):
                    fk, fv = next(iter(v.items()))
                    out[k] = {rmap.get(fk, fk): walk(fv)}
                elif k == "field" and isinstance(v, str):
                    out[k] = rmap.get(v, v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(body)


def _filter_predicate(clauses: List[Dict]) -> Optional[Column]:
    """term/terms/range/exists clauses -> one docs-table Column.
    Field positions go through F.expr so runtime-field substitutions
    (expression strings) work exactly like plain column names."""
    pred = None
    for clause in clauses:
        kind, body = _one_key(clause, "filter")
        if kind == "match_all":
            continue
        if kind == "term":
            field, v = _one_key(body, "term")
            if isinstance(v, dict):
                v = v.get("value")
            c = F.expr(field) == F.lit(v)
        elif kind == "terms":
            field, vals = _one_key(body, "terms")
            c = F.expr(field).isin(list(vals))
        elif kind == "range":
            field, bounds = _one_key(body, "range")
            c = F.lit(True)
            for op, v in bounds.items():
                col = F.expr(field)
                if op == "gte":
                    c = c & (col >= F.lit(v))
                elif op == "gt":
                    c = c & (col > F.lit(v))
                elif op == "lte":
                    c = c & (col <= F.lit(v))
                elif op == "lt":
                    c = c & (col < F.lit(v))
                else:
                    _unsupported(f"range op {op!r}")
        elif kind == "exists":
            fld = body["field"]
            if fld == "content":
                # the one analyzed field with NO docs-table column —
                # an isNotNull on the metadata scan would die with an
                # unresolved-column AnalysisException; refusing loudly
                # keeps the subset contract (every indexed doc has
                # content — use match_all or a doclen range instead)
                _unsupported(
                    "exists on the analyzed 'content' field (no "
                    "docs-table column)"
                )
            c = F.expr(fld).isNotNull()
        else:
            _unsupported(f"filter clause {kind!r} (scoring clauses don't "
                         "belong in filter context in this subset)")
        pred = c if pred is None else (pred & c)
    return pred


def _match_parts(clause) -> Tuple[str, str, str, Optional[int]]:
    """(field, query, operator, minimum_should_match) of a full
    {"match": {field: spec}} clause."""
    _, inner = _one_key(clause, "match")
    field, spec = _one_key(inner, "match field")
    if isinstance(spec, str):
        return field, spec, "or", None
    return (
        field,
        spec["query"],
        spec.get("operator", "or").lower(),
        spec.get("minimum_should_match"),
    )


def _phrase_parts(clause) -> Tuple[str, str, int]:
    """(field, query, slop) of a full {"match_phrase": {...}} clause."""
    _, inner = _one_key(clause, "match_phrase")
    field, spec = _one_key(inner, "match_phrase field")
    if isinstance(spec, str):
        return field, spec, 0
    return field, spec["query"], int(spec.get("slop", 0))


def _engine_spec(node) -> tuple:
    """Lower a match / match_phrase node on content to the engine's
    _clause_scored spec — the subquery form dis_max / boosting /
    function_score / rescore compose over."""
    kind, _ = _one_key(node, "compound subquery")
    if kind == "match":
        field, q, op, msm = _match_parts(node)
        if field != "content" or msm:
            _unsupported("compound subquery: match must be on content "
                         "without minimum_should_match")
        return ("match", q, op)
    if kind == "match_phrase":
        field, q, slop = _phrase_parts(node)
        if field != "content":
            _unsupported(f"compound subquery: match_phrase on {field!r}")
        return ("phrase", q, slop)
    _unsupported(f"compound subquery node {kind!r} (match / match_phrase)")


def _score_match(idx, body, k, predicate, join_docs):
    field, q, op, msm = _match_parts(body)
    if field == "content":
        if predicate is not None:
            if op != "or" or msm:
                _unsupported("filter context with non-OR match")
            return idx.search_filtered(q, predicate, k=k, join_docs=join_docs)
        return idx.search(
            q, k=k, mode="and" if op == "and" else "blockmax",
            min_should_match=int(msm) if msm else 1, join_docs=join_docs,
        )
    if field in _TEXT_FIELDS:
        if op != "or" or msm or predicate is not None:
            _unsupported(f"match on field {field!r} with operator/msm/filter")
        return idx.search_fields(
            q, k=k, boosts={field: 1.0}, join_docs=join_docs
        )
    _unsupported(f"match on non-text field {field!r}")


def _score_clause(idx, node, k, predicate, join_docs) -> DataFrame:
    kind, body = _one_key(node, "query")
    if kind == "match":
        field, spec = _one_key(body, "match field")
        if isinstance(spec, dict) and "fuzziness" in spec:
            # match + fuzziness: per-token fuzzy synonym groups
            if field != "content":
                _unsupported(f"fuzzy match on field {field!r}")
            if predicate is not None:
                _unsupported("filter context combined with fuzzy match")
            if spec.get("operator", "or").lower() != "or":
                _unsupported("fuzzy match with operator AND")
            if spec.get("minimum_should_match"):
                _unsupported("fuzzy match with minimum_should_match")
            return idx.search_match_fuzzy(
                spec["query"],
                fuzziness=spec["fuzziness"],
                prefix_length=int(spec.get("prefix_length", 0)),
                max_expansions=int(spec.get("max_expansions", 50)),
                k=k, join_docs=join_docs,
            )
        return _score_match(idx, node, k, predicate, join_docs)
    if predicate is not None:
        _unsupported(f"filter context combined with {kind!r}")
    if kind == "multi_match":
        q = body["query"]
        boosts = _parse_fields(body.get("fields", ["content"]))
        qtype = body.get("type", "best_fields")
        tie = float(body.get("tie_breaker", 0.0))
        if qtype == "best_fields":
            return idx.search_fields(
                q, k=k, boosts=boosts, tie_breaker=tie, join_docs=join_docs
            )
        if qtype == "most_fields":
            return idx.search_fields(
                q, k=k, boosts=boosts, tie_breaker=1.0, join_docs=join_docs,
                mode="exhaustive",
            )
        if qtype == "cross_fields":
            return idx.search_cross_fields(
                q, k=k, boosts=boosts, tie_breaker=tie, join_docs=join_docs
            )
        _unsupported(f"multi_match type {qtype!r}")
    if kind == "combined_fields":
        # ES combined_fields query: BM25F-pooled term frequencies over
        # the weighted fields (weights parse from the ^ suffix)
        return idx.search_combined_fields(
            body["query"],
            k=k,
            weights=_parse_fields(body.get("fields", ["content"])),
            join_docs=join_docs,
        )
    if kind == "terms_set":
        field, spec = _one_key(body, "terms_set")
        if field != "content":
            _unsupported(f"terms_set on field {field!r} (content only)")
        msm_field = spec.get("minimum_should_match_field")
        msm = None
        script = spec.get("minimum_should_match_script")
        if script is not None:
            src = script.get("source", "")
            try:
                # constant-threshold scripts only (the common shape,
                # e.g. "2" or "params.num_terms") — anything dynamic
                # refuses rather than guessing
                msm = int(str(src).strip())
            except ValueError:
                _unsupported(
                    f"terms_set script {src!r} (constant integers only)"
                )
        return idx.search_terms_set(
            [str(t) for t in spec["terms"]],
            k=k,
            minimum_should_match=msm,
            minimum_should_match_field=msm_field,
            join_docs=join_docs,
        )
    if kind == "match_phrase":
        field, q, slop = _phrase_parts(node)
        if field != "content":
            _unsupported(f"match_phrase on field {field!r}")
        return idx.search_phrase(q, k=k, slop=slop, join_docs=join_docs)
    if kind == "match_phrase_prefix":
        field, spec = _one_key(body, "match_phrase_prefix")
        if field != "content":
            _unsupported(f"match_phrase_prefix on field {field!r}")
        q = spec["query"] if isinstance(spec, dict) else spec
        max_exp = (
            int(spec.get("max_expansions", 50))
            if isinstance(spec, dict) else 50
        )
        return idx.search_phrase_prefix(
            q, k=k, max_expansions=max_exp, join_docs=join_docs
        )
    if kind == "prefix":
        field, spec = _one_key(body, "prefix")
        v = spec["value"] if isinstance(spec, dict) else spec
        if field != "content":
            _unsupported(f"prefix on field {field!r}")
        return idx.search_prefix(v, k=k, join_docs=join_docs)
    if kind == "wildcard":
        field, spec = _one_key(body, "wildcard")
        v = spec["value"] if isinstance(spec, dict) else spec
        if field != "content":
            _unsupported(f"wildcard on field {field!r}")
        return idx.search_wildcard(v, k=k, join_docs=join_docs)
    if kind == "fuzzy":
        field, spec = _one_key(body, "fuzzy")
        if field != "content":
            _unsupported(f"fuzzy on field {field!r}")
        if isinstance(spec, dict):
            v = spec["value"]
            fz = spec.get("fuzziness", 2)
            max_edits = 2 if fz == "AUTO" else int(fz)
            plen = int(spec.get("prefix_length", 0))
        else:
            v, max_edits, plen = spec, 2, 0
        return idx.search_fuzzy(
            v, k=k, max_edits=max_edits, prefix_length=plen,
            join_docs=join_docs,
        )
    if kind == "regexp":
        field, spec = _one_key(body, "regexp")
        v = spec["value"] if isinstance(spec, dict) else spec
        if field != "content":
            _unsupported(f"regexp on field {field!r}")
        return idx.search_regexp(v, k=k, join_docs=join_docs)
    if kind == "match_bool_prefix":
        field, spec = _one_key(body, "match_bool_prefix")
        if field != "content":
            _unsupported(f"match_bool_prefix on field {field!r}")
        q = spec["query"] if isinstance(spec, dict) else spec
        max_exp = (
            int(spec.get("max_expansions", 50))
            if isinstance(spec, dict) else 50
        )
        return idx.search_bool_prefix(
            q, k=k, max_expansions=max_exp, join_docs=join_docs
        )
    if kind == "wrapper":
        # ES wrapper query: a base64-encoded JSON query node (the
        # escape hatch clients use to ship raw queries through typed
        # APIs) — decode and recurse
        import base64
        import json

        raw = body.get("query") if isinstance(body, dict) else body
        try:
            inner = json.loads(base64.b64decode(raw))
        except Exception as exc:
            raise ValueError(f"wrapper query is not base64 JSON: {exc}")
        return _score_clause(idx, inner, k, predicate, join_docs)
    if kind == "pinned":
        organic = body.get("organic")
        if organic is None:
            _unsupported("pinned without an organic query")
        if "ids" in body:
            pins = [int(v) for v in _as_list(body["ids"])]
        elif "docs" in body:
            # ES 7.15+ `docs` form: [{"_id": n, "_index": ...}]
            pins = []
            for d in _as_list(body["docs"]):
                if not isinstance(d, dict) or "_id" not in d:
                    _unsupported("pinned docs entry without _id")
                pins.append(int(d["_id"]))
        else:
            _unsupported("pinned without ids or docs")
        return idx.search_pinned(
            pins, _engine_spec(organic), k=k, join_docs=join_docs,
        )
    if kind == "distance_feature":
        if not {"field", "origin", "pivot"} <= set(body):
            _unsupported("distance_feature needs field/origin/pivot")
        return idx.search_distance_feature(
            body["field"], body["origin"], body["pivot"],
            boost=float(body.get("boost", 1.0)),
            k=k, join_docs=join_docs,
        )
    if kind.startswith("span_"):
        # span family — the whole node is the span tree (query/spans.py
        # pins semantics; BM25Index.search_spans runs it as ONE
        # positional scan + per-doc Arrow span composition)
        return idx.search_spans({kind: body}, k=k, join_docs=join_docs)
    if kind == "intervals":
        field, spec = _one_key(body, "intervals")
        if field != "content":
            _unsupported(f"intervals on field {field!r}")
        skind, sspec = _one_key(spec, "intervals source")

        def _match_args(node):
            if not isinstance(node, dict) or "query" not in node:
                _unsupported("intervals source without a query")
            return (
                node["query"],
                int(node.get("max_gaps", -1)),
                bool(node.get("ordered", False)),
            )

        if skind == "match":
            q_, gaps, ordd = _match_args(sspec)
            return idx.search_intervals(
                q_, max_gaps=gaps, ordered=ordd, k=k, join_docs=join_docs
            )
        if skind == "any_of":
            # union of the sub-sources' intervals; per this engine's
            # compound convention a doc's score sums its matching
            # sub-sources (each already a phrase-shaped BM25)
            frames = []
            for node in _as_list(sspec.get("intervals", [])):
                nkind, nspec = _one_key(node, "any_of interval")
                if nkind != "match":
                    _unsupported(f"any_of sub-source {nkind!r}")
                q_, gaps, ordd = _match_args(nspec)
                f = idx._intervals_scored(q_, gaps, ordd)
                if f is not None:
                    frames.append(f)
            if not frames:
                return idx._empty_scored(join_docs)
            u = frames[0]
            for f in frames[1:]:
                u = u.unionByName(f)
            topk = (
                u.groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
            )
            return idx._join_docs(topk) if join_docs else topk
        _unsupported(f"intervals source {skind!r} (match/any_of only)")
    if kind == "dis_max":
        specs = [_engine_spec(n) for n in _as_list(body["queries"])]
        return idx.search_dis_max(
            specs, tie_breaker=float(body.get("tie_breaker", 0.0)),
            k=k, join_docs=join_docs,
        )
    if kind == "boosting":
        return idx.search_boosting(
            _engine_spec(body["positive"]),
            _engine_spec(body["negative"]),
            negative_boost=float(body.get("negative_boost", 0.5)),
            k=k, join_docs=join_docs,
        )
    if kind == "script_score":
        inner = body.get("query")
        if inner is None:
            _unsupported("script_score without a query (no match_all)")
        script = body.get("script") or {}
        src = script.get("source") if isinstance(script, dict) else script
        if not src:
            _unsupported("script_score without script.source")
        return idx.search_script_score(
            _engine_spec(inner), src,
            params=(script.get("params")
                    if isinstance(script, dict) else None),
            min_score=body.get("min_score"),
            k=k, join_docs=join_docs,
        )
    if kind == "rank_feature":
        shapes = {n: body[n] for n in ("saturation", "log", "sigmoid")
                  if n in body}
        return idx.search_rank_feature(
            body["field"],
            boost=float(body.get("boost", 1.0)),
            k=k, join_docs=join_docs,
            **shapes,
        )
    if kind == "function_score":
        inner = body.get("query")
        if inner is None:
            _unsupported("function_score without a query (no match_all)")
        _FN_KINDS = {"filter", "weight", "field_value_factor",
                     "random_score", "gauss", "exp", "linear"}
        functions = []
        for fn in _as_list(body.get("functions", [])):
            if set(fn) - _FN_KINDS:
                _unsupported(f"function_score function keys {sorted(fn)!r} "
                             f"(supported: {sorted(_FN_KINDS)})")
            entry = {n: v for n, v in fn.items() if n != "filter"}
            if "weight" in entry:
                entry["weight"] = float(entry["weight"])
            if "filter" in fn:
                entry["filter"] = _filter_predicate([fn["filter"]])
            functions.append(entry)
        return idx.search_function_score(
            _engine_spec(inner),
            field_value_factor=body.get("field_value_factor"),
            functions=functions or None,
            boost_mode=body.get("boost_mode", "multiply"),
            score_mode=body.get("score_mode", "multiply"),
            max_boost=body.get("max_boost"),
            k=k, join_docs=join_docs,
        )
    if kind == "more_like_this":
        # like entries: free text strings and/or {"_id": n} doc refs —
        # a liked doc's term frequencies come back from term_vectors
        # (the index stores no raw content; MLT selection needs only
        # counts), and liked docs are excluded from the results (ES
        # include=false default)
        texts, ref_ids = [], []
        for e in _as_list(body["like"]):
            if isinstance(e, dict):
                if "_id" not in e:
                    _unsupported("more_like_this like-doc without _id")
                ref_ids.append(int(e["_id"]))
            else:
                texts.append(str(e))
        like_tf = None
        if ref_ids:
            like_tf = {}
            for r in idx.term_vectors(ref_ids).collect():
                like_tf[r["term"]] = like_tf.get(r["term"], 0) + int(
                    r["tf"]
                )
        return idx.more_like_this(
            " ".join(texts),
            like_tf=like_tf,
            exclude_doc_id=ref_ids or None,
            k=k,
            max_query_terms=int(body.get("max_query_terms", 25)),
            min_term_freq=int(body.get("min_term_freq", 2)),
            min_doc_freq=int(body.get("min_doc_freq", 5)),
            join_docs=join_docs,
        )
    if kind == "query_string":
        q, force_and = _query_string_args(body)
        return idx.search_boolean(q, k=k, join_docs=join_docs,
                                  force_and=force_and)
    if kind == "simple_query_string":
        q, force_and = _simple_query_string_args(body)
        return idx.search_boolean(q, k=k, join_docs=join_docs,
                                  force_and=force_and)
    _unsupported(f"query node {kind!r}")


def _content_match_terms(clause) -> Tuple[List[str], bool]:
    """(tokens, is_and) of a match clause restricted to content/no-msm.
    Options the composed paths cannot honor (fuzziness etc.) refuse
    LOUDLY — the standalone clause path supports them, so silently
    dropping one here would run a different query than requested."""
    field, q, op, msm = _match_parts(clause)
    if field != "content" or msm:
        _unsupported("composed bool: match must be on content without msm")
    _, inner = _one_key(clause, "match")
    _, spec = _one_key(inner, "match field")
    if isinstance(spec, dict):
        extra = set(spec) - {"query", "operator", "minimum_should_match"}
        if extra:
            _unsupported(
                f"composed bool: match options {sorted(extra)} "
                "(supported only as a standalone clause)"
            )
    return tokenize_py(q), op == "and"


def _execute_bool(idx, body, k, join_docs) -> DataFrame:
    must = _as_list(body.get("must", []))
    should = _as_list(body.get("should", []))
    must_not = _as_list(body.get("must_not", []))
    filters = _as_list(body.get("filter", []))

    # route filter-type clauses that ES users often put under must
    scoring_must, extra_filters = [], []
    for c in must:
        kind, _ = _one_key(c, "bool.must")
        (extra_filters if kind in _FILTERING else scoring_must).append(c)
    predicate = _filter_predicate(filters + extra_filters)

    if scoring_must and should:
        _unsupported("bool with both scoring must and should clauses")

    # must_not -> negative terms/phrases on content
    not_terms: List[str] = []
    not_phrases: List[str] = []
    for c in must_not:
        kind, _ = _one_key(c, "bool.must_not")
        if kind == "match":
            field, q, _, _ = _match_parts(c)
            if field != "content":
                _unsupported(f"must_not match on field {field!r}")
            not_terms.extend(tokenize_py(q))
        elif kind == "match_phrase":
            field, q, slop = _phrase_parts(c)
            if field != "content" or slop:
                _unsupported("must_not match_phrase with field/slop")
            not_phrases.append(q)
        else:
            _unsupported(f"must_not clause {kind!r}")
    has_neg = bool(not_terms or not_phrases)

    must_kinds = [_one_key(c, "bool.must")[0] for c in scoring_must]

    # --- composed path: phrases and/or negations over match clauses ---
    # handles: [match? ... match_phrase*] + must_not — the shape
    # search_boolean executes natively.  Multiple match clauses are
    # supported only when each is single-term (ES must = each clause
    # matches >=1 of ITS terms; single-term clauses make that the plain
    # conjunction positive_and expresses).
    composed = (
        set(must_kinds) <= {"match", "match_phrase"}
        and ("match_phrase" in must_kinds or not_phrases
             or len(must_kinds) > 1)
    )
    if scoring_must and composed:
        if predicate is not None:
            _unsupported("filter context with phrase/multi-clause bool")
        terms: List[str] = []
        phrases: List[str] = []
        match_clauses = [
            c for c in scoring_must
            if _one_key(c, "q")[0] == "match"
        ]
        positive_and = False
        if len(match_clauses) == 1:
            terms, positive_and = _content_match_terms(match_clauses[0])
        elif match_clauses:
            for c in match_clauses:
                toks, _ = _content_match_terms(c)
                if len(toks) != 1:
                    _unsupported("multiple multi-term must match clauses "
                                 "(per-clause OR is not expressible)")
                terms.extend(toks)
            positive_and = True
        for c in scoring_must:
            kind, _ = _one_key(c, "q")
            if kind == "match_phrase":
                field, q, slop = _phrase_parts(c)
                if field != "content" or slop:
                    _unsupported("bool match_phrase with field/slop")
                phrases.append(q)
        p = ParsedQuery(
            raw="<dsl>", terms=terms, not_terms=sorted(set(not_terms)),
            phrases=phrases, not_phrases=not_phrases,
            positive_and=positive_and,
            # bool.must match (OR operator): ES still REQUIRES >=1 of
            # the clause's terms — unlike the boolean-string grammar's
            # optional bare terms
            terms_required=bool(match_clauses),
        )
        if not p.terms and not p.phrases:
            return idx._empty_scored(join_docs)
        return idx._boolean_with_phrases(p, k, "blockmax", join_docs)

    # --- single scoring must clause ---
    if scoring_must:
        if len(scoring_must) > 1:
            _unsupported("multiple scoring must clauses of this kind")
        clause = scoring_must[0]
        if has_neg:
            if must_kinds[0] != "match" or predicate is not None:
                _unsupported("must_not combined with non-match or filter")
            terms, is_and = _content_match_terms(clause)
            exclude, df_sum = idx._excluded_docs(sorted(set(not_terms)))
            return idx.search(
                terms, k=k, mode="and" if is_and else "blockmax",
                join_docs=join_docs, exclude=exclude, exclude_df_sum=df_sum,
            )
        return _score_clause(idx, clause, k, predicate, join_docs)

    # --- should-only bool ---
    if should:
        terms = []
        for c in should:
            kind, _ = _one_key(c, "bool.should")
            if kind != "match":
                _unsupported(f"should clause {kind!r}")
            toks, is_and = _content_match_terms(c)
            if is_and:
                _unsupported("operator=and inside should")
            terms.extend(toks)
        msm_top = int(body.get("minimum_should_match", 1))
        if not_phrases:
            _unsupported("must_not phrases with should-only bool")
        if not_terms:
            if predicate is not None or msm_top > 1:
                _unsupported("must_not with filter/msm in should bool")
            exclude, df_sum = idx._excluded_docs(sorted(set(not_terms)))
            return idx.search(
                terms, k=k, join_docs=join_docs,
                exclude=exclude, exclude_df_sum=df_sum,
            )
        if predicate is not None:
            if msm_top > 1:
                _unsupported("minimum_should_match with filter context")
            return idx.search_filtered(
                terms, predicate, k=k, join_docs=join_docs
            )
        return idx.search(
            terms, k=k, min_should_match=msm_top, join_docs=join_docs
        )

    # --- no scoring clause: pure filter/exclusion context ---
    # ES executes these (score 0.0 per hit): filter-only bools, and
    # must_not-only bools ("everything except ...") — live docs minus
    # the negated terms'/phrases' doc ids, tombstones before the k-cut
    base = idx.docs if predicate is None else idx.docs.filter(predicate)
    hits = idx._drop_tombstones(base.select("doc_id"))
    if not_terms:
        excl, _ = idx._excluded_docs(sorted(set(not_terms)))
        if excl is not None:
            hits = hits.join(excl, "doc_id", "left_anti")
    for ph in not_phrases:
        m = idx._phrase_scored(ph)
        if m is not None:
            hits = hits.join(m.select("doc_id"), "doc_id", "left_anti")
    df = (
        hits.withColumn("score", F.lit(0.0))
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )
    return idx._join_docs(df) if join_docs else df


def _sort_pairs(entries: List) -> List[Tuple[str, str]]:
    """Normalize an ES sort section to (field, order) pairs:
    "f" | {"f": "desc"} | {"f": {"order": "desc"}} | "_score".
    ES defaults: asc for fields, desc for _score."""
    pairs: List[Tuple[str, str]] = []
    for e in entries:
        if isinstance(e, str):
            pairs.append((e, "desc" if e == "_score" else "asc"))
            continue
        f, spec = _one_key(e, "sort entry")
        if isinstance(spec, str):
            order = spec
        elif isinstance(spec, dict):
            extra = set(spec) - {"order"}
            if extra:
                _unsupported(f"sort options {sorted(extra)!r} "
                             "(order only — no mode/missing/nested)")
            order = spec.get("order", "desc" if f == "_score" else "asc")
        else:
            _unsupported(f"sort spec {spec!r}")
        if order not in ("asc", "desc"):
            _unsupported(f"sort order {order!r}")
        pairs.append((f, order))
    return pairs


def _highlight_terms(query) -> List[str]:
    """Raw a-z0-9 words of every text-query string in the node tree —
    the serving layer's highlight-term extraction (search_cached /
    main.py:175-186 highlight the raw query words); AND/OR/NOT operator
    words stripped so a query_string's operators never get marked."""
    texts: List[str] = []

    def walk(n):
        if isinstance(n, dict):
            for k, v in n.items():
                if k in ("match", "match_phrase", "match_phrase_prefix",
                         "match_bool_prefix"):
                    _, spec = _one_key(v, "highlight terms")
                    texts.append(
                        spec["query"] if isinstance(spec, dict) else spec
                    )
                elif k == "multi_match":
                    texts.append(v["query"])
                elif k in ("query_string", "simple_query_string"):
                    texts.append(v["query"] if isinstance(v, dict) else v)
                elif k == "more_like_this":
                    like = v["like"]
                    if isinstance(like, list):
                        # doc-reference entries ({'_id': n}) carry no
                        # highlightable text — only string likes do
                        texts.append(
                            " ".join(
                                x for x in like if isinstance(x, str)
                            )
                        )
                    elif isinstance(like, str):
                        texts.append(like)
                else:
                    walk(v)
        elif isinstance(n, list):
            for x in n:
                walk(x)

    walk(query)
    words = set(re.findall(r"[a-z0-9]+", " ".join(texts).lower()))
    return sorted(words - {"and", "or", "not"})


def _apply_highlight(idx, df, body, query, pages, order) -> DataFrame:
    """Run the body's `highlight` section: append a highlight_<field>
    column per requested field.  title/description come from the docs
    table; content needs the source `pages` DataFrame (the index stores
    no body text — exactly the serving layer's split).  Joins are
    broadcast on the tiny hit page; `order` restores the result order
    the joins destroyed."""
    from search_engine_spark.query.serving import (
        HIGHLIGHT_POST, HIGHLIGHT_PRE, fragment_col, highlight_col,
    )

    spec = body["highlight"]
    extra = set(spec) - {"fields", "pre_tags", "post_tags"}
    if extra:
        _unsupported(f"highlight options {sorted(extra)!r} "
                     "(fields/pre_tags/post_tags only)")
    pre = _as_list(spec.get("pre_tags", [HIGHLIGHT_PRE]))[0]
    post = _as_list(spec.get("post_tags", [HIGHLIGHT_POST]))[0]
    terms = _highlight_terms(query)
    if not terms:
        return df
    out = df
    helper_cols: List[str] = []
    for fld, opts in spec.get("fields", {}).items():
        opts = opts or {}
        bad = set(opts) - {"fragment_size", "number_of_fragments"}
        if bad:
            _unsupported(f"highlight field options {sorted(bad)!r}")
        frag = int(opts.get("fragment_size", 0))
        if int(opts.get("number_of_fragments", 1)) > 1:
            _unsupported("highlight number_of_fragments > 1 "
                         "(first-hit fragment only)")
        if fld in ("title", "description"):
            if fld not in out.columns:
                out = out.join(
                    F.broadcast(idx.docs.select("doc_id", fld)),
                    "doc_id", "left",
                )
                helper_cols.append(fld)
        elif fld == "content":
            if pages is None:
                _unsupported(
                    "highlight on content without pages= (the index "
                    "stores no body text; pass the source pages table)"
                )
            if "url" not in out.columns:
                out = out.join(
                    F.broadcast(idx.docs.select("doc_id", "url")),
                    "doc_id", "left",
                )
                helper_cols.append("url")
            if "text" not in out.columns:
                out = out.join(pages.select("url", "text"), "url", "left")
                helper_cols.append("text")
        else:
            _unsupported(f"highlight field {fld!r} "
                         "(title/description/content)")
        src = F.coalesce(F.col("text" if fld == "content" else fld),
                         F.lit(""))
        if frag:
            src = fragment_col(src, terms, size=frag)
        out = out.withColumn(
            f"highlight_{fld}", highlight_col(src, terms, pre, post)
        )
    if helper_cols:
        out = out.drop(*helper_cols)
    return out.orderBy(*order)


def _agg_context(query: Optional[Dict]) -> Tuple[object, str, Optional[Column]]:
    """(query_terms, mode, predicate) of the query node an aggs block
    runs under.  Supported: absent / match_all (the whole-live-corpus
    foreground — query_terms None, the docs table is the id set and
    the postings are never touched), match on content, or bool
    {must: [match content], filter: [...]} including filter-only bools
    (ES scores them constant; for aggs only membership matters)."""
    if query is None:
        return None, "or", None
    kind, body = _one_key(query, "aggs query")
    if kind == "match_all":
        return None, "or", None
    if kind == "match_phrase":
        field, phrase, slop = _phrase_parts(query)
        if field != "content":
            _unsupported("aggs under non-content match_phrase")
        return {"phrase": phrase, "slop": slop}, "or", None
    if kind == "match":
        field, q, op, msm = _match_parts(query)
        if field != "content" or msm:
            _unsupported("aggs under non-content match or msm")
        return q, "and" if op == "and" else "or", None
    if kind == "bool":
        must = _as_list(body.get("must", []))
        filters = _as_list(body.get("filter", []))
        if body.get("should") or body.get("must_not"):
            _unsupported("aggs under bool with should/must_not")
        scoring, extra = [], []
        for c in must:
            k, _ = _one_key(c, "aggs bool.must")
            (extra if k in _FILTERING else scoring).append(c)
        if not scoring:
            # filter-only bool: a pure filter-context foreground
            return None, "or", _filter_predicate(filters + extra)
        if len(scoring) == 1 and _one_key(scoring[0], "q")[0] == "match_phrase":
            field, phrase, slop = _phrase_parts(scoring[0])
            if field != "content":
                _unsupported("aggs under non-content match_phrase")
            return (
                {"phrase": phrase, "slop": slop},
                "or",
                _filter_predicate(filters + extra),
            )
        if len(scoring) != 1 or _one_key(scoring[0], "q")[0] != "match":
            _unsupported("aggs bool needs exactly one match must clause")
        field, q, op, msm = _match_parts(scoring[0])
        if field != "content" or msm:
            _unsupported("aggs under non-content match or msm")
        return (
            q,
            "and" if op == "and" else "or",
            _filter_predicate(filters + extra),
        )
    _unsupported(f"aggs under query node {kind!r}")


_METRIC_AGGS = {"avg", "sum", "min", "max", "value_count"}
_PIPELINE_AGGS = {
    "derivative", "cumulative_sum", "moving_fn", "moving_avg",
    "serial_diff", "bucket_script", "bucket_selector", "bucket_sort",
    "normalize", "moving_percentiles",
}
_SIBLING_AGGS = {
    "avg_bucket", "sum_bucket", "min_bucket", "max_bucket", "stats_bucket",
}


def _split_pipeline(nested) -> Tuple[Dict, List]:
    """Split a bucketing agg's nested dict into (metric leaves,
    pipeline nodes).  Pipeline nodes -> (name, kind, spec) applied in
    body order; buckets_path '_count' means doc_count."""
    metrics, pipes = {}, []
    for n, v in (nested or {}).items():
        kind, spec = _one_key(v, "nested agg node")
        if kind in _PIPELINE_AGGS:
            pipes.append((n, kind, spec))
        else:
            metrics[n] = v
    return metrics, pipes


def _path_col(df, path):
    """Resolve an ES buckets_path onto a bucket-DataFrame column."""
    metric = "doc_count" if path in ("_count", "doc_count") else path
    if metric not in df.columns:
        _unsupported(
            f"buckets_path {path!r} (no such metric in the bucket "
            "aggregation)"
        )
    return metric


def _script_expr(df, spec) -> str:
    """Lower an ES bucket_script/bucket_selector node's painless
    arithmetic onto a SQL expression: each buckets_path variable's
    `params.<var>` occurrences become its bucket column.  The painless
    subset accepted is exactly what is also valid SQL (+ - * / ( )
    comparisons && ||); anything leaving `params.` unresolved is
    refused."""
    import re as _re

    script = spec.get("script")
    if not isinstance(script, str):
        _unsupported("bucket_script/selector without an inline script")
    paths = spec.get("buckets_path") or {}
    if not isinstance(paths, dict):
        _unsupported("bucket_script/selector buckets_path must be a map")
    expr = script.replace("&&", " AND ").replace("||", " OR ")
    for var, path in paths.items():
        expr = _re.sub(
            rf"params\.{_re.escape(var)}\b", _path_col(df, path), expr
        )
    if "params." in expr:
        _unsupported(f"unresolved script variable in {script!r}")
    return expr


def _apply_pipeline(idx, df, pipes):
    """Chain bucket_pipeline outputs onto a bucket DataFrame, in body
    order (so a bucket_selector can reference a bucket_script output
    declared before it, like ES)."""
    for name, kind, spec in pipes:
        if kind == "bucket_script":
            df = idx.bucket_pipeline(
                df, bucket_script=(name, _script_expr(df, spec))
            )
            continue
        if kind == "bucket_selector":
            df = idx.bucket_pipeline(
                df, bucket_selector=_script_expr(df, spec)
            )
            continue
        if kind == "bucket_sort":
            keys = []
            for s in _as_list(spec.get("sort", [])):
                col, d = _one_key(s, "bucket_sort sort")
                if isinstance(d, dict):
                    d = d.get("order", "asc")
                keys.append((
                    _path_col(df, "key" if col == "_key" else col), d
                ))
            size = spec.get("size")
            df = idx.bucket_pipeline(
                df,
                bucket_sort=(
                    keys, int(spec.get("from", 0)),
                    int(size) if size is not None else None,
                ),
            )
            continue
        metric = _path_col(df, spec.get("buckets_path", "_count"))
        if kind == "normalize":
            df = idx.bucket_pipeline(
                df, metric, normalize=(name, spec.get("method", "")),
            )
        elif kind == "moving_percentiles":
            # this engine reads the raw metric over the trailing window
            # (exact interpolated percentile) where ES merges percentile
            # sketches — `percent` picks the single percentile reported
            df = idx.bucket_pipeline(
                df, metric,
                moving_percentiles=(
                    name, int(spec.get("window", 5)),
                    float(spec.get("percent", 50.0)),
                ),
            )
        elif kind == "derivative":
            df = idx.bucket_pipeline(df, metric, derivative=name)
        elif kind == "cumulative_sum":
            df = idx.bucket_pipeline(df, metric, cumulative_sum=name)
        elif kind == "serial_diff":
            df = idx.bucket_pipeline(
                df, metric, serial_diff=(name, int(spec.get("lag", 1)))
            )
        else:  # moving_fn / moving_avg — unweighted average window
            df = idx.bucket_pipeline(
                df, metric, moving_avg=(name, int(spec.get("window", 5)))
            )
    return df


def _terms_order(spec) -> Optional[Tuple[str, str]]:
    """ES terms `order` option → the engine's order_by tuple.
    `_count` → doc_count, `_key` → value; anything else names a metric
    sub-agg column."""
    order = spec.get("order")
    if not order:
        return None
    k, d = _one_key(order, "terms order")
    return {"_count": "doc_count", "_key": "value"}.get(k, k), d


def _metric_subaggs(nested) -> Optional[Dict]:
    """Nested avg/sum/min/max sub-aggs of a bucketing agg -> the
    engine's metrics dict; None when absent, refuse anything else."""
    if not nested:
        return None
    kinds = {n: _one_key(v, "nested agg node") for n, v in nested.items()}
    bad = [k for k, _ in kinds.values() if k not in {"avg", "sum", "min", "max"}]
    if bad:
        _unsupported(f"nested agg {bad[0]!r} under a bucketing agg "
                     "(only avg/sum/min/max metrics)")
    return {n: (k, s["field"]) for n, (k, s) in kinds.items()}


def execute_es_knn(
    idx,
    body: Dict,
    embeddings: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    approximate: bool = False,
    join_docs: bool = True,
    ann=None,
) -> DataFrame:
    """The ES kNN search section: {"knn": {"query_vector": [...],
    "k": n, "filter": [...], "boost": b}} → cosine top-k over a
    dense-vector column, restricted to live docs passing the filter.

    The index itself stores no vectors (the reference's data model has
    none — ES likewise keeps dense_vector fields alongside the text);
    `embeddings` supplies (id_col, vec_col) aligned with the index's
    doc ids.  Default is the exact brute-force cosine scan (the
    baseline ES's HNSW approximates); `approximate=True` switches to
    the multi-probe LSH-bucketed scan (ops/similarity).  `ann` takes a
    persisted ops.ann_index.AnnIndex instead — the SCALE path: train/
    encode amortized across queries, every search a partition-pruned
    scan of the stored table.  The live/filter mask is applied DURING
    the scan for the embeddings paths; for `ann` it is a post-filter
    over an over-fetched candidate window (4k when any mask applies —
    the stored table knows nothing of tombstones), so heavily-filtered
    ann searches can return <k rows, same trade as ES's post_filter.
    `num_candidates` is accepted and ignored — it tunes HNSW beam
    width, which has no analogue here.

    Hybrid search: when the body carries BOTH `knn` and `query`, the
    two candidate sets are combined the way ES documents it — final
    score = query_score + knn_score * knn.boost over the UNION of the
    query's top-`size` window and the knn top-k (a doc absent from one
    side contributes 0 from that side), paged by from/size.  Returns
    (doc_id, score) [+ docs columns], ties doc_id asc."""
    spec = body["knn"]
    qv = [float(x) for x in spec["query_vector"]]
    k = int(spec.get("k", 10))
    boost = float(spec.get("boost", 1.0))
    if boost <= 0:
        raise ValueError(f"knn boost must be > 0, got {boost}")
    pred = (
        _filter_predicate(_as_list(spec["filter"]))
        if spec.get("filter") is not None
        else None
    )
    allowed = idx._matched_ids(None, predicate=pred)  # live ∩ filter

    if ann is not None:
        fetch = k if (pred is None and idx.tombstones is None) else 4 * k
        hits = (
            ann.search(qv, k=fetch)
            .withColumnRenamed("id", "doc_id")
            .withColumnRenamed("cosine", "score")
            .join(allowed, "doc_id", "left_semi")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    else:
        if embeddings is None:
            raise ValueError("execute_es_knn needs `embeddings` or `ann`")
        emb = embeddings.select(
            F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_v")
        ).join(allowed, "doc_id", "left_semi")

        from search_engine_spark.ops.similarity import (
            brute_force_topk,
            lsh_bucketed_topk,
        )

        fn = lsh_bucketed_topk if approximate else brute_force_topk
        hits = (
            fn(emb, "doc_id", "_v", qv, k=k)
            .withColumnRenamed("id", "doc_id")
            .withColumnRenamed("cosine", "score")
        )
    if boost != 1.0:
        hits = hits.withColumn("score", F.col("score") * F.lit(boost))

    if body.get("query") is not None:
        # ES hybrid: each side ranks independently; scores sum over the
        # union (knn boost already applied above; the query side's
        # boosts live inside its own clauses)
        frm = int(body.get("from", 0))
        size = int(body.get("size", 10))
        qbody = {kk: vv for kk, vv in body.items() if kk != "knn"}
        qbody["from"] = 0
        qbody["size"] = frm + size
        qhits = execute_es_query(idx, qbody, join_docs=False)
        combined = (
            qhits.select("doc_id", F.col("score").alias("_qs"))
            .join(
                hits.select("doc_id", F.col("score").alias("_ks")),
                "doc_id",
                "full_outer",
            )
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("_qs"), F.lit(0.0))
                    + F.coalesce(F.col("_ks"), F.lit(0.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(frm + size)
        )
        if frm:
            w = F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            )
            combined = (
                combined.withColumn("_rn", w)
                .filter(F.col("_rn") > frm)
                .drop("_rn")
            )
        return idx._join_docs(combined) if join_docs else combined
    return idx._join_docs(hits) if join_docs else hits


def execute_es_suggest(idx, body: Dict) -> Dict[str, object]:
    """Execute the `suggest` section of an ES request body.

    {"suggest": {name: {"text": ..., "term": {...}}          → suggest_terms
                 name: {"text": ..., "phrase": {...}}        → suggest_phrase
                 name: {"prefix": ..., "completion": {...}}, ...}}
                                                      → suggest_completion

    Option subset mirrored from ES: term → size/max_edits/prefix_length/
    min_word_length/suggest_mode (field must be "content" when given);
    phrase → size/max_errors/confidence/real_word_error_likelihood plus
    the FIRST direct_generator's max_edits/prefix_length/min_word_length/
    size (ES nests candidate-generator options there).  Unknown node
    types raise NotImplementedError."""
    sug = body.get("suggest")
    if not sug:
        _unsupported("body without a suggest section")
    out: Dict[str, object] = {}
    for name, node in sug.items():
        text = node.get("text", node.get("prefix"))
        if text is None:
            _unsupported(f"suggester {name!r} without text/prefix")
        kinds = [k for k in node if k not in ("text", "prefix")]
        if len(kinds) != 1 or kinds[0] not in (
            "term", "phrase", "completion"
        ):
            _unsupported(
                f"suggester node {kinds!r} (term/phrase/completion only)"
            )
        kind, spec = kinds[0], node[kinds[0]]
        field = spec.get("field")
        if field is not None and field != "content":
            _unsupported(f"suggester over field {field!r} (content only)")
        if kind == "completion":
            # ES completion suggesters take the input under "prefix"
            out[name] = idx.suggest_completion(
                node.get("prefix", text), size=int(spec.get("size", 10))
            )
        elif kind == "term":
            out[name] = idx.suggest_terms(
                text,
                size=int(spec.get("size", 5)),
                max_edits=int(spec.get("max_edits", 2)),
                prefix_length=int(spec.get("prefix_length", 1)),
                min_word_length=int(spec.get("min_word_length", 4)),
                suggest_mode=spec.get("suggest_mode", "missing"),
            )
        else:
            gen = (spec.get("direct_generator") or [{}])[0]
            out[name] = idx.suggest_phrase(
                text,
                size=int(spec.get("size", 5)),
                max_errors=int(spec.get("max_errors", 1)),
                confidence=float(spec.get("confidence", 1.0)),
                real_word_error_likelihood=float(
                    spec.get("real_word_error_likelihood", 0.95)
                ),
                max_edits=int(gen.get("max_edits", 2)),
                prefix_length=int(gen.get("prefix_length", 1)),
                min_word_length=int(gen.get("min_word_length", 4)),
                num_candidates=int(gen.get("size", 5)),
                collate="collate" in spec,
            )
    return out


def render_search_template(source: str, params: Dict) -> Dict:
    """Mustache-subset rendering for ES search templates:
    `{{#toJson}}name{{/toJson}}` splices the parameter as JSON;
    `"{{name}}"` (a placeholder filling a whole JSON value) becomes the
    parameter's JSON form — numbers stay numbers, strings stay quoted;
    bare `{{name}}` inside larger strings interpolates as text
    ("{{field}}^2").  Sections/defaults/partials are out of scope and
    left verbatim (json.loads then fails loudly).  Missing parameters
    raise KeyError, like ES's template render error."""
    import json as _json
    import re as _re

    s = _re.sub(
        r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}",
        lambda m: _json.dumps(params[m.group(1)]),
        source,
    )
    s = _re.sub(
        r'"\{\{(\w+)\}\}"', lambda m: _json.dumps(params[m.group(1)]), s
    )
    s = _re.sub(r"\{\{(\w+)\}\}", lambda m: str(params[m.group(1)]), s)
    return _json.loads(s)


def execute_es_search_template(idx, body: Dict, join_docs: bool = True):
    """The ES `_search/template` API: {"source": <template>, "params":
    {...}} — render the mustache-subset template, then execute the
    resulting request body.  `source` may be the ES-style JSON string
    or an already-parsed dict (re-serialized before rendering)."""
    import json as _json

    src = body.get("source")
    if src is None:
        _unsupported("search template without a source")
    if isinstance(src, dict):
        src = _json.dumps(src)
    rendered = render_search_template(src, body.get("params", {}))
    return execute_es_query(idx, rendered, join_docs=join_docs)


def execute_es_msearch(idx, bodies, join_docs: bool = True):
    """The ES `_msearch` API: a list of request bodies executed against
    the same index, returning one result per body in order.  Plan
    construction is lazy per body; Spark schedules the actions as the
    caller consumes them (for plain same-shaped match queries prefer
    BM25Index.search_many, which batches ALL queries into one job)."""
    return [execute_es_query(idx, b, join_docs=join_docs) for b in bodies]


def execute_es_validate(idx, body: Dict) -> Dict[str, object]:
    """The ES `_validate/query` API: is this request body executable
    under the supported grammar?  Lowering is lazy (DataFrame plans
    build without running), so validation = constructing the plan and
    catching the explicit refusals; {"valid": bool[, "error": str]},
    mirroring ES's explain=false response shape."""
    try:
        execute_es_query(idx, body, join_docs=False)
        return {"valid": True}
    except NotImplementedError as e:  # grammar refusal
        return {"valid": False, "error": str(e)}
    except (KeyError, TypeError, ValueError) as e:  # malformed body
        return {"valid": False, "error": f"{type(e).__name__}: {e}"}


def execute_es_count(idx, body: Dict) -> int:
    """The ES `GET /{index}/_count` API: exact hits.total of a request
    body's query — the count the reference's /search response reports
    as `total_results` (main.py:218) served standalone, with no top-k
    work.  Lowered onto count_matches (ids-only decode; tfs/doclens
    never unpack), so the cost is one distinct-count over the query
    terms' pruned buckets.  Supported query nodes mirror the aggs
    foreground (match on content / bool must+filter); an absent query
    or match_all counts the LIVE corpus (tombstones excluded), like ES
    after deletes.  Unsupported shapes raise NotImplementedError."""
    query = body.get("query")
    if query is None or _one_key(query, "count query")[0] == "match_all":
        return int(idx._drop_tombstones(idx.docs.select("doc_id")).count())
    q, mode, predicate = _agg_context(query)
    return int(idx.count_matches(q, mode=mode, predicate=predicate))


def execute_es_update_by_query(idx, body: Dict, source_pages):
    """The ES `POST /{index}/_update_by_query` API: re-index every
    document the body's query matches with the script applied.

    Query lowering mirrors the aggs foreground: absent / match_all
    (whole live corpus), match on content (full-text matches become a
    url set via the ids-only pre-pass — only doc_ids decode), bool
    must+filter, or pure filter-context bools (which lower to a
    docs-table predicate and never touch the postings).

    ES scripts are painless; this engine's documented subset is
    `{"script": {"lang": "spark_sql", "source": {column: sql_expr}}}`
    — assignments over the source columns (html/warc_ts/lang), run as
    ONE tombstone+delta merge batch (index/merge.py:update_by_query).
    Painless sources raise NotImplementedError naming the gap, never a
    silent wrong answer.  `source_pages` is the `_source` store (the
    pages table the index was built from)."""
    from search_engine_spark.index.merge import update_by_query

    script = body.get("script")
    if not isinstance(script, dict) or "source" not in script:
        _unsupported("_update_by_query without script.source")
    if script.get("lang", "painless") != "spark_sql" or not isinstance(
        script["source"], dict
    ):
        _unsupported(
            "_update_by_query painless scripts (supported subset: "
            'lang "spark_sql" with source {column: sql_expr})'
        )
    assignments = script["source"]
    query = body.get("query")
    kw: Dict[str, object] = {}
    if query is not None and _one_key(query, "ubq query")[0] != "match_all":
        q, mode, predicate = _agg_context(query)
        if q is None:
            kw["predicate"] = predicate
        else:
            matched = idx._matched_ids(q, mode, predicate)
            if matched is None:
                return update_by_query(
                    idx.spark, str(idx.paths.root), source_pages,
                    assignments, urls=[],
                )
            kw["match_urls"] = matched.join(
                idx.docs.select("doc_id", "url"), "doc_id"
            ).select("url")
    return update_by_query(
        idx.spark, str(idx.paths.root), source_pages, assignments, **kw
    )


def execute_es_aggs(idx, body: Dict, _foreground=None) -> Dict[str, object]:
    """Execute the `aggs` section of an ES request body.

    {"query": ..., "aggs": {name: {<type>: {...}}, ...}} → {name:
    DataFrame} (cardinality returns an int, matching its single-value
    ES response).  Supported agg types and their engine methods:

      terms → facet_counts (order/missing/min_doc_count options; with
        a nested top_hits sub-agg → facet_top_hits; with metric leaves
        → facet_terms_metrics incl. order-by-metric; with a nested
        terms/histogram/date_histogram bucket agg → facet_terms_buckets),
        stats → facet_stats, extended_stats → facet_extended_stats,
        weighted_avg → facet_weighted_avg, histogram/date_histogram →
        facet_(date_)histogram with metric leaves AND pipeline nodes
        (derivative / cumulative_sum / moving_fn / serial_diff /
        bucket_script / bucket_selector / bucket_sort →
        bucket_pipeline, applied in body order; sibling avg_bucket /
        sum_bucket / min_bucket / max_bucket / stats_bucket nodes at
        the body level reference a bucket agg via buckets_path
        "agg>metric" → sibling_bucket_stats),
        range → facet_range, date_range → facet_date_range,
        auto_date_histogram → facet_auto_date_histogram (returns
        {"interval", "buckets"}, like ES reporting the interval it
        settled on), cardinality → facet_cardinality
        (precision_threshold>0 keeps ES's always-approximate HLL
        semantics), percentiles → facet_percentiles,
        significant_terms / significant_text → significant_terms
        (over the indexed text, like ES on the analyzed field),
        composite → facet_composite (terms sources, after cursor),
        filter → facet_filter (one narrowed bucket + metric leaves, or
        one nested bucket agg with the predicate combined in),
        filters → facet_filters (keyed predicate buckets, one
        conditional-agg pass), adjacency_matrix →
        facet_adjacency_matrix, missing → facet_missing, multi_terms →
        facet_multi_terms, rare_terms → facet_rare_terms, top_metrics
        → facet_top_metrics, percentile_ranks →
        facet_percentile_ranks, sampler / diversified_sampler →
        sampler_ids + sub-aggs re-executed over the sampled id set,
        date_histogram + {cardinality, cumulative_cardinality} →
        facet_cumulative_cardinality (one exact first-appearance
        pass), global → sub-aggs re-executed over the
        whole live corpus (match_all foreground), ignoring the body's
        query.  Foregrounds: match / match_phrase / bool(must+filter) /
        filter-only bool / match_all / absent query.

    The query node supplies the foreground exactly as in ES: hits of
    the (match / bool must+filter) query."""
    body = _apply_runtime(body)
    aggs = body.get("aggs") or body.get("aggregations")
    if not aggs:
        _unsupported("body without an aggs section")
    if _foreground is not None:
        # pre-computed id-set foreground (sampler/diversified_sampler
        # recursion) — predicates were already folded into the sample
        q, mode, predicate = _foreground, "or", None
    else:
        q, mode, predicate = _agg_context(body.get("query"))
    out: Dict[str, object] = {}
    siblings: List[Tuple[str, str, Dict]] = []
    for name, node in aggs.items():
        sub = dict(node)
        nested = sub.pop("aggs", None) or sub.pop("aggregations", None)
        kind, spec = _one_key(sub, f"agg {name!r}")
        if kind in _SIBLING_AGGS:
            # sibling pipeline agg — aggregate OVER another agg's
            # buckets; resolved after every bucket agg has run
            if nested:
                _unsupported(f"sub-aggs under a {kind} agg")
            siblings.append((name, kind, spec))
            continue
        if kind == "terms":
            field = spec["field"]
            size = int(spec.get("size", 10))
            if nested:
                # a nested node may carry its own aggs (bucket-in-bucket
                # with metric leaves) — split those off before keying
                leaves = {
                    n: (v.get("aggs") or v.get("aggregations"))
                    for n, v in nested.items()
                }
                kinds = {
                    n: _one_key(
                        {k: s for k, s in v.items()
                         if k not in ("aggs", "aggregations")},
                        "nested agg node",
                    )
                    for n, v in nested.items()
                }
                metric_ops = {"avg", "sum", "min", "max"}
                if all(k in metric_ops for k, _ in kinds.values()):
                    if any(leaves.values()):
                        _unsupported("aggs nested under a metric agg")
                    # metric sub-aggs fold into the bucket pass
                    out[name] = idx.facet_terms_metrics(
                        q, field,
                        {n: (k, s["field"]) for n, (k, s) in kinds.items()},
                        size=size, mode=mode, predicate=predicate,
                        order_by=_terms_order(spec),
                    )
                elif len(kinds) == 1 and next(iter(kinds.values()))[0] == "top_hits":
                    nkind, nspec = next(iter(kinds.values()))
                    out[name] = idx.facet_top_hits(
                        q, field, size=size,
                        hits_per_bucket=int(nspec.get("size", 3)),
                        mode=mode, predicate=predicate,
                    )
                elif len(kinds) == 1 and next(iter(kinds.values()))[0] in {
                    "terms", "histogram", "date_histogram"
                }:
                    # bucket-in-bucket: terms -> terms|histogram|
                    # date_histogram [-> metric leaves] — ONE composite-
                    # key groupBy via facet_terms_buckets
                    nname = next(iter(kinds))
                    nkind, nspec = kinds[nname]
                    leaf = leaves[nname]
                    if nkind == "terms":
                        inner = ("terms", nspec["field"])
                        inner_size = int(nspec.get("size", 10))
                    elif nkind == "histogram":
                        inner = (
                            "histogram", nspec["field"],
                            float(nspec["interval"]),
                        )
                        inner_size = 10
                    else:
                        if "calendar_interval" not in nspec:
                            _unsupported(
                                "nested date_histogram without "
                                "calendar_interval"
                            )
                        inner = (
                            "date_histogram", nspec["field"],
                            nspec["calendar_interval"],
                        )
                        inner_size = 10
                    out[name] = idx.facet_terms_buckets(
                        q, field, inner, size=size, inner_size=inner_size,
                        mode=mode, predicate=predicate,
                        metrics=_metric_subaggs(leaf),
                    )
                else:
                    _unsupported(
                        "nested aggs under terms (supported: one top_hits,"
                        " one nested terms/histogram/date_histogram bucket"
                        " agg with optional metric leaves,"
                        " or any mix of avg/sum/min/max metrics)"
                    )
            else:
                out[name] = idx.facet_counts(
                    q, field, size=size, mode=mode, predicate=predicate,
                    order_by=_terms_order(spec),
                    min_doc_count=int(spec.get("min_doc_count", 1)),
                    missing=spec.get("missing"),
                )
        elif kind == "stats":
            out[name] = idx.facet_stats(
                q, spec["field"], mode=mode, predicate=predicate
            )
        elif kind == "extended_stats":
            out[name] = idx.facet_extended_stats(
                q, spec["field"], sigma=float(spec.get("sigma", 2.0)),
                mode=mode, predicate=predicate,
            )
        elif kind == "weighted_avg":
            out[name] = idx.facet_weighted_avg(
                q, spec["value"]["field"], spec["weight"]["field"],
                mode=mode, predicate=predicate,
            )
        elif kind in _METRIC_AGGS:
            # bare single-value metric agg (ES avg/sum/min/max/
            # value_count) — one facet_stats pass, project the value
            col = "count" if kind == "value_count" else kind
            out[name] = idx.facet_stats(
                q, spec["field"], mode=mode, predicate=predicate
            ).select(F.col(col).alias("value"))
        elif kind == "histogram":
            mets, pipes = _split_pipeline(nested)
            eb, hb = spec.get("extended_bounds"), spec.get("hard_bounds")
            out[name] = _apply_pipeline(
                idx,
                idx.facet_histogram(
                    q, spec["field"], float(spec["interval"]),
                    mode=mode, predicate=predicate,
                    metrics=_metric_subaggs(mets),
                    offset=float(spec.get("offset", 0.0)),
                    min_doc_count=int(spec.get("min_doc_count", 1)),
                    extended_bounds=(
                        (float(eb["min"]), float(eb["max"])) if eb else None
                    ),
                    hard_bounds=(
                        (float(hb["min"]), float(hb["max"])) if hb else None
                    ),
                ),
                pipes,
            )
        elif kind in ("sampler", "diversified_sampler"):
            if not nested:
                _unsupported(f"{kind} agg without sub-aggs")
            ids = idx.sampler_ids(
                q, shard_size=int(spec.get("shard_size", 100)),
                mode=mode, predicate=predicate,
                field=spec.get("field"),
                max_docs_per_value=(
                    int(spec.get("max_docs_per_value", 1))
                    if kind == "diversified_sampler" else None
                ),
            )
            if ids is None:
                ids = idx.spark.createDataFrame([], "doc_id long")
            # the sample is <= shard_size rows but sits on an
            # exhaustive scoring pass — materialize once so every
            # sub-agg (and the doc_count) reuses it
            ids = ids.localCheckpoint()
            out[name] = {
                "doc_count": ids.count(),
                **execute_es_aggs(idx, {"aggs": nested}, _foreground=ids),
            }
        elif kind == "date_histogram" and nested and any(
            "cumulative_cardinality" in n for n in nested.values()
        ):
            # {dh, aggs: {u: {cardinality}, t: {cumulative_cardinality:
            # {buckets_path: "u"}}}} — the whole shape lowers onto ONE
            # exact first-appearance pass (facet_cumulative_cardinality)
            kinds2 = {
                n: _one_key(
                    {k2: v2 for k2, v2 in v.items()
                     if k2 not in ("aggs", "aggregations")},
                    "nested agg node",
                )
                for n, v in nested.items()
            }
            cards = {n: s for n, (k2, s) in kinds2.items()
                     if k2 == "cardinality"}
            ccs = {n: s for n, (k2, s) in kinds2.items()
                   if k2 == "cumulative_cardinality"}
            if len(cards) != 1 or len(ccs) != 1 or len(kinds2) != 2:
                _unsupported(
                    "cumulative_cardinality needs exactly one "
                    "cardinality sibling under the date_histogram"
                )
            (cc_spec,) = ccs.values()
            if cc_spec.get("buckets_path") != next(iter(cards)):
                _unsupported(
                    "cumulative_cardinality buckets_path must name "
                    "the sibling cardinality agg"
                )
            out[name] = idx.facet_cumulative_cardinality(
                q, next(iter(cards.values()))["field"], spec["field"],
                calendar_interval=spec.get("calendar_interval"),
                fixed_interval=spec.get("fixed_interval"),
                mode=mode, predicate=predicate,
            )
        elif kind == "date_histogram":
            if "calendar_interval" not in spec and \
                    "fixed_interval" not in spec:
                _unsupported("date_histogram needs calendar_interval "
                             "or fixed_interval")
            rate_nodes = {}
            if nested:
                nested = dict(nested)
                for n in list(nested):
                    k2, s2 = _one_key(nested[n], "nested agg node")
                    if k2 == "rate":
                        if "fixed_interval" not in spec:
                            _unsupported(
                                "rate under a calendar_interval "
                                "date_histogram (bucket widths vary)"
                            )
                        if "field" in s2:
                            _unsupported("rate with a field (doc_count "
                                         "rate only)")
                        rate_nodes[n] = s2
                        del nested[n]
            mets, pipes = _split_pipeline(nested)
            eb = spec.get("extended_bounds")
            df = idx.facet_date_histogram(
                q, spec["field"],
                calendar_interval=spec.get("calendar_interval"),
                fixed_interval=spec.get("fixed_interval"),
                offset=spec.get("offset"),
                min_doc_count=int(spec.get("min_doc_count", 1)),
                extended_bounds=(
                    (eb["min"], eb["max"]) if eb else None
                ),
                mode=mode, predicate=predicate,
                metrics=_metric_subaggs(mets),
            )
            for n, s2 in rate_nodes.items():
                df = idx.rate(
                    df, spec["fixed_interval"],
                    unit=s2.get("unit", "day"),
                ).withColumnRenamed("rate", n)
            out[name] = _apply_pipeline(idx, df, pipes)
        elif kind == "range":
            ranges = [
                (r.get("from"), r.get("to")) for r in spec["ranges"]
            ]
            out[name] = idx.facet_range(
                q, spec["field"], ranges, mode=mode, predicate=predicate
            )
        elif kind == "date_range":
            ranges = [
                (r.get("from"), r.get("to")) for r in spec["ranges"]
            ]
            out[name] = idx.facet_date_range(
                q, spec["field"], ranges, mode=mode, predicate=predicate
            )
        elif kind == "auto_date_histogram":
            if nested:
                _unsupported("sub-aggs under an auto_date_histogram agg")
            df, interval = idx.facet_auto_date_histogram(
                q, spec["field"],
                buckets=int(spec.get("buckets", 10)),
                mode=mode, predicate=predicate,
            )
            # ES reports the interval it settled on alongside buckets
            out[name] = {"interval": interval, "buckets": df}
        elif kind == "cardinality":
            out[name] = idx.facet_cardinality(
                q, spec["field"], mode=mode, predicate=predicate,
                approx=bool(spec.get("precision_threshold")),
            )
        elif kind == "boxplot":
            out[name] = idx.facet_boxplot(
                q, spec["field"], mode=mode, predicate=predicate,
            )
        elif kind == "median_absolute_deviation":
            out[name] = idx.facet_mad(
                q, spec["field"], mode=mode, predicate=predicate,
            )
        elif kind == "string_stats":
            out[name] = idx.facet_string_stats(
                q, spec["field"],
                show_distribution=bool(spec.get("show_distribution")),
                mode=mode, predicate=predicate,
            )
        elif kind == "t_test":
            out[name] = idx.facet_t_test(
                q, spec["a"], spec["b"],
                type=spec.get("type", "heteroscedastic"),
                mode=mode, predicate=predicate,
            )
        elif kind == "variable_width_histogram":
            out[name] = idx.facet_variable_width_histogram(
                q, spec["field"], int(spec["buckets"]),
                mode=mode, predicate=predicate,
            )
        elif kind == "percentiles":
            out[name] = idx.facet_percentiles(
                q, spec["field"],
                [float(p) for p in spec["percents"]]
                if spec.get("percents") else None,
                mode=mode, predicate=predicate,
            )
        elif kind == "percentile_ranks":
            out[name] = idx.facet_percentile_ranks(
                q, spec["field"],
                [float(v) for v in spec["values"]],
                mode=mode, predicate=predicate,
            )
        elif kind in ("significant_terms", "significant_text"):
            # significant_text over the analyzed content field IS this
            # engine's significant_terms (it always reads the indexed
            # token stream, the re-analysis ES does per hit)
            out[name] = idx.significant_terms(
                q, size=int(spec.get("size", 10)),
                min_doc_count=int(spec.get("min_doc_count", 3)),
                mode=mode, predicate=predicate,
            )
        elif kind == "composite":
            fields, src_names = [], []
            for src in spec["sources"]:
                sname, srcnode = _one_key(src, "composite source")
                skind, sspec = _one_key(srcnode, "composite source node")
                if skind not in ("terms", "histogram", "date_histogram"):
                    _unsupported(f"composite source {skind!r}")
                fields.append({skind: sspec})
                src_names.append(sname)
            after = spec.get("after")
            if isinstance(after, dict):  # ES's {source_name: last_value}
                after = tuple(after[n] for n in src_names)
            elif after is not None:
                after = tuple(after)
            out[name] = idx.facet_composite(
                q, fields, size=int(spec.get("size", 10)),
                after=after, mode=mode, predicate=predicate,
            )
        elif kind == "top_metrics":
            if nested:
                _unsupported("sub-aggs under a top_metrics agg")
            mspecs = _as_list(spec["metrics"])
            sfield, sdir = _one_key(spec["sort"], "top_metrics sort")
            if isinstance(sdir, dict):
                sdir = sdir.get("order", "asc")
            out[name] = idx.facet_top_metrics(
                q, [m["field"] for m in mspecs], (sfield, sdir),
                size=int(spec.get("size", 1)),
                mode=mode, predicate=predicate,
            )
        elif kind == "multi_terms":
            if nested:
                _unsupported("sub-aggs under a multi_terms agg")
            out[name] = idx.facet_multi_terms(
                q,
                [t["field"] for t in spec["terms"]],
                size=int(spec.get("size", 10)),
                mode=mode, predicate=predicate,
            )
        elif kind == "rare_terms":
            if nested:
                _unsupported("sub-aggs under a rare_terms agg")
            out[name] = idx.facet_rare_terms(
                q, spec["field"],
                max_doc_count=int(spec.get("max_doc_count", 1)),
                mode=mode, predicate=predicate,
            )
        elif kind == "filter":
            # {filter: {<term/terms/range/exists node>}, aggs: {...}}
            bucket_pred = _filter_predicate([spec])
            if bucket_pred is None:  # filter: {match_all: {}}
                bucket_pred = F.lit(True)
            combined = (
                bucket_pred if predicate is None else predicate & bucket_pred
            )
            nested_bucket = None
            if nested:
                kinds2 = {
                    n: _one_key(
                        {k2: v2 for k2, v2 in v.items()
                         if k2 not in ("aggs", "aggregations")},
                        "nested agg node",
                    )
                    for n, v in nested.items()
                }
                if len(kinds2) == 1 and next(iter(kinds2.values()))[0] in {
                    "terms", "histogram", "date_histogram"
                }:
                    nested_bucket = next(iter(kinds2))
            if nested_bucket is not None:
                # {filter: X, aggs: {b: {terms|histogram|date_histogram
                # [, aggs: metrics]}}} — the nested bucketing runs over
                # the narrowed docs (combined predicate); the filter
                # bucket's own doc_count rides alongside as a 1-row DF
                nkind, nspec = kinds2[nested_bucket]
                leaf = nested[nested_bucket].get("aggs") or nested[
                    nested_bucket
                ].get("aggregations")
                if nkind == "terms":
                    mets = _metric_subaggs(leaf)
                    sub = (
                        idx.facet_terms_metrics(
                            q, nspec["field"], mets,
                            size=int(nspec.get("size", 10)),
                            mode=mode, predicate=combined,
                        )
                        if mets
                        else idx.facet_counts(
                            q, nspec["field"],
                            size=int(nspec.get("size", 10)),
                            mode=mode, predicate=combined,
                        )
                    )
                elif nkind == "histogram":
                    sub = idx.facet_histogram(
                        q, nspec["field"], float(nspec["interval"]),
                        mode=mode, predicate=combined,
                        metrics=_metric_subaggs(leaf),
                    )
                else:
                    if "calendar_interval" not in nspec:
                        _unsupported(
                            "nested date_histogram without "
                            "calendar_interval"
                        )
                    sub = idx.facet_date_histogram(
                        q, nspec["field"], nspec["calendar_interval"],
                        mode=mode, predicate=combined,
                        metrics=_metric_subaggs(leaf),
                    )
                out[name] = {
                    "doc_count": idx.facet_filter(
                        q, bucket_pred, mode=mode, predicate=predicate
                    ),
                    nested_bucket: sub,
                }
            else:
                out[name] = idx.facet_filter(
                    q, bucket_pred, metrics=_metric_subaggs(nested),
                    mode=mode, predicate=predicate,
                )
        elif kind == "filters":
            if nested:
                _unsupported("sub-aggs under a filters agg")
            keyed = spec["filters"]
            preds = {}
            for n, node in keyed.items():
                p = _filter_predicate([node])
                preds[n] = p if p is not None else F.lit(True)
            out[name] = idx.facet_filters(
                q, preds, mode=mode, predicate=predicate,
                other_bucket=bool(
                    spec.get("other_bucket")
                    or spec.get("other_bucket_key")
                ),
                other_bucket_key=spec.get("other_bucket_key", "_other_"),
            )
        elif kind == "adjacency_matrix":
            if nested:
                _unsupported("sub-aggs under an adjacency_matrix agg")
            keyed = spec["filters"]
            preds = {}
            for n, node in keyed.items():
                p = _filter_predicate([node])
                preds[n] = p if p is not None else F.lit(True)
            out[name] = idx.facet_adjacency_matrix(
                q, preds, separator=spec.get("separator", "&"),
                mode=mode, predicate=predicate,
            )
        elif kind == "missing":
            if nested:
                _unsupported("sub-aggs under a missing agg")
            out[name] = idx.facet_missing(
                q, spec["field"], mode=mode, predicate=predicate
            )
        elif kind == "matrix_stats":
            if nested:
                _unsupported("sub-aggs under a matrix_stats agg")
            out[name] = idx.facet_matrix_stats(
                q, list(spec["fields"]), mode=mode, predicate=predicate
            )
        elif kind == "global":
            # ES global agg: escape the query foreground entirely —
            # sub-aggs run over the whole live corpus (match_all)
            if not nested:
                _unsupported("global agg without sub-aggs")
            out[name] = execute_es_aggs(idx, {"aggs": nested})
        else:
            _unsupported(f"aggregation type {kind!r}")
    for name, kind, spec in siblings:
        path = spec.get("buckets_path")
        if not isinstance(path, str) or ">" not in path:
            _unsupported(
                f"{kind} buckets_path {path!r} (needs 'agg>metric')"
            )
        ref, metric_path = path.split(">", 1)
        src = out.get(ref)
        if not isinstance(src, DataFrame):
            _unsupported(
                f"{kind} buckets_path references {ref!r}, which is not "
                "a bucket aggregation in this body"
            )
        out[name] = idx.sibling_bucket_stats(
            src, _path_col(src, metric_path), kind
        )
    return out


def _execute_rescore(idx, query, rescore, k, join_docs) -> DataFrame:
    """Body-level `rescore` section: first pass = the top-level query
    (a plain-OR match on content in this subset), second pass = the
    rescore_query (match / match_phrase), combined per ES
    score_mode=total: qw × original + rw × rescore over the window."""
    if isinstance(rescore, list):
        if len(rescore) != 1:
            _unsupported("multiple rescore sections")
        rescore = rescore[0]
    window = int(rescore.get("window_size", 10))
    rq = rescore.get("query")
    if not rq or "rescore_query" not in rq:
        _unsupported("rescore without query.rescore_query")
    if rq.get("score_mode", "total") != "total":
        _unsupported(f"rescore score_mode {rq.get('score_mode')!r}")
    base_kind, _ = _one_key(query, "rescore base query")
    if base_kind != "match":
        _unsupported(f"rescore under base query {base_kind!r}")
    field, q, op, msm = _match_parts(query)
    if field != "content" or op != "or" or msm:
        _unsupported("rescore base query must be a plain OR match on "
                     "content")
    return idx.search_rescore(
        q,
        _engine_spec(rq["rescore_query"]),
        window_size=window,
        query_weight=float(rq.get("query_weight", 1.0)),
        rescore_query_weight=float(rq.get("rescore_query_weight", 1.0)),
        k=k,
        join_docs=join_docs,
    )


def _constant_hits(idx, pred, boost: float, k: int, join_docs: bool):
    """Constant-score hits off a pure docs-table scan (constant_score /
    ids / bare filter-type queries): every live doc matching `pred`
    scores `boost`, ties broken doc_id asc, postings never touched."""
    df = idx.docs.filter(pred if pred is not None else F.lit(True)).select(
        "doc_id", F.lit(boost).alias("score")
    )
    # tombstones must drop BEFORE the k-cut or a merged index could
    # under-fill the page while live matches remain
    df = idx._drop_tombstones(df).orderBy(F.asc("doc_id")).limit(k)
    return idx._join_docs(df) if join_docs else df


def execute_es_query(
    idx,
    body: Dict,
    join_docs: bool = True,
    pages: Optional[DataFrame] = None,
) -> DataFrame:
    """Execute an ES request body against a BM25Index.

    `body` is the JSON dict an ES client would POST to /_search:
    {"query": {...}, "from": o, "size": n, "_source": [...]}.
    Returns the page as a DataFrame in (score desc, doc_id asc) order
    (or the body's `sort` order).  `pages` supplies body text for
    content highlighting (the index stores none — serving-layer split).
    """
    body = _apply_runtime(body)
    query = body.get("query")
    if query is None:
        _unsupported("body without a query node")
    frm = int(body.get("from", 0))
    size = int(body.get("size", 10))
    k = frm + size  # exact page through the total order
    sort = body.get("sort")
    if sort:
        pairs = _sort_pairs(_as_list(sort))
        if pairs == [("_score", "desc")]:
            pairs = None  # explicit relevance sort IS the default order
    else:
        pairs = None
    if pairs:
        if body.get("collapse") or body.get("rescore"):
            _unsupported("sort combined with collapse/rescore")
        if body.get("script_fields"):
            _unsupported("script_fields combined with sort")
        q, mode, pred = _agg_context(query)
        if isinstance(q, dict):
            _unsupported("sort under a match_phrase query")
        df = idx.search_sorted(
            q, pairs, k=k, mode=mode, predicate=pred,
            track_scores=bool(body.get("track_scores")),
            join_docs=join_docs,
        )
        order = [
            (F.desc if d == "desc" else F.asc)(
                "score" if f == "_score" else f
            )
            for f, d in pairs
        ] + [F.asc("doc_id")]
        if frm:
            w = F.row_number().over(Window.orderBy(*order))
            df = (
                df.withColumn("_rn", w)
                .filter(F.col("_rn") > frm)
                .drop("_rn")
            )
        if body.get("highlight"):
            df = _apply_highlight(idx, df, body, query, pages, order)
        src = body.get("_source")
        if src:
            if isinstance(src, str):
                src = [src]  # ES allows "_source": "url"
            keep = [
                c for c in df.columns
                if c in set(src) | {"score", "doc_id"}
                or c.startswith("highlight_")
            ]
            df = df.select(*keep)
        return df
    collapse = body.get("collapse")
    if collapse:
        # ES top-level collapse: best doc per field value.  Foreground
        # restricted to a content match (with optional bool filter).
        cq, cmode, cpred = _agg_context(query)
        if cmode != "or" or isinstance(cq, dict):
            _unsupported("collapse under operator=and or phrase match")
        ih = collapse.get("inner_hits")
        df = idx.search_collapse(
            cq, collapse["field"], k=k, join_docs=join_docs,
            predicate=cpred,
            # an empty inner_hits object is a valid request for the
            # ES default page size (3); only ABSENCE disables it
            inner_hits_size=(
                int(ih.get("size", 3)) if ih is not None else 0
            ),
        )
        if frm:
            w = F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            )
            df = df.withColumn("_rn", w).filter(F.col("_rn") > frm).drop("_rn")
        if body.get("highlight"):
            df = _apply_highlight(
                idx, df, body, query, pages,
                [F.desc("score"), F.asc("doc_id")],
            )
        if body.get("script_fields"):
            # the collapse frame carries inner-hits columns the script
            # substitution machinery doesn't model — refuse loudly
            # rather than silently ignore the section
            _unsupported("script_fields combined with collapse")
        src = body.get("_source")
        if src:
            if isinstance(src, str):
                src = [src]
            keep = [
                c for c in df.columns
                if c in set(src) | {"score", "doc_id"}
                or c.startswith("highlight_")
                or c == "inner_hits"
            ]
            df = df.select(*keep)
        return df
    rescore = body.get("rescore")
    if rescore:
        df = _execute_rescore(idx, query, rescore, k, join_docs)
        kind = "rescore"
    else:
        kind, node_body = _one_key(query, "query")
    if kind == "rescore":
        pass
    elif kind == "bool":
        df = _execute_bool(idx, node_body, k, join_docs)
    elif kind == "constant_score":
        # ES constant_score: every doc matching the filter scores
        # `boost` — a pure metadata scan (parquet predicate pushdown),
        # never touches postings; ties broken doc_id asc like ES's
        # stable equal-score order
        df = _constant_hits(
            idx,
            _filter_predicate(_as_list(node_body["filter"])),
            float(node_body.get("boost", 1.0)),
            k,
            join_docs,
        )
    elif kind == "ids":
        # ES ids query: point lookup by doc id, constant score 1.0
        vals = [int(v) for v in node_body["values"]]
        df = _constant_hits(
            idx, F.col("doc_id").isin(vals), 1.0, k, join_docs
        )
    elif kind in _SCORING:
        df = _score_clause(idx, query, k, None, join_docs)
    elif kind in _FILTERING:
        # bare filter-type query (term/terms/range/exists/match_all):
        # ES executes it with a constant score of 1.0 per match —
        # identical to constant_score boost 1
        df = _constant_hits(
            idx, _filter_predicate([query]), 1.0, k, join_docs
        )
    else:
        _unsupported(f"query node {kind!r}")
    if frm:
        w = F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        )
        df = df.withColumn("_rn", w).filter(F.col("_rn") > frm).drop("_rn")
    if body.get("highlight"):
        df = _apply_highlight(
            idx, df, body, query, pages,
            [F.desc("score"), F.asc("doc_id")],
        )
    sfields = body.get("script_fields")
    if sfields:
        # ES script_fields: derived response columns from the painless
        # arithmetic subset — translated to native SQL exprs, doc-field
        # references joined from the docs table for the k hits only
        from search_engine_spark.query.painless import painless_to_sql

        exprs, needed = {}, set()
        for name, node in sfields.items():
            if name in ("_score", "score", "doc_id"):
                _unsupported(f"script_fields name {name!r} shadows a "
                             "reserved result column")
            script = node.get("script", node) if isinstance(node, dict) \
                else node
            src_s = script.get("source") if isinstance(script, dict) \
                else script
            if not src_s:
                _unsupported(f"script_fields {name!r} without a source")
            sql, flds = painless_to_sql(
                src_s,
                script.get("params") if isinstance(script, dict) else None,
            )
            exprs[name] = sql
            needed.update(flds)
        missing = sorted(needed - set(df.columns))
        if missing:
            df = df.join(
                idx.docs.select("doc_id", *missing), "doc_id", "left"
            )
        # ES evaluates every script field independently against the
        # SOURCE document — one select from the pre-substitution columns
        # so a script field whose name shadows a doc column can never
        # feed another script field's expression.
        df = df.withColumn("_score", F.col("score"))
        df = df.select(
            *[F.col(c) for c in df.columns
              if c != "_score" and c not in exprs],
            *[F.expr(sql).cast("double").alias(name)
              for name, sql in exprs.items()],
        )
        # drop only HELPER columns — a script field that reuses a doc
        # column's name replaced the joined column and must survive
        df = df.drop(*[c for c in missing if c not in exprs])
        if missing:
            # the join dropped the hits' ordering guarantee
            df = df.orderBy(F.desc("score"), F.asc("doc_id"))
    src = body.get("_source")
    if src:
        if isinstance(src, str):
            src = [src]  # ES allows "_source": "url"
        keep = [
            c for c in df.columns
            if c in set(src) | {"score", "doc_id"} | set(sfields or {})
            or c.startswith("highlight_")
        ]
        df = df.select(*keep)
    return df
