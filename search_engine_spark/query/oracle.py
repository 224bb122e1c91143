"""Pure-Python ranking oracles — the hermetic ground truth for tests.

SURVEY.md §3.4: the reference's only fully-specified ranker is the
standalone TF-IDF calculator (backend/ranking_service/tfidf.py:385-654);
for BM25 the reference delegates to Lucene defaults.  We pin both here
as plain-Python implementations over the same token streams the engine
sees; tests assert the distributed engine is rank-identical (tie-break:
score desc, doc_id asc) with scores matching to 1e-9.

No Spark, no numpy — deliberately the dumbest correct implementation.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

from search_engine_spark.index.scoring import B, K1
from search_engine_spark.text.tokenizer import tokenize_py


class BM25Oracle:
    """Exhaustive BM25 scorer over (doc_id -> token list)."""

    def __init__(self, docs: Dict[int, List[str]]):
        self.docs = docs
        self.n = len(docs)
        self.doclen = {d: len(t) for d, t in docs.items()}
        self.avgdl = sum(self.doclen.values()) / self.n if self.n else 0.0
        self.df: Counter = Counter()
        self.tf: Dict[int, Counter] = {}
        for d, toks in docs.items():
            c = Counter(toks)
            self.tf[d] = c
            for term in c:
                self.df[term] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: Sequence[str]) -> float:
        s = 0.0
        dl = self.doclen[doc_id]
        for t in set(terms):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0 or self.df.get(t, 0) == 0:
                continue
            s += self.idf(t) * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return s

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        terms = [t for t in set(tokenize_py(query)) if self.df.get(t, 0) > 0]
        if not terms:
            return []
        scored = [
            (d, self.score(d, terms)) for d in self.docs if self.score(d, terms) > 0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def term_scores(
        self, doc_id: int, terms: Sequence[str]
    ) -> Dict[str, float]:
        """Per-term contributions, 0.0 for absent terms — the
        reference's TFIDFScore.term_scores shape (tfidf.py:484-507)
        with this oracle's scoring formula."""
        dl = self.doclen[doc_id]
        out = {}
        for t in sorted(set(terms)):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0 or self.df.get(t, 0) == 0:
                out[t] = 0.0
                continue
            out[t] = self.idf(t) * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return out

    def or_scores(self, query, mode: str = "or") -> Dict[int, float]:
        """Full per-doc score map of the query (every matching doc, no
        top-k) — the oracle twin of the engine's _or_scored, shared by
        the compound-query ground truths (dis_max, boosting,
        function_score, rescore, bool_prefix).  mode="and" keeps only
        docs containing EVERY indexed query term."""
        toks = query if isinstance(query, list) else tokenize_py(query)
        terms = [t for t in set(toks) if self.df.get(t, 0) > 0]
        if not terms:
            return {}
        out = {}
        for d in self.docs:
            if mode == "and" and any(self.tf[d].get(t, 0) == 0 for t in terms):
                continue
            s = self.score(d, terms)
            if s > 0:
                out[d] = s
        return out

    def topk_boosting(
        self,
        positive,
        negative,
        negative_boost: float = 0.5,
        k: int = 10,
        positive_scores: Dict[int, float] = None,
        negative_ids=None,
    ) -> List[Tuple[int, float]]:
        """Boosting-query ground truth (ES `boosting`): positive
        matches score normally; those also matching the negative
        clause are demoted × negative_boost.  Callers may hand in
        precomputed positive score maps / negative id sets (for phrase
        clauses via PhraseOracle.phrase_scores)."""
        pos = (
            positive_scores
            if positive_scores is not None
            else self.or_scores(positive)
        )
        neg = (
            set(negative_ids)
            if negative_ids is not None
            else set(self.or_scores(negative))
        )
        scored = [
            (d, s * negative_boost if d in neg else s) for d, s in pos.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_dis_max(
        self,
        score_maps: List[Dict[int, float]],
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """dis_max ground truth over precomputed per-clause score maps
        (or_scores / phrase_scores): max + tie_breaker × (sum − max)."""
        docs = set()
        for m in score_maps:
            docs |= set(m)
        out = []
        for d in docs:
            ss = [m[d] for m in score_maps if d in m]
            out.append((d, max(ss) + tie_breaker * (sum(ss) - max(ss))))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def topk_function_score(
        self,
        query,
        fvalue: Dict[int, float],
        boost_mode: str = "multiply",
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """function_score ground truth: fvalue maps doc_id → combined
        function value (absent = no function matched → query score
        unchanged, as in ES).  The test computes fvalue per ES
        semantics (modifiers, weights, score_mode) — this oracle only
        applies boost_mode."""
        combine = {
            "multiply": lambda s, v: s * v,
            "sum": lambda s, v: s + v,
            "replace": lambda s, v: v,
            "max": max,
            "min": min,
            "avg": lambda s, v: (s + v) / 2.0,
        }[boost_mode]
        scored = [
            (d, combine(s, fvalue[d]) if d in fvalue else s)
            for d, s in self.or_scores(query).items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_rescore(
        self,
        query,
        rescore_scores: Dict[int, float],
        window_size: int = 50,
        query_weight: float = 1.0,
        rescore_query_weight: float = 1.0,
        k: int = 10,
    ) -> List[Tuple[int, float]]:
        """Rescore ground truth (ES rescore, score_mode=total): the
        top-window of the first-pass query re-sorted by qw × original +
        rw × rescore score (0 when the rescore query misses)."""
        window = self.topk(query, k=window_size)
        out = [
            (d, query_weight * s
             + rescore_query_weight * rescore_scores.get(d, 0.0))
            for d, s in window
        ]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def topk_filtered(
        self, query: str, allowed, k: int = 10
    ) -> List[Tuple[int, float]]:
        """Filter-context ground truth (ES bool filter clause): top-k
        over docs in `allowed` only, scored with FULL-corpus stats —
        the filter restricts, never reweights."""
        terms = [t for t in set(tokenize_py(query)) if self.df.get(t, 0) > 0]
        if not terms:
            return []
        allowed = set(allowed)
        scored = [
            (d, self.score(d, terms))
            for d in self.docs
            if d in allowed and self.score(d, terms) > 0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def facets(
        self,
        query: str,
        field_by_doc: Dict[int, str],
        size: int = 10,
        mode: str = "or",
    ) -> List[Tuple[str, int]]:
        """Terms-aggregation ground truth: doc counts per field value
        over ALL matching docs (any term for "or", every term for
        "and"), top `size` buckets ordered count desc then value asc."""
        terms = [t for t in set(tokenize_py(query)) if self.df.get(t, 0) > 0]
        if not terms:
            return []
        if mode == "and":
            matched = [
                d for d in self.docs
                if all(self.tf[d].get(t, 0) > 0 for t in terms)
            ]
        else:
            matched = [
                d for d in self.docs
                if any(self.tf[d].get(t, 0) > 0 for t in terms)
            ]
        counts: Counter = Counter(field_by_doc[d] for d in matched)
        out = sorted(counts.items(), key=lambda x: (-x[1], x[0]))
        return out[:size]

    def topk_mlt(
        self,
        like_text: str,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        exclude_doc_id=None,
    ) -> List[Tuple[int, float]]:
        """More-like-this ground truth: select the input text's top
        terms by tf × idf (gates and tie-breaks as the engine), then
        plain OR top-k over the selection."""
        tf = Counter(tokenize_py(like_text))
        sel = sorted(
            (
                (tf[t] * self.idf(t), t)
                for t, c in tf.items()
                if c >= min_term_freq and self.df.get(t, 0) >= min_doc_freq
            ),
            key=lambda x: (-x[0], x[1]),
        )
        terms = [t for _, t in sel[:max_query_terms]]
        if not terms:
            return []
        scored = [
            (d, self.score(d, terms))
            for d in self.docs
            if d != exclude_doc_id and self.score(d, terms) > 0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_msm(
        self, query: str, n: int, k: int = 10
    ) -> List[Tuple[int, float]]:
        """minimum_should_match ground truth: docs matching at least n
        distinct indexed query terms, scored as `topk`."""
        terms = [t for t in set(tokenize_py(query)) if self.df.get(t, 0) > 0]
        if not terms or n > len(terms):
            return []
        scored = [
            (d, self.score(d, terms))
            for d in self.docs
            if sum(1 for t in terms if self.tf[d].get(t, 0) > 0) >= n
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_and(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Conjunctive (C4 AND-semantics): only docs containing EVERY
        indexed query term qualify; same scores as `topk`."""
        terms = [t for t in set(tokenize_py(query)) if self.df.get(t, 0) > 0]
        if not terms:
            return []
        scored = [
            (d, self.score(d, terms))
            for d in self.docs
            if all(self.tf[d].get(t, 0) > 0 for t in terms)
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_boolean(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Boolean AND/OR/NOT ground truth (shares the engine's parser,
        query/parse.py): positive terms score as `topk` (OR) or
        `topk_and` (conjunctive when an ` AND ` is present); docs
        holding ANY term after ` NOT ` are filtered out unscored; each
        quoted phrase is a must clause — required at consecutive
        positions, scored as a pseudo-term (PhraseOracle shape) and
        added to the term score; a phrase after NOT excludes its
        matching docs unscored.  Conjunctive semantics key on
        positive_and (an AND between negated operands is not a must
        on the positive terms)."""
        from search_engine_spark.query.parse import parse_query

        p = parse_query(query)
        ph_specs = []
        for q in p.phrases:
            ptoks = tokenize_py(q)
            if not ptoks or any(self.df.get(t, 0) == 0 for t in set(ptoks)):
                return []  # conjunctive: an unindexed phrase term empties
            ph_specs.append((ptoks, sum(self.idf(t) for t in set(ptoks))))
        neg_phrases = []
        for q in p.not_phrases:
            ptoks = tokenize_py(q)
            if ptoks and all(self.df.get(t, 0) > 0 for t in set(ptoks)):
                neg_phrases.append(ptoks)  # unindexed -> excludes nothing
        terms = [t for t in set(p.terms) if self.df.get(t, 0) > 0]
        if not terms and not ph_specs:
            return []
        neg = set(p.not_terms)
        out = []
        for d, dtoks in self.docs.items():
            if any(self.tf[d].get(t, 0) > 0 for t in neg):
                continue
            if any(
                any(
                    dtoks[i : i + len(nt)] == nt
                    for i in range(len(dtoks) - len(nt) + 1)
                )
                for nt in neg_phrases
            ):
                continue
            if p.positive_and and not all(
                self.tf[d].get(t, 0) > 0 for t in terms
            ):
                continue
            dl = self.doclen[d]
            s, matched_all_phrases = 0.0, True
            for ptoks, idf_sum in ph_specs:
                n = len(ptoks)
                ptf = sum(
                    1
                    for i in range(len(dtoks) - n + 1)
                    if dtoks[i : i + n] == ptoks
                )
                if ptf == 0:
                    matched_all_phrases = False
                    break
                s += idf_sum * (ptf * (K1 + 1.0)) / (
                    ptf + K1 * (1.0 - B + B * dl / self.avgdl)
                )
            if not matched_all_phrases:
                continue
            if terms:
                s += self.score(d, terms)
            if s > 0 or (p.positive_and and terms):
                out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]


class PrefixOracle(BM25Oracle):
    """Prefix-query ground truth (Lucene/ES prefix query shape).  The
    prefix — normalized like the engine: lowercased, non-[a-z0-9]
    stripped, NOT stemmed (ES prefix queries are not analyzed) —
    expands to at most max_expansions matching terms of the (stemmed)
    term dictionary in term order.  Scoring is the synonym-group form:
    a doc's tf is the SUM of tfs over the expansions before BM25
    saturation (Lucene SynonymQuery) and idf comes from the most
    common expansion's df (BlendedTermQuery max-df blending)."""

    def _group_scores(self, exps: List[str]) -> Dict[int, float]:
        """Full synonym-group score map (no top-k cut)."""
        if not exps:
            return {}
        df_max = max(self.df[t] for t in exps)
        idf = math.log(1.0 + (self.n - df_max + 0.5) / (df_max + 0.5))
        out = {}
        for d in self.docs:
            tf = sum(self.tf[d].get(t, 0) for t in exps)
            if tf == 0:
                continue
            dl = self.doclen[d]
            out[d] = idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return out

    def _group_topk(
        self, exps: List[str], k: int
    ) -> List[Tuple[int, float]]:
        out = sorted(
            self._group_scores(exps).items(), key=lambda x: (-x[1], x[0])
        )
        return out[:k]

    def topk_regexp(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> List[Tuple[int, float]]:
        """Regexp ground truth (Lucene/ES regexp query): full-anchored
        match of the pattern against the term dictionary, expansions in
        term order, synonym-group scored."""
        import re

        rx = re.compile(f"^(?:{pattern})$")
        exps = sorted(t for t in self.df if rx.match(t))[:max_expansions]
        return self._group_topk(exps, k)

    def topk_bool_prefix(
        self, query: str, k: int = 10, max_expansions: int = 50
    ) -> List[Tuple[int, float]]:
        """match_bool_prefix ground truth: full tokens (all but the
        last word) score as a plain OR; the last word, normalized but
        unstemmed, scores as the prefix expansion's synonym group; a
        doc's score is the sum of the two sides."""
        import re

        words = query.strip().split()
        if not words:
            return []
        last = re.sub(r"[^a-z0-9]", "", words[-1].lower())
        full = tokenize_py(" ".join(words[:-1]))
        term_scores = self.or_scores(full) if full else {}
        exps = sorted(t for t in self.df if t.startswith(last))[
            :max_expansions
        ] if last else []
        group_scores = self._group_scores(exps)
        out = [
            (d, term_scores.get(d, 0.0) + group_scores.get(d, 0.0))
            for d in set(term_scores) | set(group_scores)
        ]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def topk_prefix(
        self, prefix: str, k: int = 10, max_expansions: int = 50
    ) -> List[Tuple[int, float]]:
        import re

        p = re.sub(r"[^a-z0-9]", "", prefix.lower())
        if not p:
            return []
        exps = sorted(t for t in self.df if t.startswith(p))[:max_expansions]
        return self._group_topk(exps, k)

    def topk_wildcard(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> List[Tuple[int, float]]:
        """Wildcard ground truth: `*` any run, `?` one char, normalized
        like the engine (non-[a-z0-9*?] stripped, unstemmed), expanded
        against the term dictionary in term order, synonym-group
        scored."""
        import re

        p = re.sub(r"[^a-z0-9*?]", "", pattern.lower())
        if not p.strip("*?"):
            return []
        rx = re.compile(
            "^"
            + re.escape(p).replace(r"\*", "[a-z0-9]*").replace(r"\?", "[a-z0-9]")
            + "$"
        )
        exps = sorted(t for t in self.df if rx.match(t))[:max_expansions]
        return self._group_topk(exps, k)

    def topk_fuzzy(
        self,
        word: str,
        k: int = 10,
        max_edits: int = 2,
        prefix_length: int = 0,
        max_expansions: int = 50,
    ) -> List[Tuple[int, float]]:
        """Fuzzy ground truth: classic Levenshtein (matching Spark's
        native levenshtein, NOT Damerau), expansions ordered closest
        first then term order, synonym-group scored."""
        return self._group_topk(
            self._fuzzy_exps(word, max_edits, prefix_length,
                             max_expansions),
            k,
        )

    def topk_match_fuzzy(
        self,
        query: str,
        k: int = 10,
        fuzziness="AUTO",
        prefix_length: int = 0,
        max_expansions: int = 50,
    ) -> List[Tuple[int, float]]:
        """match-with-fuzziness ground truth: each DISTINCT analyzed
        token expands to its fuzzy synonym group (AUTO = 0/1/2 edits at
        the ES length breakpoints 3 and 6, applied to the analyzed
        token); a doc's score is the SUM of its group scores (bool
        should of SynonymQueries)."""
        out: Dict[int, float] = {}
        for t in dict.fromkeys(tokenize_py(query)):
            edits = (
                (0 if len(t) < 3 else 1 if len(t) < 6 else 2)
                if fuzziness == "AUTO"
                else int(fuzziness)
            )
            g = self._group_scores(
                self._fuzzy_exps(t, edits, prefix_length, max_expansions)
            )
            for d, s in g.items():
                out[d] = out.get(d, 0.0) + s
        return sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]

    def _fuzzy_exps(
        self,
        word: str,
        max_edits: int,
        prefix_length: int,
        max_expansions: int,
    ) -> List[str]:
        import re

        w = re.sub(r"[^a-z0-9]", "", word.lower())
        if not w:
            return []
        max_edits = max(0, min(int(max_edits), 2))

        def lev(a: str, b: str) -> int:
            if abs(len(a) - len(b)) > max_edits:
                return max_edits + 1
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        cands = sorted(self.df)
        if prefix_length > 0:
            if len(w) <= prefix_length:
                cands = [t for t in cands if t == w]
            else:
                cands = [t for t in cands if t.startswith(w[:prefix_length])]
        scored = [(t, lev(t, w)) for t in cands]
        return [
            t
            for t, d in sorted(
                ((t, d) for t, d in scored if d <= max_edits),
                key=lambda x: (x[1], x[0]),
            )
        ][:max_expansions]


class PhraseOracle(BM25Oracle):
    """Exact-phrase BM25 ground truth (Lucene PhraseQuery shape; the
    reference parses quoted phrases at tfidf.py:589-626 but never
    executes them).  A doc matches iff its filtered token stream holds
    the phrase's tokens at consecutive positions; tf = occurrence
    count, idf = Σ idf over the phrase's distinct terms,
    score = BM25(ptf, dl, idf_sum, avgdl)."""

    def topk_phrase(
        self, query: str, k: int = 10, slop: int = 0
    ) -> List[Tuple[int, float]]:
        out = sorted(
            self.phrase_scores(query, slop=slop).items(),
            key=lambda x: (-x[1], x[0]),
        )
        return out[:k]

    def phrase_scores(self, query: str, slop: int = 0) -> Dict[int, float]:
        """Full per-doc phrase score map (every matching doc, no top-k).

        slop > 0 — ordered proximity (ES match_phrase slop shape,
        order-preserving variant): doc matches at start p_0 iff there
        exist positions p_0 < p_1 < ... < p_{n-1}, p_j holding token j,
        with window overhead (p_{n-1} - p_0) - (n-1) <= slop; ptf =
        number of distinct matching p_0.  slop=0 is the exact phrase."""
        toks = tokenize_py(query)
        if not toks or any(self.df.get(t, 0) == 0 for t in set(toks)):
            return {}
        idf_sum = sum(self.idf(t) for t in set(toks))
        n = len(toks)
        out: Dict[int, float] = {}
        for d, dtoks in self.docs.items():
            if slop == 0:
                ptf = sum(
                    1
                    for i in range(len(dtoks) - n + 1)
                    if dtoks[i : i + n] == toks
                )
            else:
                pos = {t: [] for t in set(toks)}
                for i, t in enumerate(dtoks):
                    if t in pos:
                        pos[t].append(i)
                ptf = 0
                for p0 in pos[toks[0]]:
                    # greedy smallest-next chain minimizes p_{n-1},
                    # so its span is the minimal achievable from p0
                    prev, alive = p0, True
                    for j in range(1, n):
                        nxt = next(
                            (p for p in pos[toks[j]] if p > prev), None
                        )
                        if nxt is None:
                            alive = False
                            break
                        prev = nxt
                    if alive and (prev - p0) - (n - 1) <= slop:
                        ptf += 1
            if ptf == 0:
                continue
            dl = self.doclen[d]
            out[d] = idf_sum * (ptf * (K1 + 1.0)) / (
                ptf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return out

    def intervals_scores(
        self, query: str, max_gaps: int = -1, ordered: bool = False
    ) -> Dict[int, float]:
        """Intervals-query ground truth (ES `intervals` match source):
        ptf = count of MINIMAL intervals holding every query term,
        in order if `ordered`, with (width - n_terms) <= max_gaps
        (max_gaps < 0 = unlimited); score = the engine's phrase
        pseudo-term BM25 over that ptf."""
        toks = tokenize_py(query)
        if not toks or any(self.df.get(t, 0) == 0 for t in set(toks)):
            return {}
        if len(set(toks)) != len(toks):
            raise NotImplementedError("repeated terms in a match source")
        idf_sum = sum(self.idf(t) for t in set(toks))
        n = len(toks)
        out: Dict[int, float] = {}
        for d, dtoks in self.docs.items():
            pos = {t: [] for t in toks}
            for i, t in enumerate(dtoks):
                if t in pos:
                    pos[t].append(i)
            if any(not pos[t] for t in toks):
                continue
            if ordered:
                # greedy tightest end per start; minimal = last start
                # of each equal-end run (ends non-decreasing)
                chains = []
                for p0 in pos[toks[0]]:
                    prev, alive = p0, True
                    for j in range(1, n):
                        nxt = next(
                            (p for p in pos[toks[j]] if p > prev), None
                        )
                        if nxt is None:
                            alive = False
                            break
                        prev = nxt
                    if alive:
                        chains.append((p0, prev))
                ptf = 0
                for i, (p0, e) in enumerate(chains):
                    if i + 1 < len(chains) and chains[i + 1][1] == e:
                        continue  # a tighter interval shares this end
                    if max_gaps < 0 or (e - p0 + 1) - n <= max_gaps:
                        ptf += 1
            else:
                items = sorted(
                    (p, t) for t in set(toks) for p in pos[t]
                )
                cnt = {t: 0 for t in set(toks)}
                have = left = ptf = 0
                for pr, tr in items:
                    cnt[tr] += 1
                    if cnt[tr] == 1:
                        have += 1
                    if have < n:
                        continue
                    while cnt[items[left][1]] > 1:
                        cnt[items[left][1]] -= 1
                        left += 1
                    if max_gaps < 0 or (pr - items[left][0] + 1) - n \
                            <= max_gaps:
                        ptf += 1
                    cnt[items[left][1]] -= 1
                    have -= 1
                    left += 1
            if ptf == 0:
                continue
            dl = self.doclen[d]
            out[d] = idf_sum * (ptf * (K1 + 1.0)) / (
                ptf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return out


class SpanOracle(BM25Oracle):
    """Span query family ground truth — BRUTE-FORCE evaluation, a
    deliberately different algorithm from the engine's (the engine
    composes spans via backward DP / minimal-window sweeps inside an
    Arrow UDF; this enumerates every chain/window combination).  The
    pinned semantics live in query/spans.py's module docstring; the
    body is parsed with the same parser (parsing is shared, evaluation
    is not)."""

    def span_scores(self, span_query: dict) -> Dict[int, float]:
        from itertools import product

        from search_engine_spark.query.spans import parse_span_query

        parse = parse_span_query(span_query)
        if parse.required is None:
            return {}
        terms = parse.terms
        if any(self.df.get(terms[o], 0) == 0 for o in parse.required):
            return {}
        pos_terms = sorted(
            t for t in parse.positive_terms if self.df.get(t, 0) > 0
        )
        if not pos_terms:
            return {}
        idf_sum = sum(self.idf(t) for t in pos_terms)

        def brute(tree, pos):
            kind = tree[0]
            if kind == "empty":
                return []
            if kind == "term":
                return [(p, p + 1) for p in pos[tree[1]]]
            if kind == "or":
                u = set()
                for kid in tree[1]:
                    u.update(brute(kid, pos))
                return sorted(u)
            if kind == "near_ord":
                clause_spans = [brute(kid, pos) for kid in tree[1]]
                slop = tree[2]
                if any(not s for s in clause_spans):
                    return []
                best: Dict[Tuple[int, int], Tuple[int, int]] = {}
                for chain in product(*clause_spans):
                    ok = all(
                        chain[j][0] >= chain[j - 1][1]
                        for j in range(1, len(chain))
                    )
                    if not ok:
                        continue
                    covered = sum(e - s for s, e in chain)
                    gaps = (chain[-1][1] - chain[0][0]) - covered
                    key = chain[0]
                    val = (gaps, chain[-1][1])
                    if key not in best or val < best[key]:
                        best[key] = val
                return sorted(
                    {
                        (opener[0], end)
                        for opener, (gaps, end) in best.items()
                        if gaps <= slop
                    }
                )
            if kind == "near_unord":
                plists = [pos[o] for o in tree[1]]
                slop = tree[2]
                if any(not p for p in plists):
                    return []
                cands = {
                    (min(c), max(c) + 1) for c in product(*plists)
                }
                minimal = {
                    (a, b)
                    for (a, b) in cands
                    if not any(
                        a2 >= a and b2 <= b and (a2, b2) != (a, b)
                        for (a2, b2) in cands
                    )
                }
                n = len(plists)
                return sorted(
                    (a, b) for (a, b) in minimal if (b - a) - n <= slop
                )
            if kind == "not":
                inc = brute(tree[1], pos)
                exc = brute(tree[2], pos)
                pre, post = tree[3], tree[4]
                return [
                    (s, e)
                    for (s, e) in inc
                    if not any(
                        xs < e + post and xe > s - pre for (xs, xe) in exc
                    )
                ]
            if kind == "first":
                return [
                    sp for sp in brute(tree[1], pos) if sp[1] <= tree[2]
                ]
            big = brute(tree[1], pos)
            little = brute(tree[2], pos)
            if kind == "containing":
                return [
                    b
                    for b in big
                    if any(
                        ls >= b[0] and le <= b[1] for (ls, le) in little
                    )
                ]
            return [
                l
                for l in little
                if any(b[0] <= l[0] and b[1] >= l[1] for b in big)
            ]

        out: Dict[int, float] = {}
        for d, dtoks in self.docs.items():
            pos: List[List[int]] = [[] for _ in terms]
            by_term = {t: i for i, t in enumerate(terms)}
            for i, t in enumerate(dtoks):
                o = by_term.get(t)
                if o is not None:
                    pos[o].append(i)
            ptf = len(brute(parse.tree, pos))
            if ptf == 0:
                continue
            dl = self.doclen[d]
            out[d] = idf_sum * (ptf * (K1 + 1.0)) / (
                ptf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return out

    def topk_spans(
        self, span_query: dict, k: int = 10
    ) -> List[Tuple[int, float]]:
        out = sorted(
            self.span_scores(span_query).items(), key=lambda x: (-x[1], x[0])
        )
        return out[:k]


class TFIDFOracle:
    """Reference TF-IDF semantics (tfidf.py:167-572): log TF
    (1 + log10(count)), smooth IDF (log10((N+1)/(df+1))), score =
    Σ_{t in query terms} tf(t,d) * idf(t), docs with score > 0 only,
    sorted score desc (tie: doc_id asc, our pinned determinism rule)."""

    def __init__(self, docs: Dict[int, List[str]]):
        self.docs = docs
        self.n = len(docs)
        self.df: Counter = Counter()
        self.tf: Dict[int, Counter] = {}
        for d, toks in docs.items():
            c = Counter(toks)
            self.tf[d] = c
            for term in c:
                self.df[term] += 1

    def log_tf(self, doc_id: int, term: str) -> float:
        count = self.tf[doc_id].get(term, 0)
        return 0.0 if count == 0 else 1.0 + math.log10(count)

    def idf_smooth(self, term: str) -> float:
        return math.log10((self.n + 1) / (self.df.get(term, 0) + 1))

    def idf(self, term: str, method: str = "smooth") -> float:
        """The reference's four IDF variants (tfidf.py:301-360)."""
        df = self.df.get(term, 0)
        if method == "smooth":
            return self.idf_smooth(term)
        if method == "standard":
            return 0.0 if df == 0 or self.n == 0 else math.log10(self.n / df)
        if method == "probabilistic":
            if df == 0 or df >= self.n:
                return 0.0
            return math.log10((self.n - df) / df)
        if method == "max":
            max_df = max(self.df.values()) if self.df else 0
            return 0.0 if max_df == 0 else math.log10(max_df / (1 + df))
        raise ValueError(method)

    def topk(
        self, query: str, k: int = 10, idf_method: str = "smooth"
    ) -> List[Tuple[int, float]]:
        terms = set(tokenize_py(query))
        if not terms:
            return []
        out = []
        for d in self.docs:
            s = sum(
                self.log_tf(d, t) * self.idf(t, idf_method) for t in terms
            )
            if s > 0:
                out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def term_scores(
        self, doc_id: int, terms: Sequence[str]
    ) -> Dict[str, float]:
        """tfidf.py:484-507 term_scores: every query term keyed, 0.0
        when absent from the doc."""
        return {
            t: self.log_tf(doc_id, t) * self.idf_smooth(t)
            for t in sorted(set(terms))
        }


class BestFieldsOracle:
    """Multi-field best_fields BM25 ground truth (ES multi_match shape,
    backend/search_api/main.py:162-189): per-field BM25 over that
    field's own df/avgdl (N = corpus size for every field; docs missing
    a field count as length 0), combined as
        max_f(boost_f*score_f) + tie_breaker*(Σ_others boost*score).
    """

    def __init__(
        self,
        field_docs: Dict[str, Dict[int, List[str]]],
        boosts: Dict[str, float],
    ):
        self.oracles = {f: BM25Oracle(d) for f, d in field_docs.items()}
        self.boosts = dict(boosts)

    def topk(
        self, query: str, k: int = 10, tie_breaker: float = 0.0
    ) -> List[Tuple[int, float]]:
        terms = sorted(set(tokenize_py(query)))
        doc_ids = set()
        for o in self.oracles.values():
            doc_ids |= set(o.docs)
        scored = []
        for d in sorted(doc_ids):
            per = []
            for f, o in self.oracles.items():
                s = o.score(d, terms) if d in o.docs else 0.0
                per.append(self.boosts[f] * s)
            best = max(per)
            if best <= 0.0:
                continue
            total = sum(per)
            scored.append((d, best + tie_breaker * (total - best)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]


class CrossFieldsOracle:
    """ES multi_match cross_fields ground truth — term-centric: each
    term scores per field with the field's own tf/dl/avgdl but a
    BLENDED df (max across fields — the Lucene BlendedTermQuery
    docFreq adjustment); per term the fields combine dis_max +
    tie_breaker·rest, and per-term scores sum over the query."""

    def __init__(
        self,
        field_docs: Dict[str, Dict[int, List[str]]],
        boosts: Dict[str, float],
    ):
        self.oracles = {f: BM25Oracle(d) for f, d in field_docs.items()}
        self.boosts = dict(boosts)

    def topk(
        self, query: str, k: int = 10, tie_breaker: float = 0.0
    ) -> List[Tuple[int, float]]:
        terms = sorted(set(tokenize_py(query)))
        n = max(o.n for o in self.oracles.values())
        idf_b: Dict[str, float] = {}
        for t in terms:
            df = max(o.df.get(t, 0) for o in self.oracles.values())
            if df > 0:
                idf_b[t] = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        doc_ids = set()
        for o in self.oracles.values():
            doc_ids |= set(o.docs)
        scored = []
        for d in sorted(doc_ids):
            s = 0.0
            for t, idf in idf_b.items():
                per = []
                for f, o in self.oracles.items():
                    tf = o.tf[d].get(t, 0) if d in o.docs else 0
                    if tf == 0:
                        per.append(0.0)
                        continue
                    dl = o.doclen[d]
                    per.append(
                        self.boosts[f]
                        * idf
                        * (tf * (K1 + 1.0))
                        / (tf + K1 * (1.0 - B + B * dl / o.avgdl))
                    )
                best = max(per)
                if best > 0.0:
                    s += best + tie_breaker * (sum(per) - best)
            if s > 0.0:
                scored.append((d, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]


class CombinedFieldsOracle:
    """ES combined_fields ground truth (Lucene CombinedFieldQuery /
    BM25F simple variant): fields merge into one synthetic field —
    weighted tf pooled BEFORE saturation, combined doc length and
    avgdl are the weighted sums, df blended as the max across fields.
    Docs missing a field contribute length 0 for it."""

    def __init__(
        self,
        field_docs: Dict[str, Dict[int, List[str]]],
        weights: Dict[str, float],
    ):
        self.oracles = {f: BM25Oracle(d) for f, d in field_docs.items()}
        self.weights = dict(weights)
        self.doc_ids = set()
        for o in self.oracles.values():
            self.doc_ids |= set(o.docs)
        n = len(self.doc_ids)
        self.n = n
        # linear mean over the FULL universe (missing field -> 0)
        self.avgdl_c = sum(
            w
            * sum(self.oracles[f].doclen.get(d, 0) for d in self.doc_ids)
            / max(1, n)
            for f, w in self.weights.items()
        )

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        terms = sorted(set(tokenize_py(query)))
        idf_b: Dict[str, float] = {}
        for t in terms:
            df = max(o.df.get(t, 0) for o in self.oracles.values())
            if df > 0:
                idf_b[t] = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
        scored = []
        for d in sorted(self.doc_ids):
            dl_c = sum(
                w * self.oracles[f].doclen.get(d, 0)
                for f, w in self.weights.items()
            )
            s = 0.0
            for t, idf in idf_b.items():
                tf_c = sum(
                    w * (self.oracles[f].tf[d].get(t, 0)
                         if d in self.oracles[f].docs else 0)
                    for f, w in self.weights.items()
                )
                if tf_c > 0:
                    s += idf * (tf_c * (K1 + 1.0)) / (
                        tf_c + K1 * (1.0 - B + B * dl_c / self.avgdl_c)
                    )
            if s > 0.0:
                scored.append((d, s))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]


def _levenshtein(a: str, b: str) -> int:
    """Classic Levenshtein (matches Spark's F.levenshtein — a
    transposition costs 2, not Damerau's 1)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class PhraseSuggestOracle:
    """Pure-Python ES phrase suggester over (doc_id -> token list) —
    the rank-identity ground truth for BM25Index.suggest_phrase.
    Implements the SAME pinned model: Stupid-Backoff bigram LM over
    adjacent-pair counts of the canonical token streams, noisy-channel
    error model (unchanged → rwel, changed → (1−rwel)·similarity),
    per-token geometric-mean score, confidence gate vs the input
    phrase, candidates = suggest_terms semantics (mode always,
    similarity desc → df desc → term asc, top num_candidates)."""

    def __init__(self, docs: Dict[int, List[str]]):
        self.df: Counter = Counter()
        self.uni: Counter = Counter()
        self.bi: Counter = Counter()
        for toks in docs.values():
            for t in set(toks):
                self.df[t] += 1
            self.uni.update(toks)
            for a, b in zip(toks, toks[1:]):
                self.bi[(a, b)] += 1
        self.total = sum(self.uni.values())

    def _candidates(
        self, token, num_candidates, max_edits, prefix_length,
        min_word_length,
    ) -> List[Tuple[str, float]]:
        if len(token) < min_word_length:
            return []
        max_edits = max(0, min(int(max_edits), 2))
        out = []
        for term, df in self.df.items():
            if "!" in term or term == token:
                continue
            if abs(len(term) - len(token)) > max_edits:
                continue
            if prefix_length > 0 and (
                term[:prefix_length] != token[:prefix_length]
            ):
                continue
            d = _levenshtein(term, token)
            if d > max_edits:
                continue
            sim = 1.0 - d / max(len(term), len(token))
            out.append((term, sim, df))
        out.sort(key=lambda r: (-r[1], -r[2], r[0]))
        return [(t, s) for t, s, _ in out[:num_candidates]]

    def suggest(
        self,
        text: str,
        size: int = 5,
        max_errors: int = 1,
        max_edits: int = 2,
        prefix_length: int = 1,
        min_word_length: int = 4,
        num_candidates: int = 5,
        confidence: float = 1.0,
        real_word_error_likelihood: float = 0.95,
        discount: float = 0.4,
    ) -> List[Tuple[str, float]]:
        import itertools

        tokens = tokenize_py(text)
        if not tokens:
            return []
        n = len(tokens)
        max_errors = max(1, int(max_errors))
        cands = {
            t: self._candidates(
                t, num_candidates, max_edits, prefix_length, min_word_length
            )
            for t in set(tokens)
        }
        positions = [i for i, t in enumerate(tokens) if cands.get(t)]
        base = tuple(tokens)
        log_rwel = math.log(real_word_error_likelihood)
        log_err1 = math.log1p(-real_word_error_likelihood)
        phrases: Dict[Tuple[str, ...], float] = {}
        full = False
        for k_err in range(1, max_errors + 1):
            if full:
                break
            for combo in itertools.combinations(positions, k_err):
                if full:
                    break
                pools = [cands[tokens[i]] for i in combo]
                for repl in itertools.product(*pools):
                    words = list(tokens)
                    err = (n - k_err) * log_rwel
                    for i, (c, sim) in zip(combo, repl):
                        words[i] = c
                        err += log_err1 + math.log(sim)
                    tup = tuple(words)
                    if tup == base:
                        continue
                    if tup not in phrases or err > phrases[tup]:
                        phrases[tup] = err
                    if len(phrases) >= 2000:
                        full = True
                        break

        T = max(1, self.total)
        log_disc = math.log(discount)

        def log_uni(w):
            return math.log(max(self.uni.get(w, 0), 0.5) / T)

        def log_lm(p):
            lp = log_uni(p[0])
            for a, b in zip(p, p[1:]):
                c2 = self.bi.get((a, b), 0)
                c1 = self.uni.get(a, 0)
                lp += (
                    math.log(c2 / c1)
                    if c2 > 0 and c1 > 0
                    else log_disc + log_uni(b)
                )
            return lp

        base_score = math.exp((log_lm(base) + n * log_rwel) / n)
        rows = [
            (" ".join(tup), math.exp((log_lm(tup) + err) / n))
            for tup, err in phrases.items()
        ]
        rows = [r for r in rows if r[1] > confidence * base_score]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:size]
