"""Byte-pair-encoding tokenizer training + encoding for training-data
pipelines — the "train a subword vocab on the corpus, then count/emit
tokens per document" step every LLM data pipeline runs.

Scale shape (the part that must be Spark, and the part that must not):

- `word_counts` — ONE distributed groupBy(word).sum over the corpus.
  Word frequency is the classic Zipf-skewed aggregate: count is
  sum-combinable, so partial aggregation collapses the hot head
  map-side and no salting is needed.  This is the only corpus-sized
  pass training requires.
- `train_bpe` — driver-side, deliberately: BPE training operates on
  the WORD-FREQUENCY DICTIONARY, not the corpus.  The dictionary is
  capped to `max_words` (taken by count desc, word asc — a bounded
  TakeOrdered, the standard `min_frequency`/vocab-cap every production
  tokenizer trainer applies), so training cost is O(max_words ×
  n_merges) regardless of corpus size — the same "collect a bounded
  model, never the data" pattern as the ANN k-means trainer
  (ops/similarity.py).  Pure deterministic Python: most frequent
  adjacent symbol pair wins, ties break to the lexicographically
  smallest pair, so the merge list is reproducible run-to-run and
  engine-to-engine.
- `bpe_encode` / `bpe_token_counts` — distributed again: the learned
  merge list (a few thousand pairs — broadcast-sized) is applied per
  word inside an Arrow-batched mapInPandas, with a per-batch
  distinct-word memo so each unique word in a batch is segmented once
  (Zipf again: a batch's token mass concentrates on few words).

Reference: Sennrich, Haddow & Birch 2016 (arXiv:1508.07909) — the
word-internal BPE with an end-of-word marker `</w>`; encoding applies
merges in learned-priority order (lowest rank first, all occurrences
left-to-right), which reproduces the training segmentation exactly.

BPE segmentation is not expressible in SQL, so the contract entry for
this op is rows-only; correctness is pinned by the pure-Python replay
tests in tests/test_bpe.py (train goldens, encode==training
segmentation, round-trip, cluster-size independence).
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

END = "</w>"


# ---------------------------------------------------------------------------
# pre-tokenization (identical in Spark and Python — whitespace words)
# ---------------------------------------------------------------------------


def words_py(text: str) -> List[str]:
    """Python twin of the Spark word split: lowercase, split on
    whitespace runs.  (Spark's \\s and Python's str.split() differ only
    on exotic unicode spaces — absent from the corpus, same note as
    ops/common.py.)"""
    return text.lower().split() if text else []


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus word-frequency table: (word, count) — one skew-safe
    groupBy (sum-combinable partial agg)."""
    w = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).alias("word")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(w)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def top_words(
    df: DataFrame, text_col: str, max_words: int
) -> List[Tuple[str, int]]:
    """The capped training dictionary: top max_words by (count desc,
    word asc) — deterministic, bounded driver load."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    return [(r["word"], int(r["count"])) for r in rows]


# ---------------------------------------------------------------------------
# training (driver-side, vocabulary-bounded)
# ---------------------------------------------------------------------------


def train_bpe_naive(
    word_freqs: Iterable[Tuple[str, int]], n_merges: int
) -> List[Tuple[str, str]]:
    """Reference trainer (the spec): full pair recount + full vocab
    rewrite every merge — O(dict-size × n_merges).  Kept as the
    parity oracle for `train_bpe`; use only on small dictionaries."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab: Dict[Tuple[str, ...], int] = {}
    for w, c in word_freqs:
        if not w or c <= 0:
            continue
        seq = tuple(w) + (END,)
        vocab[seq] = vocab.get(seq, 0) + int(c)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for seq, c in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break  # nothing repeats — further merges are memorization
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        nv: Dict[Tuple[str, ...], int] = {}
        for seq, c in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


def train_bpe(
    word_freqs: Iterable[Tuple[str, int]], n_merges: int
) -> List[Tuple[str, str]]:
    """Learn `n_merges` merges from a (word, count) dictionary.

    Classic Sennrich BPE: symbols start as characters + END; each step
    merges the most frequent adjacent pair across the weighted
    dictionary (ties → lexicographically smallest pair).  Stops early
    when no pair repeats.

    Incremental implementation (the production-tokenizer approach):
    per-pair counts and pair→word membership are maintained under a
    lazy max-heap keyed (-count, pair) — stale heap entries are skipped
    by comparing against the live count, so pops preserve the naive
    trainer's exact (max count, lexicographic min) selection.  Each
    merge touches only the words CONTAINING the merged pair, so total
    cost is ~O(corpus-symbol churn), not O(dict × merges) — a 50k-word
    dictionary trains 32k merges in seconds instead of hours.
    Merge-list equality with `train_bpe_naive` is property-tested
    (tests/test_bpe.py)."""
    import heapq
    from collections import Counter

    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    agg: Dict[Tuple[str, ...], int] = {}
    for w, c in word_freqs:
        if not w or c <= 0:
            continue
        seq = tuple(w) + (END,)
        agg[seq] = agg.get(seq, 0) + int(c)
    words: List[List] = [[list(seq), c] for seq, c in agg.items()]
    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for i, (seq, c) in enumerate(words):
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: List[Tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        nc, p = heapq.heappop(heap)
        cur = pair_counts.get(p, 0)
        if cur != -nc:
            continue  # stale entry — the live count has its own entry
        if cur < 2:
            break  # current max doesn't repeat — stop, like the spec
        merges.append(p)
        a, b = p
        m = a + b
        changed: set = set()
        for i in list(pair_words.get(p, ())):
            seq, cnt = words[i]
            out: List[str] = []
            j = 0
            hit = False
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(m)
                    j += 2
                    hit = True
                else:
                    out.append(seq[j])
                    j += 1
            if not hit:  # membership gone stale via an earlier merge
                pair_words[p].discard(i)
                continue
            old = Counter(zip(seq, seq[1:]))
            new = Counter(zip(out, out[1:]))
            words[i][0] = out
            for q, d in (old - new).items():
                pair_counts[q] = pair_counts.get(q, 0) - d * cnt
                changed.add(q)
                if q not in new:
                    ws = pair_words.get(q)
                    if ws is not None:
                        ws.discard(i)
            for q, d in (new - old).items():
                pair_counts[q] = pair_counts.get(q, 0) + d * cnt
                changed.add(q)
                pair_words.setdefault(q, set()).add(i)
        pair_counts.pop(p, None)
        pair_words.pop(p, None)
        changed.discard(p)
        for q in changed:
            c = pair_counts.get(q, 0)
            if c <= 0:
                pair_counts.pop(q, None)
                pair_words.pop(q, None)
            else:
                heapq.heappush(heap, (-c, q))
    return merges


def apply_bpe(
    word: str, ranks: Dict[Tuple[str, str], int]
) -> List[str]:
    """Segment one word with a learned merge-rank table: repeatedly
    merge the lowest-rank pair present (all occurrences, left to
    right) — reproduces the training segmentation exactly."""
    seq: List[str] = list(word) + [END]
    while len(seq) >= 2:
        best_rank = None
        best_pair = None
        for a, b in zip(seq, seq[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out: List[str] = []
        i = 0
        while i < len(seq):
            if (
                i + 1 < len(seq)
                and seq[i] == best_pair[0]
                and seq[i + 1] == best_pair[1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def encode_py(
    text: str, ranks: Dict[Tuple[str, str], int]
) -> List[str]:
    """Pure-Python document encoding (the test/driver oracle)."""
    out: List[str] = []
    for w in words_py(text):
        out.extend(apply_bpe(w, ranks))
    return out


# ---------------------------------------------------------------------------
# distributed encoding (Arrow mapInPandas, per-batch word memo)
# ---------------------------------------------------------------------------


def _ranks(merges: Sequence[Tuple[str, str]]) -> Dict[Tuple[str, str], int]:
    return {tuple(p): i for i, p in enumerate(merges)}


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>) — distributed BPE segmentation.
    The merge list rides the task closure (broadcast-sized); each
    Arrow batch memoizes distinct-word segmentations."""
    ranks = _ranks(merges)
    id_type = df.schema[id_col].dataType  # ids may be long OR string
    schema = StructType(
        [
            StructField("id", id_type),
            StructField("tokens", ArrayType(StringType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        memo: Dict[str, List[str]] = {}

        def enc(text) -> List[str]:
            out: List[str] = []
            for w in words_py(text if isinstance(text, str) else ""):
                t = memo.get(w)
                if t is None:
                    t = apply_bpe(w, ranks)
                    memo[w] = t
                out.extend(t)
            return out

        for b in batches:
            yield pd.DataFrame(
                {"id": b["_id"], "tokens": b["_text"].map(enc)}
            )

    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
    )
    return src.mapInPandas(run, schema)


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
) -> DataFrame:
    """(id, n_bpe_tokens) — the per-doc token count under the learned
    vocab (the budget/packing input columns upstream ops consume)."""
    enc = bpe_encode(df, id_col, text_col, merges)
    return enc.select(
        "id", F.size("tokens").cast("long").alias("n_bpe_tokens")
    )
