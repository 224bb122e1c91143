"""Text-analysis operators: language scoring, quality metrics, token
counting, document fingerprinting.  All native column expressions (no
Python in the row path) with exact DuckDB-SQL equivalents."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, shingles_col
from search_engine_spark.text.stopwords import STOPWORDS_SORTED
from search_engine_spark.text.tokenizer import raw_tokens_col


def _words_col(text: Column) -> Column:
    """Plain whitespace words, lowercased (pre-stopword-filter)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " "
    )


def english_stopword_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-ID heuristic: share of whitespace words that are English
    stopwords.  High for English prose, ~0 otherwise.

    (Split projection: the word array is materialized once per row —
    inlining it into every consumer re-evaluates the split/regex chain.)"""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_SORTED])
    base = df.select(
        F.col(id_col).alias("id"), _words_col(F.col(text_col)).alias("words")
    )
    words = F.col("words")
    n = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    return base.select(
        "id",
        F.round(
            F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(0.0), 6
        ).alias("en_stop_ratio"),
    )


# Pinned function-word marker lists per language (public common function
# words; NOT downloaded at runtime — the reference's silent nltk.download
# divergence, tfidf.py:41-55, is a reproducibility bug we do not copy).
# Alphabetical language order is the deterministic tie-break everywhere.
LANG_MARKERS = {
    "de": sorted({
        "der", "die", "das", "und", "ist", "nicht", "ich", "du", "er",
        "sie", "wir", "ein", "eine", "zu", "mit", "von", "auf", "für",
        "den", "dem", "im", "als", "auch", "sich", "bei",
    }),
    "en": sorted({
        "the", "of", "and", "to", "in", "is", "was", "he", "for", "it",
        "with", "as", "his", "on", "be", "at", "by", "that", "this",
        "are", "from", "or", "an", "they", "which",
    }),
    "es": sorted({
        "el", "la", "los", "las", "y", "es", "no", "un", "una", "en",
        "que", "por", "con", "para", "se", "del", "al", "su", "lo",
        "como", "más", "pero", "sus", "le", "ya",
    }),
    "fr": sorted({
        "le", "la", "les", "et", "est", "ne", "pas", "un", "une",
        "dans", "que", "pour", "avec", "sur", "du", "au", "ce", "il",
        "qui", "plus", "cette", "mais", "aux", "ses", "être",
    }),
    "it": sorted({
        "il", "lo", "la", "gli", "le", "e", "è", "non", "un", "una",
        "di", "che", "per", "con", "su", "del", "al", "si", "nel",
        "da", "come", "anche", "dei", "alla", "più",
    }),
    "pt": sorted({
        "o", "os", "a", "as", "e", "é", "não", "um", "uma", "em",
        "que", "por", "com", "para", "se", "do", "ao", "seu", "na",
        "dos", "como", "mais", "das", "mas", "foi",
    }),
}


def detect_language(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram-free language ID: per-language function-word hit ratio
    over whitespace words, winner = highest ratio (ties broken by
    alphabetical language code — the same CASE order the DuckDB oracle
    evaluates); zero hits in every language → 'und'.  Returns
    (id, lang, lang_score).

    All native column expressions over ONE materialized word array —
    six array_contains filters inside whole-stage codegen, no Python,
    no shuffle (row-local)."""
    base = df.select(
        F.col(id_col).alias("id"), _words_col(F.col(text_col)).alias("words")
    )
    words, n = F.col("words"), F.size(F.col("words"))
    def _contains(arr):
        # two-arg lambdas are read by F.filter as (element, index) —
        # close over the marker array instead of a default arg
        return lambda w: F.array_contains(arr, w)

    ratios = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(words, _contains(arr)))
        ratios[lang] = F.when(
            n > 0, hits.cast("double") / n.cast("double")
        ).otherwise(0.0)
    with_r = base.select(
        "id", *[ratios[lang].alias(f"_r_{lang}") for lang in sorted(ratios)]
    )
    g = F.greatest(*[F.col(f"_r_{lang}") for lang in sorted(ratios)])
    pick = F.when(g == 0.0, F.lit("und"))
    for lang in sorted(ratios):  # alphabetical = deterministic tie-break
        pick = pick.when(F.col(f"_r_{lang}") == g, F.lit(lang))
    return with_r.select(
        "id", pick.alias("lang"), F.round(g, 6).alias("lang_score")
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: char/token counts, mean token length,
    stopword ratio, punctuation ratio, digit ratio, plus a composite
    score in [0,1] (monotone in "looks like clean prose")."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        raw_tokens_col(F.col(text_col)).alias("_toks"),
        _words_col(F.col(text_col)).alias("_words"),
    )
    text = F.col("_text")
    n_chars = F.length(text)
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    words = F.col("_words")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_SORTED])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_tokens,
    ).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0)
    length_score = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    composite = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0)))
    )
    return base.select(
        "id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(composite, 6).alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting three ways: whitespace words, canonical tokens,
    BPE-ish subword count (alnum runs + standalone punct marks)."""
    text = F.col(text_col)
    ws = F.size(_words_col(text))
    canonical = F.size(raw_tokens_col(text))
    # BPE-ish: count alnum runs and each non-space punct char as a token
    alnum_runs = F.size(
        F.filter(
            F.split(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "), " "),
            lambda t: F.length(t) > 0,
        )
    )
    punct_marks = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("long").alias("n_ws_tokens"),
        canonical.cast("long").alias("n_canonical_tokens"),
        (alnum_runs + punct_marks).cast("long").alias("n_bpeish_tokens"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3
) -> DataFrame:
    """Winnowing-style fingerprint: min md5-int over word k-shingles
    (equivalent to a 1-hash MinHash; collision => near-identical
    prefix content).  Docs shorter than k tokens fingerprint to NULL."""
    base = df.select(
        F.col(id_col).alias("id"), raw_tokens_col(F.col(text_col)).alias("toks")
    )
    shdf = base.select("id", shingles_col(F.col("toks"), shingle_k).alias("sh"))
    fp = F.array_min(F.transform(F.col("sh"), lambda s: md5int_col(s)))
    return shdf.select("id", fp.alias("fingerprint"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021 §A1.1): the
    fraction of tokens taken by the most frequent unigram and the
    fraction of bigrams taken by the most frequent bigram.  High values
    flag boilerplate / keyword-stuffed pages that pretraining filters
    drop.

    Returns (id, n_tokens, top_unigram_frac, top_bigram_frac); docs
    with <1 token (or <2 for bigrams) report 0.0 fractions.

    Scale: one explode + groupBy keyed by (doc, gram) — partial
    aggregation absorbs the heavy duplication that is precisely the
    signal being measured, so the shuffle carries distinct grams, not
    raw tokens.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        raw_tokens_col(F.col(text_col)).alias("_t"),
    ).withColumn(
        "_b",
        # guard: sequence(1, 0) DESCENDS in Spark, so short docs must
        # short-circuit to an empty bigram list
        F.when(
            F.size("_t") >= 2,
            F.expr(
                "transform(sequence(1, size(_t) - 1),"
                " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
            ),
        ).otherwise(F.expr("array()").cast("array<string>")),
    )
    uni = (
        toks.select("id", F.explode_outer("_t").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c"))).alias("_n"),
            F.max(F.when(F.col("g").isNotNull(), F.col("c"))).alias("_m"),
        )
    )
    bi = (
        toks.select("id", F.explode_outer("_b").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c"))).alias("_bn"),
            F.max(F.when(F.col("g").isNotNull(), F.col("c"))).alias("_bm"),
        )
    )
    return (
        uni.join(bi, "id")
        .select(
            "id",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.when(
                    F.coalesce("_n", F.lit(0)) > 0,
                    F.col("_m") / F.col("_n"),
                ).otherwise(0.0),
                6,
            ).alias("top_unigram_frac"),
            F.round(
                F.when(
                    F.coalesce("_bn", F.lit(0)) > 0,
                    F.col("_bm") / F.col("_bn"),
                ).otherwise(0.0),
                6,
            ).alias("top_bigram_frac"),
        )
    )


def lm_quality(
    docs: DataFrame,
    shingle_stats: DataFrame,
    unigram_stats: DataFrame,
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.4,
) -> DataFrame:
    """Bigram language-model perplexity per document — the CCNet/
    KenLM-style quality filter for web-scale training data: documents
    whose token stream is improbable under a reference corpus LM
    (boilerplate, gibberish, wrong language, keyword stuffing) get high
    perplexity and can be thresholded out.

    The LM is the SAME Stupid-Backoff bigram model the phrase suggester
    uses (builder.build_shingle_stats tables + corpus total_tokens):
      log P(w₁) = ln(max(cnt(w₁), 0.5) / T)
      log P(wᵢ|wᵢ₋₁) = ln(cnt(wᵢ₋₁wᵢ)/cnt(wᵢ₋₁)) when the bigram
        exists, else ln(discount) + ln(max(cnt(wᵢ), 0.5) / T)
    Per doc: sum_logp over n = doclen scoring events (1 unigram +
    n−1 bigrams), avg_logp = sum/n, perplexity = exp(−avg_logp).

    Scale shape: docs tokenize once (the stemming Arrow UDF is the only
    Python), the first-token and bigram streams LEFT-join the LM tables
    on their sort keys (sort-merge; the stats tables are vocabulary- /
    bigram-vocabulary-sized, usually much smaller than the doc-pair
    stream), and ONE groupBy(doc) with partial aggregation folds the
    per-event log-probs.  Empty-token docs are dropped (nothing to
    score), like the suggester's empty-analysis behavior.

    Returns (id, n_tokens, sum_logp, avg_logp, perplexity)."""
    from search_engine_spark.text.tokenizer import tokens_col

    T = float(max(1, total_tokens))

    def _lu(cnt):
        c = F.coalesce(cnt, F.lit(0)).cast("double")
        return F.log(F.greatest(c, F.lit(0.5)) / F.lit(T))

    base = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    ).filter(F.size("t") > 0)
    uni = unigram_stats.select("term", "cnt")
    first = (
        base.select("id", F.element_at("t", 1).alias("term"))
        .join(uni, "term", "left")
        .select("id", _lu(F.col("cnt")).alias("lp"))
    )
    pairs = (
        base.filter(F.size("t") >= 2)
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("id", "bg.w1", "bg.w2")
        .join(
            shingle_stats.select(
                "w1", "w2",
                (F.col("bcnt") if "bcnt" in shingle_stats.columns
                 else F.col("cnt")).alias("bcnt"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            uni.select(F.col("term").alias("w1"), F.col("cnt").alias("c1")),
            "w1", "left",
        )
        .join(
            uni.select(F.col("term").alias("w2"), F.col("cnt").alias("c2")),
            "w2", "left",
        )
        .select(
            "id",
            F.when(
                (F.coalesce(F.col("bcnt"), F.lit(0)) > 0)
                & (F.coalesce(F.col("c1"), F.lit(0)) > 0),
                F.log(F.col("bcnt").cast("double") / F.col("c1")),
            )
            .otherwise(F.log(F.lit(float(discount))) + _lu(F.col("c2")))
            .alias("lp"),
        )
    )
    return (
        first.unionByName(pairs)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp").alias("sum_logp"),
        )
        .select(
            "id",
            "n_tokens",
            F.round("sum_logp", 6).alias("sum_logp"),
            F.round(F.col("sum_logp") / F.col("n_tokens"), 6).alias(
                "avg_logp"
            ),
            F.round(
                F.exp(-F.col("sum_logp") / F.col("n_tokens")), 6
            ).alias("perplexity"),
        )
    )


def lm_quality_from_index(
    spark, docs: DataFrame, index_dir: str, **kwargs
) -> DataFrame:
    """lm_quality against the LM tables of a built index
    (build_index(index_shingles=True) / build_shingle_stats)."""
    from search_engine_spark import schemas
    from search_engine_spark.index.builder import IndexPaths

    paths = IndexPaths(index_dir)
    sh = spark.read.schema(schemas.SHINGLE_STATS).parquet(
        paths.shingle_stats
    ).withColumnRenamed("cnt", "bcnt")
    ug = spark.read.schema(schemas.UNIGRAM_STATS).parquet(
        paths.unigram_stats
    )
    corpus = spark.read.parquet(paths.corpus_stats).collect()[0]
    return lm_quality(
        docs, sh, ug, int(corpus["total_tokens"]), **kwargs
    )


# ---------------------------------------------------------------------------
# Pretraining-corpus filters: Gopher rule battery, C4 line rules, PII
# ---------------------------------------------------------------------------

# the pinned "required word" set of Gopher's stop-word rule (Rae et al.
# 2021 §A1.1: a doc must contain >= 2 of these 8 function words)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1) — the
    document-shape filters pretraining pipelines run before content
    filters.  Per doc: the measured features, one boolean per rule, and
    `passes_gopher` = AND of all rules.  Thresholds are the paper's
    defaults, overridable per corpus.

      n_words            whitespace word count in [min_words, max_words]
      mean_word_len      in [min_mean_word_len, max_mean_word_len]
      symbol_ratio       ('#' or ellipsis occurrences) / n_words <= max
      bullet_ratio       lines starting with a bullet <= max
      ellipsis_ratio     lines ending in an ellipsis <= max
      alpha_ratio        words containing >= 1 alphabetic char >= min
      stop_hits          distinct GOPHER_STOPWORDS present >= min

    All native column expressions (one projection chain, zero Python in
    the row path, embarrassingly parallel — no shuffle at any scale);
    the DuckDB-SQL twin lives in the driver contract."""
    text = F.col("_t")
    words = F.col("_w")
    lines = F.col("_l")
    n_words = F.size(words)
    n_lines = F.size(lines)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).cast("double") / n_words,
    ).otherwise(0.0)
    n_sym = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    symbol_ratio = F.when(
        n_words > 0, n_sym.cast("double") / n_words
    ).otherwise(0.0)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    bullet_ratio = F.when(
        n_lines > 0, n_bullet.cast("double") / n_lines
    ).otherwise(0.0)
    n_ell = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    ellipsis_ratio = F.when(
        n_lines > 0, n_ell.cast("double") / n_lines
    ).otherwise(0.0)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = F.when(
        n_words > 0, n_alpha.cast("double") / n_words
    ).otherwise(0.0)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(words), stop_arr))

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        _words_col(F.col(text_col)).alias("_w"),
        F.filter(
            F.split(F.col(text_col), "\n"),
            lambda l: F.length(F.trim(l)) > 0,
        ).alias("_l"),
    )
    feats = base.select(
        "id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "rule_bullet_ratio": F.col("bullet_ratio") <= max_bullet_ratio,
        "rule_ellipsis_ratio": F.col("ellipsis_ratio") <= max_ellipsis_ratio,
        "rule_alpha_ratio": F.col("alpha_ratio") >= min_alpha_ratio,
        "rule_stopwords": F.col("stop_hits") >= min_stop_hits,
    }
    out = feats
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes_gopher", passes)


# PII patterns — pinned to the RE2 ∩ Java-regex common subset so the
# Spark expressions and the DuckDB oracle share them verbatim
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII detection + redaction for training-data scrubbing: count
    emails / IPv4 addresses / phone-shaped digit runs per doc and emit
    `redacted` text with each match replaced by its <EMAIL>/<IP>/<PHONE>
    placeholder.  Redaction order is email → ip → phone, so a digit
    run inside an already-redacted match is not double-counted.

    Regexes are pinned in the RE2 ∩ Java common subset (no lookaround,
    no backrefs) so the DuckDB oracle runs them verbatim.  Native
    regexp_count/regexp_replace, zero Python, no shuffle."""
    text = F.col(text_col)
    n_email = F.regexp_count(text, F.lit(PII_EMAIL))
    red1 = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(red1, F.lit(PII_IPV4))
    red2 = F.regexp_replace(red1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(red2, F.lit(PII_PHONE))
    red3 = F.regexp_replace(red2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("id"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
        red3.alias("redacted"),
    )


def c4_line_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 3,
) -> DataFrame:
    """C4-style line rules (Raffel et al. 2020 §2.2): keep only lines
    that end in terminal punctuation (. ! ? " ') AND have at least
    `min_line_words` words AND don't mention "javascript"; flag docs
    containing "lorem ipsum" or a curly brace for whole-doc removal.
    Per doc: n_lines (nonblank), n_kept, kept_ratio, the reassembled
    `clean_text` (kept lines joined by newlines, original order), and
    the two doc-level flags.

    One projection over the line array — native split/filter/trim,
    zero Python, no shuffle."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: F.length(F.trim(l)) > 0,
    )
    low = F.lower(F.col(text_col))

    def _keep(l):
        t = F.trim(l)
        words = F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " ")
        return (
            t.rlike("[.!?\"']$")
            & (F.size(words) >= min_line_words)
            & ~F.lower(t).contains("javascript")
        )

    base = df.select(
        F.col(id_col).alias("id"),
        lines.alias("_l"),
        low.contains("lorem ipsum").alias("has_lorem_ipsum"),
        low.contains("{").alias("has_brace"),
    )
    kept = F.filter(F.col("_l"), _keep)
    n_lines = F.size(F.col("_l"))
    n_kept = F.size(kept)
    return base.select(
        "id",
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        F.round(
            F.when(n_lines > 0, n_kept.cast("double") / n_lines)
            .otherwise(0.0),
            6,
        ).alias("kept_ratio"),
        F.array_join(
            F.transform(kept, lambda l: F.trim(l)), "\n"
        ).alias("clean_text"),
        "has_lorem_ipsum",
        "has_brace",
    )
