"""Model-based quality classification for training-data curation —
the DCLM / FineWeb-Edu shape: train a lightweight linear classifier on
weak labels (a trusted seed corpus vs junk), then score every document
and keep by predicted quality.

This complements the heuristic gates in ops/textstats.py (length /
stopword / punctuation ratios): heuristics catch structural junk; the
classifier catches fluent-but-worthless text by CONTENT, the class the
big curation pipelines filter with exactly this recipe (fastText-style
hashed bag-of-ngrams + logistic regression).

Scale shape — every stage is the native Spark ML path:

- featurization: lowercase whitespace words + adjacent word bigrams
  (the fastText trick for local order) → `HashingTF` (JVM-side hashed
  term counts, no vocabulary collect, dimension fixed at `n_features`)
  — map-only, no shuffle.
- training: `pyspark.ml` LogisticRegression — distributed L-BFGS with
  treeAggregate gradient passes; the MODEL (one coefficient vector of
  n_features doubles) is the only driver-side state, corpus size never
  matters.  The same "collect a bounded model, never the data" pattern
  as ops/bpe.train_bpe and the ANN k-means trainer.
- scoring: one map-only transform with the broadcast coefficient
  vector; the emitted probability column feeds quality_sample /
  select_token_budget (ops/curation.py) unchanged.

Scores are a deterministic function of the trained model; L-BFGS
convergence itself can differ at float precision across cluster shapes
(aggregation order), so tests pin SEPARATION and ranking, not exact
coefficients — the honest contract for any distributed trainer.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.common import md5int_col, md5int_sql


# Feature lowering is an EXPLICIT ASCII translate, not lower():
# JVM toLowerCase and DuckDB's utf8proc lower() disagree on full-vs-
# simple Unicode case mapping ('İ' -> 'i̇' (i + U+0307) vs 'i';
# uppercase Greek final sigma -> 'ς' vs 'σ'), which would break the
# frozen-score hash oracle on non-ASCII corpora (ADVICE r4).  A-Z→a-z
# is identical in every engine; non-ASCII case is left intact by
# design (case-variant non-ASCII grams hash separately — a modeling
# choice, not a portability bug).  The split uses an EXPLICIT
# whitespace class, not \s: Java's \s is [ \t\n\x0B\f\r] but RE2's
# (DuckDB's) \s EXCLUDES vertical tab \x0B, so '\s+' tokenizes
# \x0B-separated text differently across engines (found in round-5
# review, verified empirically) — spelling the Java set out makes
# both engines split identically.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_WS_CLASS = r"[ \t\n\x0B\f\r]+"


def _words(text_col: Column) -> Column:
    return F.filter(
        F.split(
            F.translate(text_col, _ASCII_UPPER, _ASCII_LOWER), _WS_CLASS
        ),
        lambda t: F.length(t) > 0,
    )


def ngram_features(text_col: Column) -> Column:
    """words + adjacent word bigrams ("a b") — the fastText feature
    set, as one native array expression.  NULL text yields an empty
    array (HashingTF NPEs on null input, and a null doc is simply a
    doc with no features)."""
    w = F.coalesce(
        _words(text_col), F.array().cast("array<string>")
    )
    n = F.size(w)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit the hashed-ngram logistic model: positives are the trusted
    seed corpus (label 1), negatives the junk sample (label 0).
    Returns the fitted pyspark.ml PipelineModel-equivalent pair
    (hashingTF, lrModel) wrapped in a QualityModel."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    if n_features <= 0:
        raise ValueError("n_features must be > 0")
    pos = positives.select(
        ngram_features(F.col(text_col)).alias("_grams"),
        F.lit(1.0).alias("label"),
    )
    neg = negatives.select(
        ngram_features(F.col(text_col)).alias("_grams"),
        F.lit(0.0).alias("label"),
    )
    data = pos.unionByName(neg).filter(F.size("_grams") > 0)
    tf = HashingTF(
        inputCol="_grams", outputCol="features",
        numFeatures=int(n_features),
    )
    lr = LogisticRegression(
        maxIter=int(max_iter), regParam=float(reg_param),
        featuresCol="features", labelCol="label",
    )
    model = lr.fit(tf.transform(data))
    # Drop the training summary: it pins the SparkSession into the
    # model's object graph, and serializing the session into score()'s
    # task closure fails whenever session state holds a non-serializable
    # member (observed: ObservationManager after any df.observe() in the
    # same session).  setSummary is package-private in Scala — public at
    # the JVM level — so clear it defensively; scoring needs only the
    # coefficient vector.
    try:
        spark = positives.sparkSession
        model._java_obj.setSummary(spark._jvm.scala.Option.empty())
    except Exception:
        pass  # best-effort: without an observer in the session the
        # summary is harmless, and scoring still works
    return QualityModel(tf, model)


class QualityModel:
    """A trained quality classifier: broadcast-sized coefficients,
    map-only scoring."""

    def __init__(self, tf, lr_model):
        self.tf = tf
        self.lr_model = lr_model

    def score(
        self, df: DataFrame, id_col: str, text_col: str = "text"
    ) -> DataFrame:
        """(id, quality_prob) — P(label=1) per document.  One map-only
        pass: hashing + dot product, JVM-side throughout."""
        from pyspark.ml.functions import vector_to_array

        feats = self.tf.transform(
            df.select(
                F.col(id_col).alias("id"),
                ngram_features(F.col(text_col)).alias("_grams"),
            )
        )
        scored = self.lr_model.transform(feats)
        return scored.select(
            "id",
            vector_to_array("probability")[1].alias("quality_prob"),
        )


def classifier_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: QualityModel,
    threshold: float = 0.5,
    soft: bool = False,
    salt: str = "clf",
) -> DataFrame:
    """Keep documents the model rates above `threshold` — or, with
    `soft=True`, keep each doc with probability equal to its model
    score (the FineWeb-Edu soft-keep, deterministic by id hash — the
    same predicate as ops/curation.quality_sample).

    ONE corpus scan, zero shuffle: featurization and the LR transform
    carry the original columns through, the keep predicate filters
    row-locally, and the model columns are dropped — never a score
    pass followed by a semi-join back."""
    from pyspark.ml.functions import vector_to_array

    from search_engine_spark.ops.sampling import BUCKETS, _bucket_col

    feats = model.tf.transform(
        df.withColumn("_grams", ngram_features(F.col(text_col)))
    )
    scored = model.lr_model.transform(feats)
    prob = vector_to_array(F.col("probability"))[1]
    if soft:
        keep = _bucket_col(F.col(id_col), salt) < F.floor(
            F.least(F.greatest(prob, F.lit(0.0)), F.lit(1.0)) * BUCKETS
        ).cast("long")
    else:
        keep = prob >= float(threshold)
    drop = ["_grams", "features", "rawPrediction", "probability",
            "prediction"]
    return scored.filter(keep).drop(*drop)


# ---------------------------------------------------------------------------
# frozen-model path (engine-portable scoring — the FineWeb-Edu shape)
# ---------------------------------------------------------------------------
# The production curation pattern is "train ONCE on a trusted seed, then
# score every corpus with the frozen model".  The trainer above (HashingTF
# + distributed L-BFGS) is the scale path for training; this section makes
# the SCORING half exactly reproducible across engines so a frozen model's
# scores are oracle-checkable:
#
# - features are md5-bucketed (ops.common.md5int_col, the same portable
#   hash DSIR uses) instead of Spark-private murmur3, so DuckDB / Python
#   replicas bucket identically;
# - frozen coefficients are INTEGER-scaled (round(coef * FROZEN_SCALE)),
#   so the per-document logit accumulates as an exact int64 sum in any
#   engine — no float-aggregation-order ambiguity — and only the final
#   sigmoid touches floating point (one exp of an identical double).
#
# Scale shape of score_frozen: one corpus scan, one explode, a broadcast
# join against the <=n_buckets-row coefficient table, ONE shuffle (the
# per-doc sum).  No vocabulary collect, no Python in the hot path.

FROZEN_SCALE = 1_000_000
FROZEN_BUCKETS = 4096


def gram_bucket_col(gram: Column, n_buckets: int) -> Column:
    """Portable feature bucket: md5-int of the gram mod n_buckets."""
    return md5int_col(gram) % int(n_buckets)


def train_frozen_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_buckets: int = FROZEN_BUCKETS,
    max_iter: int = 30,
    reg_param: float = 1e-4,
) -> Tuple[int, List[int]]:
    """Train the md5-bucketed logistic model and freeze it: returns
    (intercept_scaled, coef_scaled[n_buckets]) — integers at
    FROZEN_SCALE.  Training is the same distributed pyspark.ml L-BFGS
    as train_quality_classifier; only the feature hash differs (md5
    buckets), so the frozen vector scores identically on any engine.

    Duplicate (text, label) rows are collapsed with an instance-weight
    column before featurization (identical LR loss, smaller explode),
    which also gives each training row a stable content-derived key for
    the explode->groupBy feature assembly — no monotonically_increasing_id,
    whose values are not stable across re-evaluations of the plan.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    if n_buckets <= 0:
        raise ValueError("n_buckets must be > 0")
    B = int(n_buckets)
    pos = positives.select(
        F.col(text_col).alias("_text"), F.lit(1.0).alias("label")
    )
    neg = negatives.select(
        F.col(text_col).alias("_text"), F.lit(0.0).alias("label")
    )
    data = (
        pos.unionByName(neg)
        .groupBy("_text", "label")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .withColumn(
            "_rid",
            F.md5(F.concat(F.col("label").cast("string"),
                           F.lit("|"), F.coalesce("_text", F.lit("")))),
        )
        .withColumn("_grams", ngram_features(F.col("_text")))
        .filter(F.size("_grams") > 0)
    )
    counts = (
        data.select("_rid", F.explode("_grams").alias("_g"))
        .select("_rid", gram_bucket_col(F.col("_g"), B).alias("_b"))
        .groupBy("_rid", "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .groupBy("_rid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_b", "_c"))
            ).alias("_m")
        )
        .select(
            "_rid",
            array_to_vector(
                F.transform(
                    F.sequence(F.lit(0), F.lit(B - 1)),
                    # _m is a MAP keyed by bucket id (element_at on a
                    # map is key lookup, not 1-based position)
                    lambda i: F.coalesce(
                        F.element_at("_m", i.cast("long")), F.lit(0.0)
                    ),
                )
            ).alias("features"),
        )
    )
    train = data.select("_rid", "label", "w").join(counts, "_rid")
    lr = LogisticRegression(
        maxIter=int(max_iter), regParam=float(reg_param),
        featuresCol="features", labelCol="label", weightCol="w",
    )
    model = lr.fit(train)
    coef = model.coefficients.toArray()
    return (
        int(round(float(model.intercept) * FROZEN_SCALE)),
        [int(round(float(c) * FROZEN_SCALE)) for c in coef],
    )


def score_frozen(
    df: DataFrame,
    id_col: str,
    intercept_scaled: int,
    coef_scaled: Sequence[int],
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_prob) under a frozen md5-bucket model — natively,
    exactly.  Per-gram-occurrence scaled coefficients sum as int64
    (exact in every engine); quality_prob = round6(sigmoid(logit)).

    NOTE on the repo-shipped literals: ops/quality_frozen.py is the
    ORACLE VEHICLE — a model frozen from the sf0.01 synthetic corpus
    vs 400 synthesized junk docs so the contract gate can hash-verify
    this scoring path against an independent engine.  It is NOT a
    production quality gate: to score a real corpus, retrain on that
    corpus (positives/negatives of your choice) via
    scripts/freeze_quality_model.py and ship the regenerated
    literals.  This function scores exactly under ANY
    (intercept_scaled, coef_scaled) pair the trainer emits.

    Plan: corpus scan -> explode grams -> broadcast join the nonzero-
    coefficient table -> ONE groupBy(id) sum -> left join back to the
    id spine (zero-gram / null-text docs score sigmoid(intercept))."""
    spark = df.sparkSession
    B = len(coef_scaled)
    if B == 0:
        raise ValueError("coef_scaled must be non-empty")
    coef_rows = [(b, int(c)) for b, c in enumerate(coef_scaled) if c != 0]
    coef_df = spark.createDataFrame(
        coef_rows or [(-1, 0)], "b long, c long"
    )
    ids = df.select(F.col(id_col).alias("id"))
    occ = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(ngram_features(F.col(text_col))).alias("_g"),
        )
        .select("id", gram_bucket_col(F.col("_g"), B).alias("b"))
        .join(F.broadcast(coef_df), "b")
        .groupBy("id")
        .agg(F.sum("c").alias("_t"))
    )
    logit = (
        (F.lit(int(intercept_scaled)) + F.coalesce("_t", F.lit(0)))
        .cast("double") / F.lit(float(FROZEN_SCALE))
    )
    return ids.join(occ, "id", "left").select(
        "id",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6
        ).alias("quality_prob"),
    )


def frozen_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    intercept_scaled: int,
    coef_scaled: Sequence[int],
) -> str:
    """DuckDB twin of score_frozen over `table(id_col, text_col)`:
    the same grams (ASCII-lowered whitespace words + adjacent
    bigrams — see _words for why the lowering is an explicit A-Z
    translate), the same md5 buckets, the same exact integer logit,
    the same round-6 sigmoid.  Emits only nonzero coefficients as a
    VALUES table."""
    B = len(coef_scaled)
    rows = [(b, int(c)) for b, c in enumerate(coef_scaled) if c != 0]
    values = ", ".join(f"({b}, {c})" for b, c in rows) or "(-1, 0)"
    return f"""
WITH _w AS (
  SELECT {id_col} AS id,
         coalesce(list_filter(
           string_split_regex(
             translate({text_col},
                       '{_ASCII_UPPER}', '{_ASCII_LOWER}'),
             '{_WS_CLASS}'),
           x -> length(x) > 0), []) AS l
  FROM {table}),
_g AS (
  SELECT id, t AS gram FROM _w, unnest(l) AS u(t)
  UNION ALL
  SELECT id, l[i] || ' ' || l[i + 1]
  FROM _w, unnest(range(1, len(l))) AS r(i)),
_coef(b, c) AS (VALUES {values}),
_s AS (
  SELECT id, sum(c) AS t
  FROM (SELECT id, {md5int_sql('gram')} % {B} AS b FROM _g) j
  JOIN _coef USING (b) GROUP BY id)
SELECT w.id AS id,
       round(1.0 / (1.0 + exp(-(({intercept_scaled} + coalesce(t, 0))
             / {float(FROZEN_SCALE)}))), 6) AS quality_prob
FROM _w w LEFT JOIN _s s ON w.id = s.id"""
