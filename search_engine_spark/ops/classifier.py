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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), r"\s+"),
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
