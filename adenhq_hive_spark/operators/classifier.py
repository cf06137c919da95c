"""Distributed quality-classifier training — the model-based filter tier
of an LLM data pipeline (CCNet/LLaMA-style: distill expensive or
rule-based quality judgments into a cheap linear scorer, then apply it
at full corpus scale).

Spark-first shape: features are the map-only outputs of
``text.gopher_rules`` (already JVM-side column expressions), training is
``pyspark.ml`` LogisticRegression — L-BFGS over ``treeAggregate``'d
gradients, i.e. the distributed-ML path Spark ships; scoring the corpus
is one broadcast-coefficients map stage. No third-party ML dependency.

The trained artifact mirrors the published recipe (a linear model over
hand features approximating a quality oracle — here the Gopher rule
battery plays the oracle role the way an LM/human-label set does in
production; swap the label column for real labels without touching the
plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import gopher_rules

FEATURE_COLS = [
    "n_words",
    "n_lines",
    "mean_word_len",
    "symbol_frac",
    "bullet_frac",
    "ellipsis_frac",
    "alpha_word_frac",
    "stop_hits",
]


def quality_features(
    df: DataFrame, min_stop_hits: int = 1
) -> DataFrame:
    """Gopher-rule numeric features + binary label per document."""
    g = gopher_rules(df, min_stop_hits=min_stop_hits)
    return g.select(
        "doc_id",
        *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
        F.col("gopher_ok").cast("double").alias("label"),
    )


def train_quality_classifier(
    train_df: DataFrame,
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit a logistic-regression quality model on feature rows from
    :func:`quality_features`. Returns the fitted PipelineModel
    (assembler + scaler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="rawFeatures"
    )
    scaler = StandardScaler(
        inputCol="rawFeatures", outputCol="features",
        withMean=True, withStd=True,
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features",
        labelCol="label",
    )
    return Pipeline(stages=[assembler, scaler, lr]).fit(train_df)


def score_documents(model, feats: DataFrame) -> DataFrame:
    """Apply a trained model: (doc_id, label, prediction, p_keep)."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(feats)
    return out.select(
        "doc_id",
        "label",
        F.col("prediction"),
        F.round(
            vector_to_array(F.col("probability"))[1], 4
        ).alias("p_keep"),
    )


def classifier_gate(
    docs: DataFrame, min_accuracy: float = 0.8
) -> DataFrame:
    """Driver-visible train/eval gate: train on the even-doc_id half,
    evaluate held-out accuracy on the odd half, emit ONE constant-shaped
    row (n_eval, acc_ok) for the oracle to pin. Accuracy lands ~0.95 on
    the synthetic corpus (the label is a deterministic function of the
    features, so a linear model separates most of it); the gate bound
    leaves margin for optimizer nondeterminism (gradient aggregation
    order), which moves accuracy at the 1e-3 level, not across 0.15."""
    feats = quality_features(docs)
    train = feats.filter(F.col("doc_id") % 2 == 0)
    test = feats.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(train)
    scored = score_documents(model, test)
    return scored.agg(
        (F.count("*") > 0).alias("eval_nonempty"),
        (
            F.sum(
                F.when(F.col("prediction") == F.col("label"), 1).otherwise(0)
            )
            * 10000
            >= F.count("*") * int(round(min_accuracy * 10000))
        ).alias("acc_ok"),
    )
