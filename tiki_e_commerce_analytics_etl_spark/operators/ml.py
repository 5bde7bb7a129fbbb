"""Trainable corpus-quality classification on top of pyspark.ml.

Web-scale curation pipelines train lightweight classifiers (the
CCNet / fastText pattern: label a small seed set, score the whole
corpus) rather than hand-tuning heuristics.  This module is the glue
between the engine's relational feature surfaces and pyspark.ml
estimators, keeping every step JVM-side:

- dense feature columns come straight from ``array_to_vector``
  (pyspark.ml.functions — a JVM expression, no Python UDF);
- sparse hashed-TF-IDF triples (operators/features.py) densify with
  ``map_from_entries`` + ``transform`` over a static index sequence —
  still pure expressions — then convert;
- training/scoring is LogisticRegression (distributed L-BFGS: per-
  iteration treeAggregate of gradient partials — the same partial-
  aggregation shape as everything else in this engine).

Scoring the full corpus with a trained model is ``model.transform`` —
a narrow, broadcast-coefficient map stage that scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_features_from_triples(
    triples: DataFrame,
    id_col: str,
    feature_col: str = "feature",
    weight_col: str = "weight",
    dim: int = 1024,
    out_col: str = "features",
) -> DataFrame:
    """(id, feature, weight) sparse triples → (id, DenseVector[dim]).
    Pure expressions (map lookup over a static index sequence) feeding
    the JVM ``array_to_vector``; absent features read 0.0."""
    from pyspark.ml.functions import array_to_vector

    as_map = triples.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(feature_col), F.col(weight_col)))
        ).alias("__m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dense = F.transform(idx, lambda i: F.coalesce(F.element_at("__m", i), F.lit(0.0)))
    return as_map.select(F.col(id_col), array_to_vector(dense).alias(out_col))


def train_eval_classifier(
    df: DataFrame,
    features_col: str,
    label_col: str,
    test_fold: int = 0,
    n_folds: int = 5,
    split_key: str | None = None,
    max_iter: int = 30,
    reg_param: float = 0.01,
) -> tuple[object, DataFrame]:
    """Deterministic hash-fold split (``split_key % n_folds``), fit a
    multinomial LogisticRegression on the complement, score the held-
    out fold.  Returns (model, predictions-on-test)."""
    from pyspark.ml.classification import LogisticRegression

    key = F.col(split_key) if split_key else F.crc32(F.col(label_col).cast("string"))
    fold = F.pmod(key, F.lit(n_folds))
    train = df.where(fold != test_fold)
    test = df.where(fold == test_fold)
    lr = LogisticRegression(
        featuresCol=features_col,
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(train)
    return model, model.transform(test)


def accuracy_summary(
    predictions: DataFrame,
    label_col: str,
    prediction_col: str = "prediction",
    threshold: float = 0.35,
) -> DataFrame:
    """One-row (n_test, n_correct, accuracy_ok) gate: accuracy must
    clear ``threshold`` — set it from the CHANCE level of the label
    distribution (e.g. ≥3× chance for 10 balanced classes), not from
    a measured floor, so regenerated test data cannot flip the gate
    without a real regression."""
    return predictions.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col(prediction_col) == F.col(label_col).cast("double")).cast("long")
        ).alias("n_correct"),
    ).select(
        "n_test",
        "n_correct",
        (F.col("n_correct") >= F.col("n_test") * F.lit(threshold)).alias("accuracy_ok"),
    )
