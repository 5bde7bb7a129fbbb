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
    return model, predictions_from_model(test, model, features_col)


def predictions_from_model(
    df: DataFrame,
    model,
    features_col: str,
    prediction_col: str = "prediction",
) -> DataFrame:
    """Score with a fitted LogisticRegressionModel via PURE column
    expressions over its coefficients (argmax of the linear margins)
    instead of ``model.transform``.

    Two reasons: (1) scale — the coefficients become codegen literals,
    so scoring is a narrow whole-stage-codegen map with nothing
    broadcast or pickled; (2) correctness — ``model.transform`` ships
    the model object into the task closure, and the model's training
    summary drags its SparkSession along, which is NOT serializable
    once anything in the session has used ``df.observe`` (the
    ObservationManager field) — i.e. transform breaks in any session
    that also ran a write-time quality gate.  Decisions are identical:
    argmax over margins ≡ argmax over softmax probabilities.
    """
    from pyspark.ml.functions import vector_to_array

    cm = model.coefficientMatrix.toArray()
    iv = model.interceptVector.toArray()
    x = vector_to_array(F.col(features_col))

    def margin(w, b) -> F.Column:
        arr = F.array(*[F.lit(float(v)) for v in w])
        dot = F.aggregate(
            F.zip_with(x, arr, lambda a, c: a * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return dot + F.lit(float(b))

    if cm.shape[0] == 1:  # binary: positive margin -> class 1
        pred = (margin(cm[0], iv[0]) > 0).cast("double")
    else:
        margins = F.array(*[margin(cm[i], iv[i]) for i in range(cm.shape[0])])
        pred = (F.array_position(margins, F.array_max(margins)) - 1).cast("double")
    return df.withColumn(prediction_col, pred)


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


def embedding_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
):
    """Principal-component projection of an embedding column — the
    dimensionality-reduction / decorrelation step an embedding-dedup
    or ANN pipeline runs before indexing.  Spark-first: wraps
    ``pyspark.ml.feature.PCA``, whose fit is ONE distributed
    treeAggregate of Gram/mean partials (the same partial-aggregation
    shape as everything else here) followed by a driver-side
    eigendecomposition of the d×d covariance — d is the embedding
    width, never the row count — and whose transform is a broadcast
    matrix multiply, narrow and linear.

    Returns ``(projected_df, model)``: projected_df carries
    (id_col, components array<double> of length k); the model exposes
    ``explainedVariance`` (proportions) and ``pc``.  Component SIGNS
    are an eigenvector convention (deterministic for a fixed build,
    arbitrary in principle) — downstream consumers must not encode
    sign expectations, which is also why the registered query gates on
    explained variance rather than raw projections.
    """
    from pyspark.ml.feature import PCA as SparkPCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v"),
    )
    model = SparkPCA(k=k, inputCol="__v", outputCol="__p").fit(feat)
    projected = model.transform(feat).select(
        id_col, vector_to_array(F.col("__p")).alias("components")
    )
    return projected, model


def pca_spectrum_gate(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """One-row eigen-LAW gate over a full-rank ``embedding_pca`` fit
    (k = dim): the explained-variance proportions must be
    non-increasing (eigenvalues sorted descending) and sum to 1 within
    1e-6 (a rotation preserves total variance).  These are exact
    mathematical laws of a correct distributed Gram pass +
    eigendecomposition — data-independent, so the gate can never go
    stale with regenerated testdata, yet a wrong covariance
    accumulation (dropped partials, mis-ordered dims) breaks both.
    A share-of-variance bound was deliberately NOT used: top-k always
    captures ≥ k/dim by the eigenvalue ordering (any smaller bound is
    vacuous), and the test embeddings are near-isotropic (any larger
    bound is brittle)."""
    spark = df.sparkSession
    _, model = embedding_pca(df, vec_col=vec_col, id_col=id_col, k=dim)
    ev = [float(v) for v in model.explainedVariance]
    monotone_ok = bool(all(a >= b - 1e-12 for a, b in zip(ev, ev[1:])))
    total_ok = bool(abs(sum(ev) - 1.0) <= 1e-6)
    return spark.createDataFrame(
        [(dim, monotone_ok, total_ok)],
        "dim: int, monotone_ok: boolean, total_ok: boolean",
    )
