"""Unit coverage for the round-4 featurization/ids/ml additions:
contiguous id assignment equals global ROW_NUMBER for any shard count,
hashed TF-IDF matches an independent model, and the sparse→dense
vector assembly is exact."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import features, ids, ml


@pytest.mark.parametrize("n_shards", [1, 3, 16, 100])
def test_contiguous_ids_equal_global_rank(spark, n_shards):
    rows = [Row(k=i, v=(i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows)
    out = ids.assign_contiguous_ids(
        df, [F.col("v").desc(), F.col("k").asc()], n_shards=n_shards
    )
    got = {r.k: r.row_id for r in out.collect()}
    want = {
        r.k: i
        for i, r in enumerate(sorted(rows, key=lambda r: (-r.v, r.k)))
    }
    assert got == want


def test_contiguous_ids_empty_and_single(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert ids.assign_contiguous_ids(df, [F.col("k")]).count() == 0
    one = spark.createDataFrame([Row(k=1, v=2)])
    assert ids.assign_contiguous_ids(one, [F.col("k")]).collect()[0].row_id == 0


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_hashed_tfidf_matches_model(spark):
    docs = [
        (0, "a a b c"),
        (1, "b c d"),
        (2, "a d d"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 32
    got = {
        (r.doc_id, r.feature): r.weight
        for r in features.hashed_tfidf(df, "text", "doc_id", dim=dim).collect()
    }
    # independent model
    n_docs = 3
    tf = {}
    for d, t in docs:
        for w in t.split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    want = {}
    for (d, w), c in tf.items():
        feat = _md5_48(w) % dim
        want[(d, feat)] = want.get((d, feat), 0.0) + c * ((n_docs + 1.0) / (dfreq[w] + 1.0))
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_dense_features_roundtrip(spark):
    triples = spark.createDataFrame(
        [(0, 1, 2.5), (0, 3, 1.0), (1, 0, 4.0)],
        "doc_id long, feature long, weight double",
    )
    out = ml.dense_features_from_triples(triples, "doc_id", dim=4)
    vecs = {r.doc_id: list(r.features) for r in out.collect()}
    assert vecs == {0: [0.0, 2.5, 0.0, 1.0], 1: [4.0, 0.0, 0.0, 0.0]}


def test_train_eval_classifier_learns_linear_boundary(spark):
    # 2-D linearly separable data WITH A MARGIN (points exactly on the
    # x+y=0 boundary predict by float-tiny sign and flip run to run);
    # the held-out fold must classify near-perfectly.
    from pyspark.ml.functions import array_to_vector

    rows = [
        Row(i=i, x=float(i % 17) - 8.0, y=float((i * 7) % 13) - 6.0)
        for i in range(300)
        if (i % 17) - 8 + (i * 7) % 13 - 6 != 0
    ]
    df = (
        spark.createDataFrame(rows)
        .withColumn("label", (F.col("x") + F.col("y") > 0).cast("double"))
        .select(
            "i",
            array_to_vector(F.array("x", "y")).alias("features"),
            "label",
        )
    )
    _, pred = ml.train_eval_classifier(df, "features", "label", split_key="i")
    row = ml.accuracy_summary(pred, "label", threshold=0.9).collect()[0]
    assert row.accuracy_ok and row.n_test > 0
