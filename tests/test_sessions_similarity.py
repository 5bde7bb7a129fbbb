"""Unit tests for sessionization, embedding near-dup, and the
checks-report operator (golden-pair style, SURVEY.md §5)."""

import datetime as dt

from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import quality, sessions, similarity


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, 100, _ts(0)),
        (2, 100, _ts(10)),   # same session (gap 600s <= 1800)
        (3, 100, _ts(50)),   # new session (gap 2400s > 1800)
        (4, 200, _ts(5)),    # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    out = sessions.sessionize(df, "user_id", "ts", 1800, ["event_id"])
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}

    stats = sessions.session_stats(df, "user_id", "ts", 1800, ["event_id"]).collect()
    by_key = {(r["user_id"], r["session_seq"]): r for r in stats}
    assert by_key[(100, 1)]["n_events"] == 2
    assert by_key[(100, 1)]["session_end"] == _ts(10)
    assert by_key[(100, 2)]["n_events"] == 1


def test_cosine_neardup_exact_and_lsh_agree_on_obvious_dups(spark):
    base = [1.0] + [0.0] * 63
    near = [0.99] + [0.01] * 63
    ortho = ([0.0] * 32 + [1.0] * 32)
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "vec_id: long, embedding: array<double>"
    )
    exact = similarity.cosine_neardup_pairs(df, threshold=0.9, method="exact").collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(1, 2)]
    assert exact[0]["score"] > 0.99

    lsh = similarity.cosine_neardup_pairs(
        df, threshold=0.9, method="lsh", n_planes=4, n_tables=8
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in lsh] == [(1, 2)]


def test_cosine_neardup_blocked_matches_broadcast_bitexact(spark):
    """The distributed block-cogroup exact path must reproduce the
    collect-and-broadcast baseline bit for bit (same sequential dim
    fold), across block boundaries and input partitionings."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) * 0.2 + (i % 7) for _ in range(16)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>").repartition(5)
    blocked = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity.cosine_neardup_pairs(df, threshold=0.8, method="exact").collect()
    }
    broadcast = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity.cosine_neardup_pairs(
            df, threshold=0.8, method="exact_broadcast"
        ).collect()
    }
    assert blocked == broadcast  # exact float equality, not approx
    assert len(blocked) > 10


def test_lsh_topk_recall_vs_brute_force(spark):
    """LSH candidates + exact rerank should recover most of the true
    top-k on a clustered corpus (deterministic seeded vectors)."""
    import random

    rng = random.Random(7)
    rows = []
    for cid in range(8):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for j in range(25):
            rows.append(
                (cid * 25 + j, [c + rng.gauss(0, 0.15) for c in center])
            )
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    q = df.filter(F.col("vec_id") % 50 == 0)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        # corpus_size passed: the corpus is an in-memory relation with
        # no catalog stats, and the caller (unlike the engine) knows
        # its count — exactly what the no-stats warning asks for
        for r in similarity.lsh_topk(
            df, q, k=5, n_tables=16, corpus_size=len(rows)
        ).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"lsh recall {recall}"

    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(df, q, k=5, n_clusters=8, nprobe=2).collect()
    }
    ivf_recall = len(truth & ivf) / len(truth)
    assert ivf_recall >= 0.9, f"ivf recall {ivf_recall}"


def test_resample_ffill_daily(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import grouped

    rows = [
        (1, dt.date(2024, 1, 1), 10.0),
        (1, dt.date(2024, 1, 4), 40.0),   # 2-day gap → filled with 10.0
        (2, dt.date(2024, 2, 1), 5.0),    # single-day key
    ]
    df = spark.createDataFrame(
        rows, "product_id: long, snapshot_date: date, current_price: double"
    )
    out = grouped.resample_ffill_daily(df).collect()
    by_key = {(r["product_id"], str(r["snapshot_date"])): r for r in out}
    assert len(out) == 5  # 4 days for key 1 + 1 day for key 2
    assert by_key[(1, "2024-01-02")]["current_price"] == 10.0
    assert by_key[(1, "2024-01-02")]["is_observed"] is False
    assert by_key[(1, "2024-01-04")]["current_price"] == 40.0
    assert by_key[(1, "2024-01-04")]["is_observed"] is True
    assert by_key[(2, "2024-02-01")]["current_price"] == 5.0
    # the applyInPandas variant agrees row-for-row on deduped input
    pandas_out = grouped.resample_ffill_daily_pandas(df).collect()
    assert sorted(map(tuple, pandas_out)) == sorted(map(tuple, out))
    # observed NULL values carry the previous value like a missing day
    rows_n = rows + [(1, dt.date(2024, 1, 5), None)]
    dfn = spark.createDataFrame(
        rows_n, "product_id: long, snapshot_date: date, current_price: double"
    )
    a = sorted(map(tuple, grouped.resample_ffill_daily(dfn).collect()))
    b = sorted(map(tuple, grouped.resample_ffill_daily_pandas(dfn).collect()))
    assert a == b
    nrow = dict(((k, str(d)), (v, o)) for k, d, v, o in a)
    assert nrow[(1, "2024-01-05")] == (40.0, True)  # filled but observed


def test_checks_report_rows(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0)], "k: long, v: double"
    )
    checks = [
        quality.Check("no_negative_v", violation=F.col("v") < 0),
        quality.Check("no_null_k", violation=F.col("k").isNull()),
        quality.Check("nonempty", must_hold=F.count(F.lit(1)) > 0),
    ]
    rows = {r["check_name"]: r for r in quality.checks_report(df, checks).collect()}
    assert rows["no_negative_v"]["violations"] == 1
    assert rows["no_negative_v"]["passed"] is False
    assert rows["no_null_k"]["violations"] == 1
    assert rows["nonempty"]["violations"] is None
    assert rows["nonempty"]["passed"] is True


def test_semdedup_pairs_subset_of_exact_with_identical_scores(spark):
    from tiki_e_commerce_analytics_etl_spark.io import read_table
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.id_a, r.id_b): r.score
        for r in similarity.cosine_neardup_pairs(emb, 0.4, method="exact").collect()
    }
    sd = similarity.semdedup_pairs(emb, threshold=0.4, n_clusters=16).collect()
    assert len(sd) > 0
    for r in sd:
        # every within-cell pair is a true near-dup with the exact
        # path's bit-identical score
        assert (r.id_a, r.id_b) in exact
        assert r.score == exact[(r.id_a, r.id_b)]


def test_exact_neardup_supports_string_ids(spark):
    """Advisor regression: the default blocked exact path hardcoded
    int64 pair ids; string ids must work end to end."""
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    df = spark.createDataFrame(
        [
            ("doc-a", [1.0, 0.0, 0.0]),
            ("doc-b", [1.0, 0.001, 0.0]),
            ("doc-c", [0.0, 1.0, 0.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    pairs = similarity.cosine_neardup_pairs(
        df, threshold=0.9, method="exact", id_col="vec_id"
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [("doc-a", "doc-b")]


def test_pq_topk_recall_and_laws(spark):
    """PQ/ADC path: (a) with refine*k covering the whole corpus the
    result EQUALS brute force (total-candidate law — rerank is exact
    cosine, same expression shape); (b) at the production refine the
    clustered-corpus recall stays high; (c) codes are m ints in
    [0, n_codes) and two runs are identical (seeded determinism)."""
    import random

    rng = random.Random(11)
    rows = []
    for cid in range(8):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for j in range(25):
            rows.append(
                (cid * 25 + j, [c + rng.gauss(0, 0.15) for c in center])
            )
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    q = df.filter(F.col("vec_id") % 50 == 0)

    truth = [
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.brute_force_topk(df, q, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    # (a) total-candidate law: refine*k >= corpus size -> exact equality
    total = [
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.pq_topk(df, q, k=5, refine=40)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert total == truth

    # (b) production shape recall on the clustered corpus
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(df, q, k=5, refine=8).collect()
    }
    recall = len(set((a, b) for a, b, _ in truth) & approx) / len(truth)
    assert recall >= 0.8, f"pq recall {recall}"

    # (c) encoding invariants + determinism
    books = similarity.train_pq_codebooks(df, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    enc1 = similarity.pq_encode(df, books).orderBy("neighbor_id").collect()
    enc2 = similarity.pq_encode(df, books).orderBy("neighbor_id").collect()
    assert [r["codes"] for r in enc1] == [r["codes"] for r in enc2]
    for r in enc1:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])

    books2 = similarity.train_pq_codebooks(df, m=8, n_codes=16)
    import numpy as np

    assert np.array_equal(books, books2)


def test_pq_validation_errors(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 10) for i in range(40)],
        "vec_id: long, embedding: array<double>",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        similarity.train_pq_codebooks(df, m=3, n_codes=8)
    with _pytest.raises(ValueError, match="sample rows"):
        similarity.train_pq_codebooks(df.limit(4), m=2, n_codes=16)


def test_resample_interp_daily(spark):
    """Linear gap-fill: hand-computed line between observations, ffill
    semantics only where one side is missing (all-NULL edge values)."""
    import datetime as _dt

    from tiki_e_commerce_analytics_etl_spark.operators import grouped

    d = _dt.date
    rows = [
        # key 1: obs at day 1 (10.0) and day 4 (16.0) -> days 2,3 on the line
        (1, d(2024, 1, 1), 10.0),
        (1, d(2024, 1, 4), 16.0),
        # key 2: single observation -> one observed row, nothing filled
        (2, d(2024, 1, 5), 7.0),
        # key 3: NULL edge value -> backfill from the only observation
        (3, d(2024, 1, 1), None),
        (3, d(2024, 1, 3), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "product_id: long, snapshot_date: date, current_price: double"
    )
    out = {
        (r["product_id"], r["snapshot_date"]): (
            r["current_price"],
            r["is_observed"],
        )
        for r in grouped.resample_interp_daily(df).collect()
    }
    assert out[(1, d(2024, 1, 1))] == (10.0, True)
    assert out[(1, d(2024, 1, 2))] == (12.0, False)  # 10 + 6*(1/3)
    assert out[(1, d(2024, 1, 3))] == (14.0, False)  # 10 + 6*(2/3)
    assert out[(1, d(2024, 1, 4))] == (16.0, True)
    assert out[(2, d(2024, 1, 5))] == (7.0, True)
    # key 3: day 1 observed-but-NULL backfills to 9.0; day 2 has no
    # earlier non-null value either -> nearest (next) observation
    assert out[(3, d(2024, 1, 1))] == (9.0, True)
    assert out[(3, d(2024, 1, 2))] == (9.0, False)
    assert out[(3, d(2024, 1, 3))] == (9.0, True)
    assert len(out) == 4 + 1 + 3
