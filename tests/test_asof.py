"""Backward as-of join semantics: latest right row at-or-before the
left time, per key; nulls before the first right row."""

import datetime as dt

from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_backward


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def test_asof_backward_per_key(spark):
    left = spark.createDataFrame(
        [
            ("USD", _d(1), 1),   # before any rate → null
            ("USD", _d(5), 2),   # exactly on a rate day → that rate (<=)
            ("USD", _d(7), 3),   # between 5 and 10 → rate of day 5
            ("USD", _d(30), 4),  # after last → last rate carried
            ("EUR", _d(7), 5),   # other key: EUR rates only
        ],
        "ccy: string, d: date, row_id: long",
    )
    right = spark.createDataFrame(
        [
            ("USD", _d(5), 100.0),
            ("USD", _d(10), 200.0),
            ("EUR", _d(6), 7.0),
        ],
        "ccy: string, rd: date, rate: double",
    )
    out = {
        r["row_id"]: r["rate"]
        for r in asof_join_backward(
            left, right, "d", "rd", value_cols=["rate"], by=["ccy"]
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 200.0, 5: 7.0}


def test_keyless_carry_is_per_column_with_null_values(spark):
    """Advisor regression: a bin's LATEST right row carrying a NULL in
    one value column must not mask an older non-null value of that
    column for left rows in LATER bins — the keyless path must match
    the keyed path's per-column last-non-null semantics."""
    from pyspark.sql import functions as F

    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_backward

    right = spark.createDataFrame(
        [
            # bin 0 (days 0-31 with bin_width=32): older row has rate,
            # newest row has NULL rate but a source.
            ("2024-01-01", 100.0, None),
            ("2024-01-10", None, "feed-a"),
        ],
        "d string, rate double, source string",
    ).select(F.col("d").cast("date").alias("d"), "rate", "source")
    left = spark.createDataFrame(
        [("2024-03-15",)], "ld string"  # far later bin, nothing in between
    ).select(F.col("ld").cast("date").alias("ld"))

    out = asof_join_backward(
        left, right, "ld", "d", ["rate", "source"], by=[], bin_width=32
    ).collect()[0]
    assert out.rate == 100.0  # old non-null survives the newer NULL
    assert out.source == "feed-a"

    # Keyed path must agree exactly.
    lk = left.withColumn("k", F.lit(1))
    rk = right.withColumn("k", F.lit(1))
    keyed = asof_join_backward(
        lk, rk, "ld", "d", ["rate", "source"], by=["k"]
    ).collect()[0]
    assert (keyed.rate, keyed.source) == (out.rate, out.source)


def test_asof_forward_per_key(spark):
    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            ("USD", _d(1), 1),   # before first rate -> that rate (>=)
            ("USD", _d(5), 2),   # exactly on a rate day -> that rate (>=)
            ("USD", _d(7), 3),   # between 5 and 10 -> rate of day 10
            ("USD", _d(30), 4),  # after last -> null
            ("EUR", _d(7), 5),   # other key: EUR has no later rate -> null
        ],
        "ccy: string, d: date, row_id: long",
    )
    right = spark.createDataFrame(
        [
            ("USD", _d(5), 100.0),
            ("USD", _d(10), 200.0),
            ("EUR", _d(6), 7.0),
        ],
        "ccy: string, rd: date, rate: double",
    )
    out = {
        r["row_id"]: r["rate"]
        for r in asof_join_forward(
            left, right, "d", "rd", value_cols=["rate"], by=["ccy"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 100.0, 3: 200.0, 4: None, 5: None}


def test_asof_forward_keyless_binned(spark):
    """Keyless forward reuses the binned machinery on the negated
    axis: a left row whose nearest later right row lives bins away
    (across empty bins) must still be matched."""
    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(_d(1), 1), (_d(20), 2)], "d: date, row_id: long"
    )
    right = spark.createDataFrame([(_d(25), 9.0)], "rd: date, rate: double")
    # bin_width=2 days -> day 1 and day 25 are 12 bins apart
    out = {
        r["row_id"]: r["rate"]
        for r in asof_join_forward(
            left, right, "d", "rd", value_cols=["rate"], bin_width=2
        ).collect()
    }
    assert out == {1: 9.0, 2: 9.0}


def test_asof_nearest_keyed(spark):
    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            ("USD", _d(4), 1),   # dist 1 back (d5? no - d5 is 1 later; d-? none) -> 100
            ("USD", _d(7), 2),   # 2 from d5, 3 from d10 -> 100 (backward closer)
            ("USD", _d(8), 3),   # 3 from d5, 2 from d10 -> 200 (forward closer)
            ("USD", _d(15), 4),  # only earlier -> 200
            ("EUR", _d(7), 5),   # single rate -> 7
        ],
        "ccy: string, d: date, row_id: long",
    )
    right = spark.createDataFrame(
        [
            ("USD", _d(5), 100.0),
            ("USD", _d(10), 200.0),
            ("EUR", _d(6), 7.0),
        ],
        "ccy: string, rd: date, rate: double",
    )
    out = {
        r["row_id"]: r["rate"]
        for r in asof_join_nearest(
            left, right, "d", "rd", value_cols=["rate"], by=["ccy"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 100.0, 3: 200.0, 4: 200.0, 5: 7.0}

    # tie -> backward (pandas semantics): day 7.5 impossible with
    # dates; use equidistant day 7 from rates at 5 and 9
    right2 = spark.createDataFrame(
        [("USD", _d(5), 100.0), ("USD", _d(9), 300.0)],
        "ccy: string, rd: date, rate: double",
    )
    out2 = {
        r["row_id"]: r["rate"]
        for r in asof_join_nearest(
            left.filter("row_id = 2"), right2, "d", "rd",
            value_cols=["rate"], by=["ccy"],
        ).collect()
    }
    assert out2 == {2: 100.0}

    # tolerance drops far matches (days for dates)
    out3 = {
        r["row_id"]: r["rate"]
        for r in asof_join_nearest(
            left, right, "d", "rd", value_cols=["rate"], by=["ccy"],
            tolerance=2,
        ).collect()
    }
    assert out3 == {1: 100.0, 2: 100.0, 3: 200.0, 4: None, 5: 7.0}

    import pytest as _p

    with _p.raises(ValueError, match="non-empty"):
        asof_join_nearest(left, right, "d", "rd", ["rate"], by=[])


def test_asof_nearest_row_semantics(spark):
    """The chosen right ROW supplies every value column, NULLs
    included — a closer row's NULL must not be patched from a farther
    row (row semantics, unlike backward's per-column carry)."""
    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame([("k", _d(10), 1)], "g: string, d: date, row_id: long")
    right = spark.createDataFrame(
        [("k", _d(9), None, "near"), ("k", _d(1), 5.0, "far")],
        "g: string, rd: date, rate: double, src: string",
    )
    r = asof_join_nearest(
        left, right, "d", "rd", value_cols=["rate", "src"], by=["g"]
    ).collect()[0]
    assert r["src"] == "near" and r["rate"] is None


def test_asof_nearest_fractional_numeric_time(spark):
    """Advisor regression (round 8): fractional numeric time axes must
    keep native precision.  Left t=1.6 with rights at 1.0 and 2.1 is
    nearest to 2.1 (|0.5| < |0.6|); the old long-cast image truncated
    1.6→1 and 2.1→2 and picked 1.0.  Tolerance must cut on the exact
    fractional distance too."""
    from tiki_e_commerce_analytics_etl_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame([("k", 1.6, 1)], "g: string, t: double, row_id: long")
    right = spark.createDataFrame(
        [("k", 1.0, 100.0), ("k", 2.1, 200.0)],
        "g: string, rt: double, rate: double",
    )
    r = asof_join_nearest(
        left, right, "t", "rt", value_cols=["rate"], by=["g"]
    ).collect()[0]
    assert r["rate"] == 200.0

    # exact fractional tolerance: 0.5 keeps the 2.1 match, 0.4 drops it
    keep = asof_join_nearest(
        left, right, "t", "rt", ["rate"], by=["g"], tolerance=0.5
    ).collect()[0]
    drop = asof_join_nearest(
        left, right, "t", "rt", ["rate"], by=["g"], tolerance=0.4
    ).collect()[0]
    assert keep["rate"] == 200.0 and drop["rate"] is None


def test_asof_forward_keyless_timestamp_bin_units(spark, monkeypatch):
    """Advisor regression (round 8): keyless forward on a TIMESTAMP
    axis must denominate bin_width in seconds like backward — the
    negated image is microseconds, so the width passed to the binned
    machinery must be scaled by 1e6 (otherwise ~every distinct
    timestamp lands in its own bin and the binned path's parallelism
    collapses).  Results must be identical either way."""
    import datetime as dtm

    from tiki_e_commerce_analytics_etl_spark.operators import asof as asof_mod

    seen = {}
    real = asof_mod._binned_union

    def spy(l_tagged, r_tagged, time_dtype, value_cols, bin_width):
        seen["bin_width"] = bin_width
        return real(l_tagged, r_tagged, time_dtype, value_cols, bin_width)

    monkeypatch.setattr(asof_mod, "_binned_union", spy)

    base = dtm.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(base, 1), (base + dtm.timedelta(seconds=90), 2)],
        "ts: timestamp, row_id: long",
    )
    right = spark.createDataFrame(
        [(base + dtm.timedelta(seconds=100), 9.0)], "rts: timestamp, rate: double"
    )
    out = {
        r["row_id"]: r["rate"]
        for r in asof_mod.asof_join_forward(
            left, right, "ts", "rts", value_cols=["rate"], bin_width=32
        ).collect()
    }
    assert out == {1: 9.0, 2: 9.0}
    assert seen["bin_width"] == 32 * 1_000_000

    # date axes keep day units — no scaling
    asof_mod.asof_join_forward(
        spark.createDataFrame([(_d(1), 1)], "d: date, row_id: long"),
        spark.createDataFrame([(_d(2), 1.0)], "rd: date, rate: double"),
        "d", "rd", value_cols=["rate"], bin_width=32,
    ).collect()
    assert seen["bin_width"] == 32
