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
