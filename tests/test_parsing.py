"""Golden-pair tests for the expression library.

Every expected value is lifted verbatim from the reference's own unit
corpus (reference tests/test_transform_logic.py) so the Column
expressions provably match the pandas originals edge-case for
edge-case.
"""

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.functions import (
    build_full_path,
    category_depth,
    category_leaf,
    category_level,
    category_root,
    clean_price,
    clean_rating,
    clean_review_count,
    clean_trends_score,
    derive_parent_id,
    extract_category_id,
    extract_product_id,
    extract_url_key,
    has_tiki_now,
    parse_category_path,
    parse_discount_rate,
    parse_sales_volume,
    parse_snapshot_date,
    trend_signal_status,
    usd_price,
)


def run_scalar(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r[0] for r in df.select(fn(F.col("v")).alias("out")).collect()]


# test_transform_logic.py:27-67,245-263
SALES_VOLUME_CASES = [
    ("Đã bán 100", 100),
    ("Đã bán 1", 1),
    ("Đã bán 999", 999),
    ("Đã bán 1k", 1000),
    ("Đã bán 1.5k", 1500),
    ("Đã bán 2,5k", 2500),
    ("Đã bán 10k", 10000),
    ("Đã bán 1.2K", 1200),
    ("Đã bán 1tr", 1000000),
    ("Đã bán 2.5tr", 2500000),
    ("Đã bán 1m", 1000000),
    ("Đã bán 1.5 triệu", 1500000),
    ("Đã bán 10.000", 10000),
    (None, 0),
    ("", 0),
    ("Đã bán", 0),
    ("No sales", 0),
    ("1.5k sold", 1500),
    ("sold 500", 500),
    ("  Đã bán 200  ", 200),
    ("1500", 1500),
]


def test_parse_sales_volume(spark):
    inputs = [c[0] for c in SALES_VOLUME_CASES]
    expected = [c[1] for c in SALES_VOLUME_CASES]
    assert run_scalar(spark, parse_sales_volume, inputs) == expected


def test_parse_sales_volume_numeric_input(spark):
    df = spark.createDataFrame([(100,), (1500,), (None,)], "v: long")
    out = [r[0] for r in df.select(parse_sales_volume(F.col("v"))).collect()]
    assert out == [100, 1500, 0]


# test_transform_logic.py:70-99
DISCOUNT_CASES = [
    ("-41%", 41),
    ("-25%", 25),
    ("-10%", 10),
    ("41%", 41),
    ("25%", 25),
    ("-25", 25),
    ("30", 30),
    (None, 0),
    ("", 0),
    ("N/A", 0),
    ("30.5", 30),
]


def test_parse_discount_rate(spark):
    inputs = [c[0] for c in DISCOUNT_CASES]
    expected = [c[1] for c in DISCOUNT_CASES]
    assert run_scalar(spark, parse_discount_rate, inputs) == expected


def test_parse_discount_rate_numeric(spark):
    df = spark.createDataFrame([(41,), (-25,), (None,)], "v: long")
    out = [r[0] for r in df.select(parse_discount_rate(F.col("v"))).collect()]
    assert out == [41, 25, 0]


# test_transform_logic.py:102-149
CATEGORY_ID_CASES = [
    ("https://tiki.vn/dien-thoai-may-tinh-bang/c1789", 1789),
    ("https://tiki.vn/laptop-may-vi-tinh-linh-kien/c1846", 1846),
    ("https://tiki.vn/tai-nghe/c8318", 8318),
    ("https://tiki.vn/dien-thoai/c1789?page=2", 1789),
    ("https://tiki.vn/dien-thoai/c1789?src=c.1789", 1789),
    (None, None),
    ("", None),
    ("https://tiki.vn/no-category", None),
]


def test_extract_category_id(spark):
    inputs = [c[0] for c in CATEGORY_ID_CASES]
    expected = [c[1] for c in CATEGORY_ID_CASES]
    assert run_scalar(spark, extract_category_id, inputs) == expected


# test_transform_logic.py:152-172 + utils.js:151-166
PRICE_CASES = [
    ("1.000.000 VND", 1000000),
    ("1.290.000 ₫", 1290000),
    ("10.000", 10000),
    ("1.000.000", 1000000),
    ("25000", 25000),
    ("25000.5", 25000),
    ("25,000", 25000),
    (None, None),
    ("", None),
    ("free", None),
]


def test_clean_price(spark):
    inputs = [c[0] for c in PRICE_CASES]
    expected = [c[1] for c in PRICE_CASES]
    assert run_scalar(spark, clean_price, inputs) == expected


def test_clean_price_numeric(spark):
    df = spark.createDataFrame([(37250000.0,), (None,)], "v: double")
    out = [r[0] for r in df.select(clean_price(F.col("v"))).collect()]
    assert out == [37250000, None]


# test_transform_logic.py:175-201
def test_parse_snapshot_date(spark):
    import datetime

    cases = [
        ("2026-01-18T16:49:55.805Z", datetime.date(2026, 1, 18)),
        ("2026-01-18T16:49:55+07:00", datetime.date(2026, 1, 18)),
        ("2026-01-18", datetime.date(2026, 1, 18)),
        (None, None),
        ("not-a-date", None),
        ("", None),
    ]
    assert run_scalar(spark, parse_snapshot_date, [c[0] for c in cases]) == [c[1] for c in cases]


def test_category_path_family(spark):
    df = spark.createDataFrame(
        [("1815 > 28670 > 4593",), ("1789",), ("",), (None,), ("a > b",)], ["v"]
    )
    out = df.select(
        parse_category_path(F.col("v")).alias("arr"),
        category_leaf(parse_category_path(F.col("v"))).alias("leaf"),
        category_root(parse_category_path(F.col("v"))).alias("root"),
        category_depth(parse_category_path(F.col("v"))).alias("depth"),
    ).collect()
    assert out[0]["arr"] == [1815, 28670, 4593]
    assert (out[0]["leaf"], out[0]["root"], out[0]["depth"]) == (4593, 1815, 3)
    assert out[1]["arr"] == [1789]
    assert (out[1]["leaf"], out[1]["root"], out[1]["depth"]) == (1789, 1789, 1)
    assert out[2]["arr"] is None and out[2]["depth"] is None
    assert out[3]["arr"] is None
    assert out[4]["arr"] is None  # non-numeric tokens -> null, not partial parse


def test_url_key_and_badges(spark):
    df = spark.createDataFrame(
        [
            ("https://tiki.vn/dien-thoai-may-tinh-bang/c1789", ["tiki_now", "freeship"]),
            ("https://tiki.vn/x", []),
            (None, None),
        ],
        "url: string, badges: array<string>",
    )
    out = df.select(
        extract_url_key(F.col("url")).alias("k"),
        has_tiki_now(F.col("badges")).alias("tn"),
    ).collect()
    assert (out[0]["k"], out[0]["tn"]) == ("dien-thoai-may-tinh-bang", True)
    assert (out[1]["k"], out[1]["tn"]) == (None, False)
    assert (out[2]["k"], out[2]["tn"]) == (None, False)


def test_hierarchy_helpers(spark):
    df = spark.createDataFrame(
        [(1815, 4593, 3), (1789, 1789, 1), (None, 42, None)],
        "root: long, leaf: long, depth: long",
    )
    out = df.select(
        build_full_path(F.col("root"), F.col("leaf")).alias("fp"),
        derive_parent_id(F.col("root"), F.col("depth")).alias("pid"),
        category_level(F.col("depth")).alias("lvl"),
    ).collect()
    assert (out[0]["fp"], out[0]["pid"], out[0]["lvl"]) == ("1815 > 4593", 1815, 3)
    assert (out[1]["fp"], out[1]["pid"], out[1]["lvl"]) == ("1789", None, 1)
    assert (out[2]["fp"], out[2]["pid"], out[2]["lvl"]) == ("42", None, 1)


def test_clean_review_count(spark):
    # Expected values generated by running the reference JS
    # (TikiCrawler/puppeteer/src/utils.js:210-229) verbatim under node —
    # including its bug-compatible quirks (leading-prefix parseInt,
    # letter-stripping char class, first-k-only removal).
    cases = [
        ("(1.234 đánh giá)", 1234),
        ("(1.5k đánh giá)", 1500),
        ("2.3K", 2300),
        ("(2.5K đánh giá)", 2500),
        ("(987)", 987),
        ("N/A", None),
        ("", None),
        (None, None),
        ("(12.345.678 đánh giá)", 12345678),
        ("(1,2k)", 1000),       # parseFloat("1,2") === 1
        ("(1,234 reviews)", 1),  # parseInt leading-prefix parse
        ("()", None),
        ("abc", None),
    ]
    assert run_scalar(spark, clean_review_count, [c[0] for c in cases]) == [c[1] for c in cases]


def test_extract_product_id(spark):
    # utils.js:236-255 goldens, node-generated.
    cases = [
        ("https://tiki.vn/dien-thoai-iphone/p123456.html?spid=789", "123456"),
        ("https://tiki.vn/cart?spid=789", "789"),
        ("https://example.com/product/555", "555"),
        ("98765", "98765"),
        ("https://tiki.vn/dien-thoai/c1789", None),
        ("", None),
        (None, None),
        ("/P42", "42"),
        ("spid=0042&x", "0042"),   # keeps leading zeros (string out)
        ("product/99?spid=11", "99"),  # leftmost match wins
        ("p123 no slash", None),
    ]
    assert run_scalar(spark, extract_product_id, [c[0] for c in cases]) == [c[1] for c in cases]


def test_clean_trends_score(spark):
    cases = [("<1", 0), ("55", 55), ("0", 0), (None, 0), ("abc", 0), ("12.0", 12)]
    assert run_scalar(spark, clean_trends_score, [c[0] for c in cases]) == [c[1] for c in cases]


def test_clean_rating(spark):
    cases = [("4.5", 4.5), ("0", 0.0), ("5", 5.0), ("5.1", None), ("-1", None), (None, None), ("bad", None)]
    assert run_scalar(spark, clean_rating, [c[0] for c in cases]) == [c[1] for c in cases]


def test_usd_price_and_signal(spark):
    df = spark.createDataFrame(
        [(25400000.0, 25400.0, "kw", 50), (25400000.0, None, None, None), (100.0, 25000.0, "kw", None)],
        "price: double, rate: double, kw: string, score: int",
    )
    out = df.select(
        usd_price(F.col("price"), F.col("rate")).alias("usd"),
        trend_signal_status(F.col("kw"), F.col("score")).alias("st"),
    ).collect()
    assert (out[0]["usd"], out[0]["st"]) == (1000.0, "Full Data")
    assert (out[1]["usd"], out[1]["st"]) == (1000.0, "Unmapped")
    assert out[2]["st"] == "No Trend Data"
