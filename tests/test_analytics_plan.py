"""Tests for the analytics mart orchestration (§3.3) and the trends
CSV source (S2)."""

import datetime

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators.quality import QualityCheckError
from tiki_e_commerce_analytics_etl_spark.plans.analytics import build_daily_mart
from tiki_e_commerce_analytics_etl_spark.sources.trends_csv import read_trends_csv


@pytest.fixture
def mart_inputs(spark):
    d = datetime.date(2026, 1, 18)
    fact = spark.createDataFrame(
        [(d, 1, 25400000, 26000000, 5), (d, 2, 100000, None, 0)],
        "snapshot_date: date, product_id: long, current_price: long, original_price: long, discount_rate: long",
    )
    dim_p = spark.createDataFrame(
        [(1, "iPhone", "Apple", 10), (2, "Cable", "NoBrand", 20)],
        "product_id: long, name: string, brand_name: string, category_id: long",
    )
    dim_c = spark.createDataFrame(
        [(10, "Phones"), (20, "Accessories")], "category_id: long, category_name: string"
    )
    mapping = spark.createDataFrame(
        [(10, "iphone", True), (20, "cable", False)],
        "tiki_category_id: long, trend_keyword: string, is_active: boolean",
    )
    trends = spark.createDataFrame(
        [(d, "iphone", 80)], "date: date, keyword: string, score: long"
    )
    fx = spark.createDataFrame(
        [(d, "USD", "VND", 25400.0)],
        "date: date, from_currency: string, to_currency: string, rate: double",
    )
    return fact, dim_p, dim_c, mapping, trends, fx


def test_build_daily_mart_writes_and_checks(spark, mart_inputs, tmp_path):
    out = str(tmp_path / "mart")
    mart, quality_row, summary_df = build_daily_mart(
        *mart_inputs, ds="2026-01-18", output_path=out
    )
    rows = {r.product_id: r for r in mart.collect()}
    assert rows["1"].trend_signal_status == "Full Data"
    assert rows["1"].price_usd_real == 1000.0
    assert rows["2"].trend_signal_status == "Unmapped"  # inactive mapping filtered
    s = summary_df.collect()[0]
    assert s.total_rows == 2 and s.full_data_rows == 1 and s.unmapped_rows == 1

    written = spark.read.parquet(out)
    assert written.count() == 2
    assert "inserted_at" in written.columns  # appended only at write time
    assert "inserted_at" not in mart.columns


def test_build_daily_mart_quality_gate_fails(spark, mart_inputs):
    fact, dim_p, dim_c, mapping, trends, fx = mart_inputs
    bad_fact = fact.withColumn("current_price", F.lit(-1).cast("long"))
    with pytest.raises(QualityCheckError):
        build_daily_mart(bad_fact, dim_p, dim_c, mapping, trends, fx, ds="2026-01-18")


def test_build_daily_mart_day_slice_only(spark, mart_inputs):
    fact, *rest = mart_inputs
    other_day = spark.createDataFrame(
        [(datetime.date(2026, 1, 17), 3, 5000, 5000, 0)], fact.schema
    )
    mart, _, _ = build_daily_mart(fact.union(other_day), *rest, ds="2026-01-18")
    assert {str(r.date) for r in mart.collect()} == {"2026-01-18"}


def test_read_trends_csv_date_column_variants(spark, tmp_path):
    p1 = tmp_path / "a.csv"
    p1.write_text("date,iphone,isPartial\n2026-01-01,55,false\n2026-01-02,<1,true\n")
    df1 = read_trends_csv(spark, str(p1))
    assert df1.columns[0] == "date"
    assert str(df1.collect()[0].date) == "2026-01-01"

    # pandas index export: unnamed/differently-named first column
    p2 = tmp_path / "b.csv"
    p2.write_text("Ngày,iphone,laptop\n2026-01-01,10,20\n")
    df2 = read_trends_csv(spark, str(p2))
    assert "date" in df2.columns
    assert str(df2.collect()[0].date) == "2026-01-01"
