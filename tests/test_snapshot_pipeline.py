"""End-to-end test of the daily snapshot transform (SURVEY.md §3.1):
raw crawler JSON → cleaned fact/dim tables → partitioned parquet with
idempotent dynamic-partition overwrite.

Fixture rows follow FIXTURES.md §1: mixed-type price/discount/
quantity_sold, duplicate product_ids with differing _extracted_at
(keep-latest), null product_id/price rows (rejected), string-typed
DOM-fallback records.
"""

import json

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.io import write_partitioned
from tiki_e_commerce_analytics_etl_spark.plans.snapshot import (
    conform_dom_strings,
    read_raw,
    transform_snapshot,
)

RAW_ROWS = [
    # API-typed record, duplicated with an older extract (dedup: latest wins)
    {
        "product_id": 1001, "sku": "SKU1", "name": "Điện thoại iPhone 15",
        "product_url": "https://tiki.vn/iphone-15-p1001.html", "brand": "Apple",
        "price": "37250000", "original_price": "39990000", "discount_rate": "-7%",
        "rating": 4.8, "review_count": "120", "quantity_sold": "Đã bán 1.5k",
        "thumbnail_url": "http://img/1.jpg", "seller": "Tiki Trading", "seller_id": 1,
        "badges": ["tiki_now", "freeship"], "inventory_status": "available",
        "category_id": 1795, "category_name": "Điện thoại Smartphone",
        "root_category_id": 1789, "category_depth": 2,
        "category_path": "1789 > 1795",
        "_extracted_at": "2026-01-18T16:49:55.805Z", "_source_page": 1,
        "_category_url": "https://tiki.vn/dien-thoai-may-tinh-bang/c1789",
        "_category_name": "dien-thoai-may-tinh-bang", "_root_category_id": 1789,
    },
    {
        "product_id": 1001, "sku": "SKU1", "name": "Điện thoại iPhone 15 (old crawl)",
        "price": "36000000", "quantity_sold": "Đã bán 1.4k",
        "_extracted_at": "2026-01-18T09:00:00.000Z", "_source_page": 3,
        "category_id": 1795, "category_path": "1789 > 1795",
        "_category_url": "https://tiki.vn/dien-thoai-may-tinh-bang/c1789",
    },
    # DOM-fallback string-typed record; category only via URL
    {
        "product_id": 1002, "name": "Tai nghe Bluetooth",
        "price": "1.290.000 ₫", "original_price": "1.500.000 VND",
        "discount_rate": "-14%", "quantity_sold": "Đã bán 10.000",
        "_extracted_at": "2026-01-18T10:00:00.000Z",
        "_category_url": "https://tiki.vn/tai-nghe/c8318?page=2",
        "_category_name": "tai-nghe",
    },
    # Vietnamese million suffix + triệu, no badges
    {
        "product_id": 1003, "name": "Nồi chiên", "price": "2.500.000",
        "quantity_sold": "Đã bán 1.5 triệu", "rating": 4.2,
        "_extracted_at": "2026-01-18T11:00:00.000Z",
        "category_path": "1883 > 1951 > 4593",
    },
    # Rejected: null product_id
    {
        "name": "No id product", "price": "100000",
        "_extracted_at": "2026-01-18T12:00:00.000Z",
    },
    # Rejected: null price
    {
        "product_id": 1004, "name": "No price product",
        "_extracted_at": "2026-01-18T12:30:00.000Z",
    },
]


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_zone") / "snapshot_date=2026-01-18"
    d.mkdir(parents=True)
    (d / "page-001.json").write_text(json.dumps(RAW_ROWS[:3], ensure_ascii=False))
    (d / "page-002.json").write_text(json.dumps(RAW_ROWS[3:], ensure_ascii=False))
    return str(d.parent)


def test_snapshot_end_to_end(spark, raw_dir):
    raw = read_raw(spark, raw_dir + "/*")
    out = transform_snapshot(raw)
    fact = {r.product_id: r for r in out["fact_daily_snapshot"].collect()}

    # dedup kept the 16:49 crawl; null-id and null-price rows rejected
    assert set(fact) == {1001, 1002, 1003}
    f1 = fact[1001]
    assert f1.current_price == 37250000
    assert f1.original_price == 39990000
    assert f1.discount_rate == 7
    assert f1.sales_volume_acc == 1500
    assert f1.review_count == 120
    assert f1.tiki_now is True
    assert f1.inventory_status is True
    assert str(f1.snapshot_date) == "2026-01-18"

    f2 = fact[1002]
    assert f2.current_price == 1290000
    assert f2.original_price == 1500000
    assert f2.sales_volume_acc == 10000
    assert f2.tiki_now is False

    f3 = fact[1003]
    assert f3.sales_volume_acc == 1500000

    dim = {r.product_id: r for r in out["dim_products"].collect()}
    assert dim[1001].brand_name == "Apple"
    assert dim[1001].category_id == 1795
    assert dim[1002].category_id == 8318  # URL-fallback extraction
    assert dim[1003].category_id == 4593  # path-leaf fallback
    assert dim[1003].root_category_id == 1883
    assert dim[1003].category_depth == 3

    cats = {r.category_id: r for r in out["dim_categories"].collect()}
    assert set(cats) == {1795, 8318, 4593}
    assert cats[1795].category_level == 2
    assert cats[1795].parent_id == 1789
    assert cats[1795].full_path == "1789 > 1795"
    assert cats[8318].url_key == "tai-nghe"
    assert cats[4593].category_level == 3


def test_dom_string_records_end_to_end(spark):
    """The fully string-typed DOM-fallback batch (extractor.js:251-340
    shapes) flows through conform_dom_strings + transform_snapshot: ids
    recovered from URLs, k-suffix review counts cleaned, unparseable
    prices rejected, category derived from the path."""
    from tiki_e_commerce_analytics_etl_spark.plans.fixtures import raw_products_dom_fixture

    outs = transform_snapshot(conform_dom_strings(raw_products_dom_fixture(spark)))
    fact = {r.product_id: r for r in outs["fact_daily_snapshot"].collect()}
    assert set(fact) == {201, 202}  # 203's "Liên hệ" price → P4 reject
    assert fact[201].current_price == 1290000
    assert fact[201].review_count == 1200  # "(1.2k đánh giá)"
    assert fact[202].sales_volume_acc == 100
    assert fact[202].review_count == 87
    dims = {r.category_id: r for r in outs["dim_categories"].collect()}
    assert dims[8318].category_level == 3  # from "1815 > 8322 > 8318"
    assert dims[1883].category_level == 1  # URL-only fallback


def test_partition_overwrite_idempotent(spark, tmp_path):
    """K3/K7 — dynamic partition overwrite replaces only the written
    day; other partitions survive (the reference's partition-decorator
    truncate load, load_to_bq.py:159-199)."""
    path = str(tmp_path / "fact")
    day1 = spark.createDataFrame([(1, "2026-01-18", 10.0)], "id: long, d: string, v: double")
    day2 = spark.createDataFrame([(2, "2026-01-19", 20.0)], "id: long, d: string, v: double")
    write_partitioned(day1, path, ["d"])
    write_partitioned(day2, path, ["d"])
    assert spark.read.parquet(path).count() == 2  # day1 not clobbered

    day2_fixed = spark.createDataFrame([(3, "2026-01-19", 99.0)], "id: long, d: string, v: double")
    write_partitioned(day2_fixed, path, ["d"])
    # partition-column values come back type-inferred (date), so compare as str
    rows = {(r.id, str(r.d), r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "2026-01-18", 10.0), (3, "2026-01-19", 99.0)}
