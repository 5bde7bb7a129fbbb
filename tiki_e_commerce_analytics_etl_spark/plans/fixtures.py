"""Deterministic raw-product fixture exercising the snapshot pipeline's
edge cases end-to-end (FIXTURES.md; reference test_transform_logic.py's
iPhone fixture style, :212-241).

Covers: API-typed and DOM-string-typed records (clean_price F4 on
"1.290.000 ₫"), Vietnamese quantity grammar (F1), discount abs (F2),
category-path derivation vs fill-null-only precedence (F6/J8),
url_key + full_path + parent_id + level (F7/F9-F11), badges→tiki_now
(F8), keep-latest dedup on duplicate product_id (D1), and the P4
null-rejection arm (null product_id / null price rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tiki_e_commerce_analytics_etl_spark import schemas

# Columns in RAW_PRODUCT_SCHEMA order.
RAW_FIXTURE_ROWS = [
    # 101: API record, early crawl — superseded by the later one below (D1).
    (101, "SKU101", "iPhone 15", "iphone-15", "https://tiki.vn/iphone-15/p101",
     "Apple", "25000000", "27000000", "-7%", 4.8, "1200", "Đã bán 5k",
     "https://img/101.jpg", "TikiTrading", 1, None, 1, ["tiki_now", "freeship"],
     "available", 1789, "Điện thoại", None, None, "1815 > 1789",
     "2024-03-01T08:00:00Z", 1, "https://tiki.vn/dien-thoai-may-tinh-bang/c1789",
     "Điện thoại máy tính bảng", 1815),
    # 101 again: later crawl the dedup must keep (price changed).
    (101, "SKU101", "iPhone 15", "iphone-15", "https://tiki.vn/iphone-15/p101",
     "Apple", "24500000", "27000000", "-9%", 4.8, "1250", "Đã bán 5.5k",
     "https://img/101.jpg", "TikiTrading", 1, None, 1, ["tiki_now"],
     "available", 1789, "Điện thoại", None, None, "1815 > 1789",
     "2024-03-01T12:30:00Z", 3, "https://tiki.vn/dien-thoai-may-tinh-bang/c1789",
     "Điện thoại máy tính bảng", 1815),
    # 102: DOM-fallback record — string prices, suffixed volume, no
    # category_id anywhere except the 3-level path (F6 derives all).
    (102, None, "Tai nghe XYZ", "tai-nghe-xyz", "https://tiki.vn/tai-nghe-xyz/p102",
     "Sony", "1.290.000 ₫", "1.590.000 ₫", "-41%", 4.5, "890", "Đã bán 1.5k",
     "https://img/102.jpg", "ShopA", 22, "https://img/logo22.png", None, None,
     "available", None, None, None, None, "1815 > 8322 > 8318",
     "2024-03-01T09:15:00Z", 2, "https://tiki.vn/tai-nghe/c8318", "Tai nghe", None),
    # 103: minimal record — no path, category only via _category_url
    # (F3 fallback), no badges (tiki_now false), volume in triệu (F1).
    (103, "SKU103", "Nồi chiên", None, None, "Lock&Lock", "2500000", None,
     None, None, None, "Đã bán 1 triệu", None, "ShopB", 33, None, None, None,
     None, None, None, None, None, None,
     "2024-03-01T10:00:00Z", 1, "https://tiki.vn/nha-cua-doi-song/c1883",
     "Nhà cửa đời sống", 1883),
    # Null product_id → rejected (P4).
    (None, None, "Ghost", None, None, None, "100000", None, None, None, None,
     None, None, None, None, None, None, None, None, None, None, None, None,
     None, "2024-03-01T11:00:00Z", 1, None, None, None),
    # Null/unparseable price → rejected (P4).
    (104, None, "Freebie", None, None, None, "free", None, None, None, None,
     None, None, None, None, None, None, None, None, 42, None, None, None,
     None, "2024-03-01T11:00:00Z", 1, None, None, None),
]


def raw_products_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RAW_FIXTURE_ROWS, schemas.RAW_PRODUCT_SCHEMA)


# DOM-fallback records (extractor.js:251-340): every field is text
# scraped off the page — "1.290.000 ₫" prices, "-25%" badges,
# "Đã bán 1.5k" volumes, "(1.2k đánh giá)" review counts, ids as
# digit strings or only derivable from the product URL.
RAW_DOM_FIXTURE_ROWS = [
    # 201: complete DOM record, category only via the 3-level path.
    ("201", None, "Loa ABC", "loa-abc", "https://tiki.vn/loa-abc/p201.html?spid=99",
     "JBL", "1.290.000 ₫", "1.590.000 ₫", "-25%", "4.7", "(1.2k đánh giá)",
     "Đã bán 1.5k", None, "ShopX", "77", None, None, ["tiki_now"],
     "available", None, None, None, None, "1815 > 8322 > 8318",
     "2024-03-02T09:00:00Z", "1", "https://tiki.vn/tai-nghe/c8318",
     "Tai nghe", None),
    # 202: id missing from the data attribute — recovered from the URL
    # (extractProductId); rating unparseable; category via URL only.
    (None, None, "Chuột DEF", None, "https://tiki.vn/chuot-def/p202.html?spid=42",
     None, "2.000.000đ", None, None, "bad", "(87)", "Đã bán 100",
     None, "ShopY", "88", None, None, None,
     "available", None, None, None, None, None,
     "2024-03-02T10:00:00Z", "1", "https://tiki.vn/nha-cua-doi-song/c1883",
     "Nhà cửa đời sống", None),
    # 203: price the cleaner cannot parse → P4 rejection.
    ("203", None, "Liên hệ shop", None, None, None, "Liên hệ", None, None,
     None, None, None, None, None, None, None, None, None, None, None, None,
     None, None, None, "2024-03-02T11:00:00Z", "1", None, None, None),
]


def raw_products_dom_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RAW_DOM_FIXTURE_ROWS, schemas.RAW_PRODUCT_STRING_SCHEMA)
