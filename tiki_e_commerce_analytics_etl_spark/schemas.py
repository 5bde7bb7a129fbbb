"""Explicit StructType schemas for every table the engine touches.

The reference's hard-won lesson is "never infer" (explicit BigQuery
schema passed "to avoid type inference issues", reference
load_to_bq.py:365-380; PyArrow schemas pinned before every write,
transform_google_trends.py:178-185).  We declare everything.

Warehouse schemas mirror reference bigquery_schema.sql; the raw-product
schema mirrors the crawler record (api_crawler.js:275-316) with the
string-typed DOM-fallback variants in mind, so price/discount/
quantity_sold are StringType here and parsed by the expression library.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Raw zone: one crawled product (api_crawler.js:275-316).  Numeric-ish
# fields are strings because the DOM-scraper fallback emits "1.290.000 ₫",
# "-25%", "Đã bán 1.5k" (extractor.js:160-243); the parse layer owns the
# conversion.  badges is the only collection type in the system.
# --------------------------------------------------------------------------
RAW_PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("sku", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("url_key", T.StringType()),
        T.StructField("product_url", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("original_price", T.StringType()),
        T.StructField("discount_rate", T.StringType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("review_count", T.StringType()),
        T.StructField("quantity_sold", T.StringType()),
        T.StructField("thumbnail_url", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("seller_id", T.LongType()),
        T.StructField("seller_logo", T.StringType()),
        T.StructField("warehouse_id", T.LongType()),
        T.StructField("badges", T.ArrayType(T.StringType())),
        T.StructField("inventory_status", T.StringType()),
        T.StructField("category_id", T.LongType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("root_category_id", T.LongType()),
        T.StructField("category_depth", T.LongType()),
        T.StructField("category_path", T.StringType()),
        T.StructField("_extracted_at", T.StringType()),
        T.StructField("_source_page", T.LongType()),
        T.StructField("_category_url", T.StringType()),
        T.StructField("_category_name", T.StringType()),
        T.StructField("_root_category_id", T.LongType()),
    ]
)

# The DOM-fallback crawler (reference extractor.js:160-243 /
# extractFromHTML) emits every field as text scraped off the page —
# same column set, numeric fields string-typed.  conform_dom_strings
# (plans/snapshot.py) coerces this into RAW_PRODUCT_SCHEMA.
RAW_PRODUCT_STRING_SCHEMA = T.StructType(
    [
        T.StructField(
            f.name,
            T.StringType()
            if isinstance(f.dataType, (T.LongType, T.DoubleType))
            else f.dataType,
        )
        for f in RAW_PRODUCT_SCHEMA.fields
    ]
)

# --------------------------------------------------------------------------
# Warehouse tables (bigquery_schema.sql).
# --------------------------------------------------------------------------
FACT_DAILY_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_date", T.DateType()),
        T.StructField("product_id", T.LongType()),
        T.StructField("current_price", T.LongType()),
        T.StructField("original_price", T.LongType()),
        T.StructField("discount_rate", T.LongType()),
        T.StructField("sales_volume_acc", T.LongType()),
        T.StructField("review_count", T.LongType()),
        T.StructField("rating_average", T.DoubleType()),
        T.StructField("inventory_status", T.BooleanType()),
        T.StructField("tiki_now", T.BooleanType()),
        T.StructField("extracted_at", T.TimestampType()),
    ]
)

DIM_PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("sku", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("brand_name", T.StringType()),
        T.StructField("image_url", T.StringType()),
        T.StructField("product_url", T.StringType()),
        T.StructField("seller_id", T.LongType()),
        T.StructField("seller_name", T.StringType()),
        T.StructField("seller_logo", T.StringType()),
        T.StructField("category_id", T.LongType()),
        T.StructField("root_category_id", T.LongType()),
        T.StructField("category_depth", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

DIM_CATEGORIES_SCHEMA = T.StructType(
    [
        T.StructField("category_id", T.LongType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("category_level", T.LongType()),
        T.StructField("full_path", T.StringType()),
        T.StructField("url_key", T.StringType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("standard_category", T.StringType()),
    ]
)

DIM_KEYWORD_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("mapping_id", T.LongType()),
        T.StructField("tiki_category_id", T.LongType()),
        T.StructField("tiki_category_name", T.StringType()),
        T.StructField("trend_keyword", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

FACT_GOOGLE_TRENDS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("keyword", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("is_partial", T.BooleanType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

DIM_EXCHANGE_RATE_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("from_currency", T.StringType()),
        T.StructField("to_currency", T.StringType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("source", T.StringType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

# One-Big-Table mart (bigquery_schema.sql:91-112); product_id is STRING
# there by deliberate reference choice (analytics_dag.py:102).
ANALYTICS_MART_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("brand_name", T.StringType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("price_vnd_real", T.DoubleType()),
        T.StructField("price_vnd_original", T.DoubleType()),
        T.StructField("discount_rate", T.LongType()),
        T.StructField("fx_rate", T.DoubleType()),
        T.StructField("price_usd_real", T.DoubleType()),
        T.StructField("trend_keyword", T.StringType()),
        T.StructField("trend_score", T.LongType()),
        T.StructField("trend_signal_status", T.StringType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

TABLE_SCHEMAS = {
    "raw_products": RAW_PRODUCT_SCHEMA,
    "fact_daily_snapshot": FACT_DAILY_SNAPSHOT_SCHEMA,
    "dim_products": DIM_PRODUCTS_SCHEMA,
    "dim_categories": DIM_CATEGORIES_SCHEMA,
    "dim_keyword_mapping": DIM_KEYWORD_MAPPING_SCHEMA,
    "fact_google_trends": FACT_GOOGLE_TRENDS_SCHEMA,
    "dim_exchange_rate": DIM_EXCHANGE_RATE_SCHEMA,
    "analytics_product_market_daily": ANALYTICS_MART_SCHEMA,
}

# Driver-supplied synthetic test tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
