"""Expression library: every reference scalar function (SURVEY.md §2.4)
as a native Column expression."""

from tiki_e_commerce_analytics_etl_spark.functions.parsing import (  # noqa: F401
    build_full_path,
    category_depth,
    category_leaf,
    category_level,
    category_root,
    clean_price,
    clean_rating,
    clean_review_count,
    clean_trends_score,
    coerce_double,
    coerce_long,
    derive_parent_id,
    extract_category_id,
    extract_product_id,
    extract_url_key,
    has_tiki_now,
    inventory_in_stock,
    parse_category_path,
    parse_discount_rate,
    parse_sales_volume,
    parse_snapshot_date,
    trend_signal_status,
    usd_price,
)
