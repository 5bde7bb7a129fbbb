"""Spark SQL entry path — the reference embeds its warehouse logic as
SQL strings (the Golden Join INSERT…SELECT, analytics_dag.py:71-160),
so a migrating user gets the same query as ANSI-ish Spark SQL over
registered temp views, not only as a DataFrame chain.

The statement is the Spark-dialect twin of the DataFrame plan in
plans/golden_join.py — Catalyst compiles both to the same physical
plan (broadcast joins over one fact scan); a test asserts result
equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

GOLDEN_JOIN_SQL = """
SELECT f.snapshot_date                AS date,
       CAST(f.product_id AS STRING)   AS product_id,
       p.name                         AS product_name,
       p.brand_name                   AS brand_name,
       c.category_name                AS category_name,
       f.current_price                AS price_vnd_real,
       f.original_price               AS price_vnd_original,
       f.discount_rate                AS discount_rate,
       e.rate                         AS fx_rate,
       FLOOR(f.current_price / COALESCE(e.rate, 25400.0) * 100 + 0.5) / 100
                                      AS price_usd_real,
       m.trend_keyword                AS trend_keyword,
       t.score                        AS trend_score,
       CASE WHEN m.trend_keyword IS NULL THEN 'Unmapped'
            WHEN t.score IS NULL        THEN 'No Trend Data'
            ELSE 'Full Data' END       AS trend_signal_status
FROM fact_daily_snapshot f
LEFT JOIN dim_products p  ON f.product_id = p.product_id
LEFT JOIN dim_categories c ON p.category_id = c.category_id
LEFT JOIN (SELECT * FROM dim_keyword_mapping WHERE is_active) m
       ON p.category_id = m.tiki_category_id
LEFT JOIN fact_google_trends t
       ON m.trend_keyword = t.keyword AND f.snapshot_date = t.date
LEFT JOIN (SELECT * FROM dim_exchange_rate
           WHERE from_currency = 'USD' AND to_currency = 'VND') e
       ON f.snapshot_date = e.date
"""


def golden_join_sql(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
    """Register the six input frames as temp views and run the SQL mart
    build.  ``inputs`` keys: fact, dim_products, dim_categories,
    keyword_mapping, trends, fx (same contract as plans.golden_join)."""
    views = {
        "fact_daily_snapshot": inputs["fact"],
        "dim_products": inputs["dim_products"],
        "dim_categories": inputs["dim_categories"],
        "dim_keyword_mapping": inputs["keyword_mapping"],
        "fact_google_trends": inputs["trends"],
        "dim_exchange_rate": inputs["fx"],
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return spark.sql(GOLDEN_JOIN_SQL)
