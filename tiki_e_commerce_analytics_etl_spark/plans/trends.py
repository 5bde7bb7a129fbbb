"""Google Trends pipeline (SURVEY.md §3.2): wide CSV → melt → '<1'
cleanup → casts → group-max dedup → (date, keyword) upsert.

Mirrors reference transform_google_trends.py:13-201 +
trends_dag.py:652-677 as one plan: a Generate (unpivot) node feeding a
hash aggregate — one shuffle on (date, keyword).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.functions import clean_trends_score
from tiki_e_commerce_analytics_etl_spark.operators.merge import merge_source_wins
from tiki_e_commerce_analytics_etl_spark.operators.reshape import melt_trends_wide


def transform_trends(wide: DataFrame) -> DataFrame:
    """Wide (date, kw…, isPartial) → long (date, keyword, score,
    is_partial), deduped by group-max (A1,
    transform_google_trends.py:130-154: max resolves '0 vs real score'
    conflicts across fetch batches)."""
    long_df = melt_trends_wide(wide)
    cleaned = long_df.select(
        F.to_date("date").alias("date"),
        F.col("keyword"),
        clean_trends_score("score_raw").alias("score"),
        F.col("is_partial"),
    )
    return (
        cleaned.groupBy("date", "keyword")
        .agg(
            F.max("score").alias("score"),
            F.max("is_partial").alias("is_partial"),
        )
    )


def upsert_trends(target: DataFrame, source: DataFrame) -> DataFrame:
    """K6 — MERGE ON (date, keyword), source wins: Google may revise
    historical scores inside the rolling 30-day refetch window
    (trends_dag.py:16-21, 652-677)."""
    return merge_source_wins(target, source, ["date", "keyword"])
