"""Analytics mart orchestration — the Spark re-expression of the
``analytics_market_insight`` DAG (SURVEY.md §3.3): build the daily OBT
via the Golden Join, run the quality gate, write the day partition
idempotently, and emit the success summary.

The reference's DELETE+INSERT (analytics_dag.py:65-68) becomes one
dynamic-partition overwrite; the six ASSERTs (:172-240) run as a
single aggregation job over the just-built slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.io import write_partitioned
from tiki_e_commerce_analytics_etl_spark.operators.quality import (
    mart_checks,
    run_checks,
    summary,
)
from tiki_e_commerce_analytics_etl_spark.plans.golden_join import golden_join


def build_daily_mart(
    fact: DataFrame,
    dim_products: DataFrame,
    dim_categories: DataFrame,
    keyword_mapping: DataFrame,
    trends: DataFrame,
    fx: DataFrame,
    ds: str,
    output_path: str | None = None,
) -> tuple[DataFrame, Row, DataFrame]:
    """Returns (mart_slice, quality_row, summary_df); raises
    QualityCheckError on any failed check — ASSERT semantics, the run
    dies before a bad partition is visible downstream.

    The non-deterministic ``inserted_at`` (F19) is appended at write
    time only, keeping the deterministic core oracle-hashable
    (SURVEY.md §7.3).
    """
    mart = golden_join(
        fact, dim_products, dim_categories, keyword_mapping, trends, fx, ds=ds
    )
    mart = mart.cache()
    quality_row = run_checks(mart, mart_checks())
    if output_path is not None:
        write_partitioned(
            mart.withColumn("inserted_at", F.current_timestamp()),
            output_path,
            ["date"],
        )
    return mart, quality_row, summary(mart)
