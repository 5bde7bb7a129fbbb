"""S2 — Google Trends wide-CSV scan with smart date detection
(transform_google_trends.py:27-41): the date may arrive as a ``date``
column, under a different name as the first column (pandas index
export), or any casing; keyword columns are everything else except a
case-insensitive ``isPartial``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_trends_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the wide CSV and normalize the date column to ``date``
    (DateType).  Detection order mirrors the reference: exact/cased
    'date' column first, else the first column if it parses as dates.
    """
    df = spark.read.option("header", True).csv(path)
    date_col = next((c for c in df.columns if c.lower() == "date"), None)
    if date_col is None:
        date_col = df.columns[0]  # pandas index export: unnamed first col
    out = df.withColumnRenamed(date_col, "date") if date_col != "date" else df
    return out.withColumn("date", F.to_date("date"))
