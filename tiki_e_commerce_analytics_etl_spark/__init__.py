"""tiki_e_commerce_analytics_etl_spark — a PySpark-native analytics
engine with the query and data-processing capabilities of
MrSevennnn/Tiki-E-commerce-Analytics-ETL, re-expressed Spark-first.

Layout:
  session     — configured SparkSession factory (AQE, UTC, dynamic
                partition overwrite)
  schemas     — explicit StructTypes for every table
  functions   — the scalar expression library (SURVEY.md §2.4)
  io          — partitioned parquet read/write + schema conformance
  operators   — dedup, merge/upsert, reshape, quality, similarity,
                text analysis, multimodal plumbing
  plans       — end-to-end query plans (golden join, snapshot
                transform, trends, fx)
  sources     — driver-side ingest adapters (REST → DataFrame)
  streaming   — Structured Streaming wrappers for the incremental /
                late-data semantics
"""

__version__ = "0.1.0"
