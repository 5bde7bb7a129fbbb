"""The Spark SQL mart statement must produce exactly the DataFrame
plan's results (same rows, same values)."""

from tiki_e_commerce_analytics_etl_spark.plans import testdata_mapping as tdm
from tiki_e_commerce_analytics_etl_spark.plans.golden_join import golden_join
from tiki_e_commerce_analytics_etl_spark.plans.sql_surface import golden_join_sql

SF_DIR = "/root/testdata/sf0.001"


def test_sql_and_dataframe_golden_join_agree(spark):
    inputs = tdm.build_mart_inputs(spark, SF_DIR)
    df_plan = golden_join(
        inputs["fact"], inputs["dim_products"], inputs["dim_categories"],
        inputs["keyword_mapping"], inputs["trends"], inputs["fx"],
    )
    sql_plan = golden_join_sql(spark, inputs)
    assert sorted(df_plan.columns) == sorted(sql_plan.columns)
    key = lambda r: tuple(str(r[c]) for c in sorted(df_plan.columns))  # noqa: E731
    assert sorted(map(key, df_plan.collect())) == sorted(map(key, sql_plan.collect()))
