import pytest
from pyspark.sql import SparkSession

from tiki_e_commerce_analytics_etl_spark.session import configure


@pytest.fixture(scope="session")
def spark():
    spark = (
        configure(SparkSession.builder.appName("tests").master("local[4]"))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()
