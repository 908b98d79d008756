import pytest
from pyspark.sql import SparkSession

from pr2_transformation_spark.streaming.protoshim import prepare_env


@pytest.fixture(scope="session")
def spark():
    # before the JVM starts: PYTHONPATH must carry the miniproto shim so
    # the TWS driver worker (which inherits only the JVM env) imports
    # google.protobuf where the real package is absent
    prepare_env()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pr2-transformation-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
