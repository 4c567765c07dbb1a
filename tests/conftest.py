import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def make_spark(master: str = "local[4]", app: str = "sparkcrawl-tests",
               shuffle_partitions: int = 8) -> SparkSession:
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_TEST_DRIVER_MEM", "4g"))
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
