import datetime as dt

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import types as T


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("qctimeseries-tests")
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # one JVM serves the whole suite (~100 tests, thousands of
        # stages); the 1g default heap OOMs once accumulated broadcast
        # and state-store bookkeeping piles up
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


QC_SCHEMA = T.StructType(
    [
        T.StructField("DateTime", T.TimestampType()),
        T.StructField("temp", T.DoubleType()),
        T.StructField("hum", T.DoubleType()),
        T.StructField("block", T.IntegerType()),
        T.StructField("treatment", T.StringType()),
    ]
)


@pytest.fixture(scope="session")
def multivar(spark):
    """FIXTURES.md §D shape: hourly multivariable table with NAs."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        temp = None if i % 17 == 0 else 20.0 + (i % 7) - 3
        hum = None if i % 23 == 0 else 50.0 + (i % 11)
        rows.append(
            (t0 + dt.timedelta(hours=i), temp, hum, i % 3, "C.N" if i % 2 else "N.P")
        )
    return spark.createDataFrame(rows, QC_SCHEMA)
