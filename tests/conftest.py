"""Shared Spark session fixture for pipeline tests."""

import pytest


@pytest.fixture(scope="session")
def spark():
    import os
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("orc-format-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "4g")
         .getOrCreate())
    yield s
    s.stop()
