import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    session = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("tcs-tests")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/tcs_test_warehouse")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def assert_df_equal(df1, df2):
    """Order-insensitive DataFrame equality on collected rows."""
    rows1 = sorted([tuple(r) for r in df1.collect()])
    rows2 = sorted([tuple(r) for r in df2.collect()])
    assert df1.columns == df2.columns, f"{df1.columns} != {df2.columns}"
    assert rows1 == rows2, f"\n{rows1[:10]}\n!=\n{rows2[:10]}"
