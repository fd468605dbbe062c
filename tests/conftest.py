import os

import pytest
from pyspark.sql import SparkSession

_SLOW_TIER = os.path.join(os.path.dirname(__file__), "slow_tier.txt")


def pytest_collection_modifyitems(config, items):
    """Attach the slow marker to the nightly tier (tests/slow_tier.txt
    + module-level pytestmark in the streaming e2e files). The default
    run excludes them via pytest.ini addopts; run the tier with
    ``pytest tests/ -m slow`` (see slow_tier.txt header)."""
    with open(_SLOW_TIER) as fh:
        patterns = [
            ln.strip()
            for ln in fh
            if ln.strip() and not ln.startswith("#")
        ]
    for item in items:
        if any(p in item.nodeid for p in patterns):
            item.add_marker(pytest.mark.slow)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
#: override to shake out partitioning-sensitive nondeterminism (tie-break
#: bugs surface under different partition counts)
SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("mysql-syncer-spark-tests")
        .config("spark.sql.shuffle.partitions", SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")
