import pytest

from yomitoku_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="yomitoku_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
