import pytest

from spider_go_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spider-go-spark-tests", cores=8, shuffle_partitions=8)
    yield s
