import os

import pytest

# Executor Python workers inherit the driver process env, not pytest's
# in-process sys.path — put the tests dir on PYTHONPATH BEFORE the JVM
# starts so module-level test functions (e.g. flow worker handlers passed
# through mapInPandas) resolve by reference on workers.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
if _TESTS_DIR not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _TESTS_DIR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _TESTS_DIR
    )

from spider_go_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spider-go-spark-tests", cores=8, shuffle_partitions=8)
    yield s
