import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler_spark_tests", cores=os.environ.get("SPARK_TEST_CPUS", "8"))
    yield s
    s.stop()
