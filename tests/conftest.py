import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inferdf_rs_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small parallelism for fast test startup/shuffles
    s = get_spark(app_name="inferdf_tests", master="local[4]", shuffle_partitions=4)
    yield s
