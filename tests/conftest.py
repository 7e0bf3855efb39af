import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searcharray_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("searcharray_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_index(tmp_path):
    return str(tmp_path / "index")
