import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tric_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tric-spark-tests", cores=8, shuffle_partitions=8)
    yield s


def edges_df(spark, pairs):
    """Canonical-form edge DataFrame from a list of (u, v) pairs."""
    rows = [(int(u), int(v)) for u, v in pairs]
    return spark.createDataFrame(rows, "src long, dst long")
