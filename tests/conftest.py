import shutil
import tempfile

import pytest

from duckdb_mpp_spark.mpp import MppSession
from duckdb_mpp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mpp-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def mpp(spark):
    wh = tempfile.mkdtemp(prefix="mpp_wh_")
    yield MppSession(spark, wh)
    shutil.rmtree(wh, ignore_errors=True)


def rows(df, *order_cols):
    """Collect to plain tuples, optionally ordered (sqllogictest style)."""
    if order_cols:
        df = df.orderBy(*order_cols)
    return [tuple(r) for r in df.collect()]
