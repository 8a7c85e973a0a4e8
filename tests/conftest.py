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
def shadow_views(spark):
    """Register crafted frames under FIXTURE table names, then restore.

    Teardown drops the temp views and invalidates register_views'
    idempotence key (`duckdb_mpp_spark.registered_sf_dir`) so the next
    gate query re-registers the real parquet tables. Without this, a
    shadowed `events` view leaks into every later run_spark_query in the
    session-scoped SparkSession — register_views sees the cached sf_dir
    and skips re-registration, so an unrelated gate test silently runs on
    the crafted frame (observed: r7b's NULL-events frame broke
    test_sketches' verdict assertions two files later).
    """
    shadowed = set()

    def shadow(name, df):
        df.createOrReplaceTempView(name)
        shadowed.add(name)

    yield shadow
    for name in shadowed:
        spark.catalog.dropTempView(name)
    if shadowed:
        try:
            spark.conf.unset("duckdb_mpp_spark.registered_sf_dir")
        except Exception:
            pass


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
