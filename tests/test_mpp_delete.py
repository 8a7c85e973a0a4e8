"""Port of test/sql/mpp_delete.test — copy-on-write DELETE parity."""

import datetime

import pytest

from tests.conftest import rows


@pytest.fixture()
def session(mpp):
    mpp.sql(
        "CREATE TABLE test_delete(create_date DATE, name TEXT) "
        "PARTITION BY(create_date) WITH BUCKETS 6"
    )
    return mpp


def d(s):
    return datetime.date.fromisoformat(s)


INSERT = (
    "INSERT INTO test_delete VALUES('2025-01-01', 'alex'), ('2025-01-02', 'jack'), "
    "('2025-01-03', 'jason'), ('2025-01-04', 'tom')"
)


def test_delete_flow(session):
    # delete on empty table (test/sql/mpp_delete.test:38-39)
    assert session.sql("DELETE FROM test_delete") == 0

    # insert + delete-all (:41-47)
    session.sql(INSERT)
    assert session.sql("DELETE FROM test_delete") == 4
    assert rows(session.sql("SELECT count(1) AS n FROM test_delete")) == [(0,)]

    # re-insert (:49-58)
    session.sql(INSERT)

    # WHERE on non-partition column (:60-67)
    assert session.sql("DELETE FROM test_delete WHERE name='alex'") == 1
    got = rows(session.sql("SELECT create_date, name FROM test_delete ORDER BY create_date"))
    assert got == [(d("2025-01-02"), "jack"), (d("2025-01-03"), "jason"), (d("2025-01-04"), "tom")]

    # `=` on partition column — pruned (:69-75)
    assert session.sql("DELETE FROM test_delete WHERE create_date='2025-01-03'") == 1
    got = rows(session.sql("SELECT create_date, name FROM test_delete ORDER BY create_date"))
    assert got == [(d("2025-01-02"), "jack"), (d("2025-01-04"), "tom")]

    # range (:77-82)
    assert (
        session.sql(
            "DELETE FROM test_delete WHERE create_date>'2025-01-01' and create_date<'2025-01-04'"
        )
        == 1
    )
    got = rows(session.sql("SELECT create_date, name FROM test_delete ORDER BY create_date"))
    assert got == [(d("2025-01-04"), "tom")]

    # expression filter (:84-93)
    assert session.sql("DELETE FROM test_delete WHERE upper(name)='TOM'") == 1
    assert rows(session.sql("SELECT count(1) AS n FROM test_delete")) == [(0,)]
