"""Port of test/sql/mpp_transaction.test — DDL atomicity.

The reference supports rollback of coordinator-local DDL only; remote shard
DML is never transactional (SURVEY §2.A17). We match that scope exactly.
"""


def test_rollback_create(mpp):
    # BEGIN; CREATE; ROLLBACK → table gone (test/sql/mpp_transaction.test:14-24)
    mpp.sql("BEGIN")
    mpp.sql("CREATE TABLE t0(c0 INT) PARTITION BY (c0) WITH BUCKETS 4")
    assert mpp.catalog.exists("t0")
    mpp.sql("ROLLBACK")
    assert not mpp.catalog.exists("t0")
    # no tombstone either — rollback is not a DROP
    assert mpp.catalog.tables_df(mpp.spark).count() == 0


def test_commit_create(mpp):
    mpp.sql("BEGIN")
    mpp.sql("CREATE TABLE t1(c0 INT) PARTITION BY (c0) WITH BUCKETS 4")
    mpp.sql("COMMIT")
    assert mpp.catalog.exists("t1")


def test_rollback_outside_txn_is_noop(mpp):
    mpp.sql("CREATE TABLE t2(c0 INT) PARTITION BY (c0) WITH BUCKETS 4")
    mpp.sql("ROLLBACK")
    assert mpp.catalog.exists("t2")
