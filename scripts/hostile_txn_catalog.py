"""Hostile-scenario sweep for the TRANSACTION/CATALOG layer — the last
operator family without a crafted sweep after r12's manifest/DML and
sampling sweeps. Reference semantics under test
(src/storage/mpp_transaction.cpp, test/sql/mpp_transaction.test):
DDL-atomic coordinator transactions — BEGIN; CREATE; ROLLBACK leaves no
table; DROP rolls back to a fully-restored table (data files were never
deleted); nested BEGIN is rejected with DuckDB's TransactionContext
error text; COMMIT is permanent.

Crafted scenarios beyond the unit tests: create+insert+drop of the SAME
name inside one txn (tombstone resurrection must not leak), rollback
cleanup of the intra-txn SELECT's temp view (no silently-queryable
stale view), colocated-flavor restore, a failed statement mid-txn not
corrupting the journal, and the SQL front door's BEGIN/COMMIT/ROLLBACK
routing including the ABORT alias.

Prints one JSON line with per-case verdicts; exit code 1 on any fail.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _hostile_common import Harness  # noqa: E402

_h = Harness("transaction/catalog hostile scenarios")
case = _h.case


def _mpp(spark):
    from duckdb_mpp_spark.mpp import MppSession

    return MppSession(spark, tempfile.mkdtemp(prefix="hostile_txn_"))


def _mk(mpp, name="t", rows=8):
    tbl = mpp.create_distributed_table(name, "k int, v string", "k", 4)
    tbl.insert(mpp.spark.createDataFrame(
        [(i, f"a{i}") for i in range(rows)], "k int, v string"))
    return tbl


@case("rollback_create_insert_removes_table_and_files")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("BEGIN")
    tbl = _mk(mpp)
    path = tbl.path
    assert os.path.isdir(path)
    mpp.sql("ROLLBACK")
    try:
        mpp.catalog.get("t")
        raise AssertionError("rolled-back CREATE left a catalog entry")
    except ValueError:
        pass
    assert not os.path.isdir(path), "rolled-back table's files remain"
    # the name is immediately reusable and starts EMPTY
    t2 = mpp.create_distributed_table("t", "k int, v string", "k", 2)
    assert t2.scan().count() == 0


@case("rollback_drop_restores_table_with_data")
def _(spark):
    mpp = _mpp(spark)
    _mk(mpp, rows=12)
    mpp.sql("BEGIN")
    mpp.sql("DROP TABLE t")
    try:
        mpp.catalog.get("t")
        raise AssertionError("DROP not visible inside the txn")
    except ValueError:
        pass
    mpp.sql("ROLLBACK")
    tbl = mpp.table("t")
    assert tbl.scan().count() == 12, "restored table lost rows"
    # and the restored table accepts further DML
    tbl.insert(spark.createDataFrame([(99, "z")], "k int, v string"))
    assert tbl.scan().count() == 13


@case("create_then_drop_same_name_in_one_txn_fully_undone")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("BEGIN")
    tbl = _mk(mpp)
    path = tbl.path
    mpp.sql("DROP TABLE t")
    mpp.sql("ROLLBACK")
    # neither a live entry NOR a tombstone may survive: the create is
    # fully undone, not resurrected-then-left
    try:
        mpp.catalog.get("t")
        raise AssertionError("create+drop+rollback left a live entry")
    except ValueError:
        pass
    try:
        mpp.catalog.restore_table("t")
        raise AssertionError("create+drop+rollback left a tombstone")
    except ValueError:
        pass
    assert not os.path.isdir(path)


@case("nested_begin_rejected_journal_intact")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("BEGIN")
    _mk(mpp)
    try:
        mpp.sql("BEGIN")
        raise AssertionError("nested BEGIN accepted")
    except RuntimeError as e:
        assert "cannot start a transaction within a transaction" in str(e)
    # the outer journal survived the rejected BEGIN: rollback still
    # undoes the create
    mpp.sql("ROLLBACK")
    try:
        mpp.catalog.get("t")
        raise AssertionError("outer txn journal corrupted by nested BEGIN")
    except ValueError:
        pass


@case("commit_is_permanent_and_later_rollback_is_noop")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("BEGIN")
    _mk(mpp, rows=5)
    mpp.sql("COMMIT")
    mpp.sql("BEGIN")
    mpp.sql("ROLLBACK")  # empty txn
    assert mpp.table("t").scan().count() == 5


@case("failed_statement_mid_txn_does_not_corrupt_journal")
def _(spark):
    mpp = _mpp(spark)
    _mk(mpp, "pre", rows=3)
    mpp.sql("BEGIN")
    _mk(mpp, "t2")
    try:
        mpp.sql("DROP TABLE no_such_table")
        raise AssertionError("dropping a missing table did not raise")
    except ValueError:
        pass
    try:
        mpp.sql("ALTER TABLE t2 ADD COLUMN x INT")
        raise AssertionError("ALTER accepted")
    except NotImplementedError:
        pass
    mpp.sql("ROLLBACK")
    # t2's create rolled back despite the two failed statements; the
    # pre-existing table is untouched
    try:
        mpp.catalog.get("t2")
        raise AssertionError("journal corrupted: t2 survived rollback")
    except ValueError:
        pass
    assert mpp.table("pre").scan().count() == 3


@case("rollback_cleans_intra_txn_select_view")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("BEGIN")
    _mk(mpp)
    assert mpp.sql("SELECT * FROM t WHERE k = 1").count() == 1
    mpp.sql("ROLLBACK")
    # the rolled-back table must not stay silently queryable through the
    # temp view the intra-txn SELECT registered
    try:
        mpp.sql("SELECT * FROM t").collect()
        served = True
    except Exception:
        served = False
    assert not served, "rolled-back table still queryable via a stale view"


@case("rollback_drop_of_colocated_table_restores_registration")
def _(spark):
    mpp = _mpp(spark)
    tbl = mpp.create_distributed_table(
        "tc", "k int, v string", "k", 4, colocated=True
    )
    tbl.insert(spark.createDataFrame(
        [(i, f"c{i}") for i in range(6)], "k int, v string"))
    mpp.sql("BEGIN")
    mpp.sql("DROP TABLE tc")
    mpp.sql("ROLLBACK")
    assert mpp.table("tc").scan().count() == 6, (
        "colocated table not fully restored after rollback of DROP"
    )


@case("abort_alias_and_frontdoor_routing")
def _(spark):
    mpp = _mpp(spark)
    mpp.sql("begin transaction")
    _mk(mpp)
    mpp.sql("abort")  # ROLLBACK alias, case-insensitive
    try:
        mpp.catalog.get("t")
        raise AssertionError("ABORT did not roll back")
    except ValueError:
        pass
    # START TRANSACTION alias + trailing semicolon
    mpp.sql("START TRANSACTION;")
    _mk(mpp)
    mpp.sql("COMMIT;")
    assert mpp.table("t").scan().count() == 8


if __name__ == "__main__":
    _h.main(app_name="hostile-txn-catalog")
