"""Round-8 same-round review findings: comment-blind keyword scanning in
the pruning guards (two confirmed wrong-results repros) and the sibling
sites that shared the pattern.

The r8 state machine fixed _cte_indirected's comma classifier, but
main_sel and every other guard still scanned RAW text with the
comment-blind _find_keyword_top_level / _blank_literals — a lone
apostrophe inside a ``--`` comment opened a fake literal swallowing real
keywords (UNION, FROM refs), re-enabling pruning in exactly the shapes
the guards exist to protect.
"""

import pytest

from duckdb_mpp_spark.mpp import _find_keyword_top_level
from tests.conftest import rows


def test_find_keyword_is_comment_aware():
    q = "SELECT k FROM t -- don't\nUNION ALL SELECT k FROM t WHERE x = 'y'"
    # pre-fix: the apostrophe in the comment opened a fake literal and
    # UNION was invisible
    assert _find_keyword_top_level(q, "UNION") > 0
    # keywords inside comments/literals must stay invisible
    assert _find_keyword_top_level("SELECT 'union all' FROM t", "UNION") == -1
    assert _find_keyword_top_level("/* union */ SELECT 1", "UNION") == -1
    assert _find_keyword_top_level("-- union\nSELECT 1", "UNION") == -1


def test_cte_indirected_survives_select_in_comment(mpp):
    mpp.sql("CREATE TABLE st8(k INT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO st8 VALUES(1),(2),(3)")
    q = (
        "WITH /* select */ x AS (SELECT k FROM st8) "
        "SELECT k FROM x WHERE k = 2 UNION ALL SELECT k FROM x"
    )
    # guard must stay engaged (pruning disabled on the CTE-fed source)
    assert mpp._cte_indirected(q, "st8") is True
    got = sorted(k for (k,) in rows(mpp.sql(q), "k"))
    assert got == [1, 2, 2, 3]


def test_setop_guard_survives_apostrophe_in_comment(mpp):
    mpp.sql("CREATE TABLE st9(k INT, v TEXT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO st9 VALUES(1,'y'),(2,'n'),(3,'y')")
    q = (
        "SELECT k FROM st9 WHERE k = 2 -- don't prune\n"
        "UNION ALL SELECT k FROM st9 WHERE v = 'y'"
    )
    got = sorted(k for (k,) in rows(mpp.sql(q), "k"))
    # pre-fix the comment's apostrophe hid the UNION, the k=2 restriction
    # pruned the SHARED scan, and leg 2 lost the k∈{1,3} rows
    assert got == [1, 2, 3]


def test_self_join_guard_survives_apostrophe_in_comment(mpp):
    mpp.sql("CREATE TABLE stt(k INT, v INT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO stt VALUES(1,2),(2,3),(3,1)")
    # two refs of stt with a comment between them: the literal blanker
    # mis-paired the apostrophe and erased the second FROM ref
    q = (
        "SELECT a.k FROM stt a -- it's a self-join\n"
        ", stt b WHERE a.k = 2 AND b.k = a.v"
    )
    assert mpp._self_joined(q, "stt") is True
    got = [k for (k,) in rows(mpp.sql(q), "k")]
    assert got == [2]


def test_version_as_of_in_comment_does_not_pin(mpp):
    mpp.sql("CREATE TABLE pinc(k INT) PARTITION BY(k) WITH BUCKETS 2")
    mpp.sql("INSERT INTO pinc VALUES(1)")
    mpp.sql("INSERT INTO pinc VALUES(2)")
    got = rows(
        mpp.sql("SELECT k FROM pinc -- VERSION AS OF 1\nORDER BY k"), "k"
    )
    assert [k for (k,) in got] == [1, 2]  # head, not the v1 snapshot


def test_returning_in_comment_is_not_rejected(mpp):
    mpp.sql("CREATE TABLE rc(k INT) PARTITION BY(k) WITH BUCKETS 2")
    assert mpp.sql("INSERT INTO rc VALUES(1),(2)") == 2
    # the statement-rejection scan must not see keywords inside comments
    got = rows(mpp.sql("SELECT k FROM rc -- not a RETURNING clause\nORDER BY k"), "k")
    assert [k for (k,) in got] == [1, 2]
    # ...while a REAL RETURNING clause still raises reference parity
    with pytest.raises(NotImplementedError, match="RETURNING"):
        mpp.sql("INSERT INTO rc VALUES(3) RETURNING k")


# --- dml: unique-check soundness and contract precision (review r8) ---------

def test_nondeterministic_assignment_to_unique_column_rejected(mpp):
    # re-derivation-based checking would validate a different rand() draw
    # than the one committed — rejected loudly instead of silently unsound
    import pytest as _pytest

    mpp.sql(
        "CREATE TABLE ndet(k INT UNIQUE, v TEXT) PARTITION BY(k) WITH BUCKETS 4"
    )
    mpp.sql("INSERT INTO ndet VALUES(1,'a'),(2,'b')")
    with _pytest.raises(ValueError, match="[Nn]ondeterministic"):
        mpp.sql("UPDATE ndet SET k = CAST(rand()*1000 AS INT) WHERE v = 'a'")
    # deterministic assignments keep working
    assert mpp.sql("UPDATE ndet SET k = 3 WHERE v = 'a'") == 1
    got = sorted(k for (k,) in rows(mpp.table("ndet").scan().select("k"), "k"))
    assert got == [2, 3]


def test_update_unique_still_rejects_created_duplicates(mpp):
    mpp.sql(
        "CREATE TABLE udup(k INT, u INT UNIQUE) PARTITION BY(k) WITH BUCKETS 4"
    )
    mpp.sql("INSERT INTO udup VALUES(1,10),(1,11),(2,20)")
    # bucket-local collision: two rows in k=1's bucket end at u=10
    with pytest.raises(ValueError, match="Duplicate key"):
        mpp.sql("UPDATE udup SET u = 10 WHERE u = 11")
    # two modified rows assigned the same value also abort
    with pytest.raises(ValueError, match="Duplicate key"):
        mpp.sql("UPDATE udup SET u = 99 WHERE k = 1")
    # non-colliding update still commits
    assert mpp.sql("UPDATE udup SET u = 12 WHERE u = 11") == 1


def test_update_survivor_only_bucket_duplicate_does_not_abort(mpp):
    """r8 contract extension: a pre-existing bucket-local duplicate whose
    rows are carried through the rewrite UNMODIFIED must not abort an
    unrelated UPDATE of a different unique column's row in the same
    bucket."""
    from duckdb_mpp_spark import dml

    # no constraint at load time → the on-disk duplicate (u=7,u=7) exists;
    # declare it via meta to exercise the DML check path directly
    mpp.sql("CREATE TABLE sdup(k INT, u INT, v TEXT) PARTITION BY(k) WITH BUCKETS 2")
    mpp.sql(
        "INSERT INTO sdup VALUES(1,7,'a'),(1,7,'b'),(1,5,'c'),(2,9,'d')"
    )
    t = mpp.table("sdup")
    t.meta.unique_columns = ["u"]
    # updates u of the v='c' row only; the (7,7) survivors share its bucket
    assert dml.update(t, {"u": "6"}, "v = 'c'") == 1
    got = sorted(u for (u,) in rows(t.scan().select("u"), "u"))
    assert got == [6, 7, 7, 9]
    # but touching one of the duplicates TO the duplicate value aborts
    with pytest.raises(ValueError, match="Duplicate key"):
        dml.update(t, {"u": "7"}, "v = 'c'")


def test_upsert_survivor_only_bucket_duplicate_does_not_abort(mpp):
    from duckdb_mpp_spark import dml

    # composite merge key (k, j) so an input row can land IN the
    # survivors' bucket (same k) without replacing them (different j) —
    # the unique contract is bucket-local, so only same-bucket collisions
    # count
    mpp.sql(
        "CREATE TABLE sdup2(k INT, j INT, u INT) PARTITION BY(k) WITH BUCKETS 2"
    )
    mpp.sql("INSERT INTO sdup2 VALUES(1,1,7),(1,2,7)")
    t = mpp.table("sdup2")
    t.meta.unique_columns = ["u"]
    spark = t.spark
    # lands in the (7,7) survivors' bucket with a fresh u — must commit
    n = dml.upsert(
        t, spark.createDataFrame([(1, 3, 5)], "k int, j int, u int"), ["k", "j"]
    )
    assert n == 1
    # while an inserted duplicate of a surviving value in the SAME bucket
    # still aborts
    with pytest.raises(ValueError, match="Duplicate key"):
        dml.upsert(
            t,
            spark.createDataFrame([(1, 4, 7)], "k int, j int, u int"),
            ["k", "j"],
        )
