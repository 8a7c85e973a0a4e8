"""Regression tests for the five ADVICE-r6 findings fixed in round 7.

1. sources/tables.py — pyarrow-less nanosecond detection degrades gracefully
   unless nanosAsLong is already active session-wide.
2. colocated.py — ``ident`` really sanitizes the user-supplied name.
3. mpp.py — ``_cte_indirected``'s comma alternative no longer flags a
   SELECT-list column that shares the table's name (perf-only, but now the
   safe direction is tested both ways).
4. dml.py — ``_check_unique_staged``'s value-global path only rejects
   duplicate groups the staged rewrite participates in.
5. table.py — ``snapshot_full(version=0)`` serves the pin explicitly instead
   of silently un-pinning to a head read.
"""

import pytest

from duckdb_mpp_spark import manifest
from duckdb_mpp_spark.mpp import MppSession, _comma_in_from_list
from duckdb_mpp_spark.sources.tables import _nanos_timestamp_cols
from tests.conftest import rows


# --- 1. nanos detection without pyarrow ------------------------------------

def test_nanos_detection_unreadable_path_degrades_without_conf():
    # detection failure (here: path that pyarrow cannot read) only matters
    # when nanosAsLong is active — otherwise Spark itself refuses ns files
    assert _nanos_timestamp_cols("/nonexistent/x.parquet") == []


def test_nanos_detection_unreadable_path_raises_with_conf():
    with pytest.raises(RuntimeError, match="nanosAsLong"):
        _nanos_timestamp_cols("/nonexistent/x.parquet", nanos_conf_set=True)


# --- 2. colocated ident sanitization ---------------------------------------

def test_colocated_ident_is_sanitized(mpp):
    # odd names are reachable via the python API (the SQL front door only
    # parses bare identifiers)
    t = mpp.create_distributed_table(
        "weird name-t!",
        "k INT, v TEXT",
        partition_column="k",
        buckets=4,
        colocated=True,
    )
    ident = t.ident
    assert all(c.isalnum() or c == "_" for c in ident), ident
    t.ensure_registered()  # must be a valid (quoted or not) identifier
    t.insert(t.spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    got = rows(t.scan(), "k")
    assert got == [(1, "a"), (2, "b")]


# --- 3. comma alternative in _cte_indirected -------------------------------

@pytest.mark.parametrize(
    "blank, needle, expected",
    [
        # relation list: FROM tv, st
        ("SELECT a FROM tv, st WHERE x=1", ", st", True),
        # select list: SELECT a, st FROM q (st is a COLUMN here)
        ("SELECT a, st FROM q", ", st", False),
        # subquery-derived relation then comma relation
        ("SELECT * FROM (SELECT 1 AS a FROM q) z, st", ", st", True),
        # select-list comma after a scalar subquery
        ("SELECT (SELECT max(k) FROM t2), st FROM q", ", st", False),
        # ambiguous (inside IN-list parens) stays flagged
        ("SELECT a FROM q WHERE k IN (1, st)", ", st", True),
    ],
)
def test_comma_in_from_list(blank, needle, expected):
    pos = blank.index(needle)
    assert _comma_in_from_list(blank, pos) is expected


def test_cte_indirection_not_flagged_for_select_list_column(mpp):
    mpp.sql("CREATE TABLE st(k INT, v TEXT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO st VALUES(1,'a'),(2,'b'),(3,'c')")
    ses = mpp
    # `, st` inside the CTE is a select-list COLUMN of q, not a relation
    # reference of table st — pruning must stay enabled (perf-only assert:
    # the query is still correct either way; we check the classifier)
    q = "WITH c AS (SELECT k AS a, v AS st FROM st) SELECT a FROM c WHERE a = 2"
    assert ses._cte_indirected(q, "st") is True  # real FROM st ref inside CTE
    q2 = (
        "WITH c AS (SELECT k AS a, st FROM q) "
        "SELECT a FROM c WHERE a = 2 UNION ALL SELECT a FROM c"
    )
    assert ses._cte_indirected(q2, "st") is False
    # and a genuine comma relation ref still disables pruning
    q3 = (
        "WITH c AS (SELECT q.k AS a FROM q, st) "
        "SELECT a FROM c WHERE a = 2"
    )
    assert ses._cte_indirected(q3, "st") is True


def test_cte_indirected_set_op_still_correct(mpp):
    # end-to-end guard for the original ADVICE-r5 repro shape
    mpp.sql("CREATE TABLE st2(k INT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO st2 VALUES(1),(2),(3)")
    got = rows(
        mpp.sql(
            "WITH x AS (SELECT k FROM st2) "
            "SELECT k FROM x WHERE k=2 UNION ALL SELECT k FROM x"
        ),
        "k",
    )
    assert [k for (k,) in got] == [1, 2, 2, 3]


# --- 4. staged-unique global path ignores untouched-bucket duplicates ------

def test_update_unaffected_by_preexisting_duplicate_elsewhere(mpp):
    from duckdb_mpp_spark import dml

    # no declared constraint at insert time, so the on-disk duplicate (7,7)
    # can exist; then exercise the value-global check directly the way a
    # partition-column UPDATE would: modified = the operation's new values,
    # others = every other post-commit row's value
    mpp.sql("CREATE TABLE gdup(k INT, v TEXT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO gdup VALUES(1,'a'),(7,'x'),(7,'y'),(9,'z')")
    t = mpp.table("gdup")
    spark = t.spark
    full = t.scan()
    # UPDATE SET k=2 WHERE k=1: the untouched (7,7) pair must not abort
    dml._check_unique_global(
        t, "k",
        modified=spark.createDataFrame([(2,)], "k int"),
        others=full.where("k <> 1").select("k"),
    )
    # and a modified value colliding with an untouched row still raises
    with pytest.raises(ValueError, match="Duplicate key"):
        dml._check_unique_global(
            t, "k",
            modified=spark.createDataFrame([(9,)], "k int"),
            others=full.where("k <> 1").select("k"),
        )


def test_update_unaffected_by_survivor_duplicate_in_rewritten_bucket(mpp):
    """ADVICE r7: a pre-existing duplicate whose copies are CARRIED THROUGH
    a rewritten bucket as unmodified survivors must not abort an unrelated
    UPDATE — only duplicate groups the operation's own new values
    participate in may raise."""
    from duckdb_mpp_spark import dml

    mpp.sql("CREATE TABLE gdup2(k INT, v TEXT) PARTITION BY(k) WITH BUCKETS 4")
    mpp.sql("INSERT INTO gdup2 VALUES(1,'a'),(7,'x'),(7,'y')")
    t = mpp.table("gdup2")
    spark = t.spark
    full = t.scan()
    # UPDATE SET k=2 WHERE v='a': both 7s are survivors (others side), the
    # only modified value is 2 — no abort even though the 7s share the
    # rewritten layout in the real staged files
    dml._check_unique_global(
        t, "k",
        modified=spark.createDataFrame([(2,)], "k int"),
        others=full.where("v <> 'a'").select("k"),
    )
    # two rows modified TO the same value: the operation creates the
    # duplicate itself — must raise
    with pytest.raises(ValueError, match="Duplicate key"):
        dml._check_unique_global(
            t, "k",
            modified=spark.createDataFrame([(2,), (2,)], "k int"),
            others=full.where("v = 'never'").select("k"),
        )


# --- 5. version=0 pin ------------------------------------------------------

def test_snapshot_full_version_zero_empty_table(mpp):
    mpp.sql("CREATE TABLE pin0(k INT) PARTITION BY(k) WITH BUCKETS 2")
    t = mpp.table("pin0")
    # internal DML pin: serve the empty v0 explicitly
    v, files, dirty = t.snapshot_full(version=0, pinned=True)
    assert (v, files, dirty) == (0, {}, [])
    # user time travel to v0: a clear error, never a silent empty frame
    # (review r7 — the pin branch must not capture VERSION AS OF 0)
    with pytest.raises(ValueError, match="no snapshot v0"):
        t.snapshot_full(version=0)


def test_snapshot_full_version_zero_after_commit_conflicts(mpp):
    mpp.sql("CREATE TABLE pin1(k INT) PARTITION BY(k) WITH BUCKETS 2")
    mpp.sql("INSERT INTO pin1 VALUES(1),(2)")
    t = mpp.table("pin1")
    assert t.snapshot_full()[0] >= 1
    # a stale internal pin fails like a lost commit race …
    with pytest.raises(manifest.CommitConflict):
        t.snapshot_full(version=0, pinned=True)
    # … but USER time travel keeps the time-travel error type (review r7:
    # CommitConflict is what retry/abort logic is written against)
    with pytest.raises(ValueError, match="no snapshot v0"):
        t.snapshot_full(version=0)


# --- r7: commit-embedded streaming batch ids -------------------------------

def test_stream_batch_rides_in_commit_and_inherits(mpp):
    from pyspark.sql import functions as F

    mpp.sql("CREATE TABLE sb(k INT, v TEXT) PARTITION BY(k) WITH BUCKETS 4")
    t = mpp.table("sb")
    spark = t.spark
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert t.applied_stream_batch("L") is None
    t.insert(df, stream_batch=("L", 0))
    assert t.applied_stream_batch("L") == 0
    # interleaved batch DML must INHERIT the replay record, not erase it
    mpp.sql("UPDATE sb SET v='z' WHERE k=1")
    assert t.applied_stream_batch("L") == 0
    # a second lineage coexists
    t.insert(spark.createDataFrame([(3, "c")], "k int, v string"),
             stream_batch=("M", 5))
    assert t.applied_stream_batch("L") == 0
    assert t.applied_stream_batch("M") == 5
    t.insert(spark.createDataFrame([(4, "d")], "k int, v string"),
             stream_batch=("L", 1))
    assert t.applied_stream_batch("L") == 1
    # upsert path records too
    from duckdb_mpp_spark import dml

    dml.upsert(
        t, spark.createDataFrame([(1, "up")], "k int, v string"), ["k"],
        stream_batch=("L", 2),
    )
    assert t.applied_stream_batch("L") == 2
    got = rows(t.scan(), "k")
    assert [r[0] for r in got] == [1, 2, 3, 4]
    assert got[0][1] == "up"


def test_stream_batch_replay_guard_semantics(mpp):
    """The sink-side guard: a re-delivered id <= applied must be skippable
    with no double-append, exactly the foreachBatch closure's check."""
    mpp.sql("CREATE TABLE sb2(k INT) PARTITION BY(k) WITH BUCKETS 2")
    t = mpp.table("sb2")
    spark = t.spark
    lineage = "ckpt/offsets"

    def deliver(batch_id, values):
        applied = t.applied_stream_batch(lineage)
        if applied is not None and batch_id <= applied:
            return False
        t.insert(spark.createDataFrame([(v,) for v in values], "k int"),
                 stream_batch=(lineage, batch_id))
        return True

    assert deliver(0, [1, 2]) is True
    assert deliver(0, [1, 2]) is False   # replay after successful commit
    assert deliver(1, [3]) is True
    assert deliver(0, [1, 2]) is False   # late replay of an old id
    assert [r[0] for r in rows(t.scan(), "k")] == [1, 2, 3]
