"""Versioned snapshot manifest (manifest.py) — the commit protocol behind
every table write and the persisted footer stats behind zone-map skipping,
rowid offsets, and bucket stats.

Contract: the committed snapshot is the source of truth for which data
files are live. Writers stage immutable files then publish a new snapshot
via conditional-put; readers plan from the snapshot only, so unreferenced
garbage on disk must never affect results. Scans must be identical whether
the commit log is fresh or bootstrap-rebuilt.
"""

import datetime
import json
import os

import pytest

from duckdb_mpp_spark import manifest
from duckdb_mpp_spark.table import BUCKET_COL
from tests.conftest import rows


@pytest.fixture()
def sorted_table(spark, mpp):
    tbl = mpp.create_distributed_table(
        "mf", "k INT, v INT, grp INT", "grp", 4, sort_column="v"
    )
    df = spark.range(300).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id AS INT) AS v", "CAST(id % 17 AS INT) AS grp"
    )
    for lo in (0, 100, 200):
        tbl.insert(df.where(f"v >= {lo} AND v < {lo + 100}"))
    return tbl


def test_insert_commits_snapshot(sorted_table):
    version, files = sorted_table.snapshot()
    # 3 inserts = 3 commits; 3 × 4 buckets of files, every entry carries
    # rows + sort-col min/max
    assert version == 3
    assert len(files) == 12
    for ent in files.values():
        assert ent["rows"] > 0
        assert ent["min"] is not None and ent["max"] is not None


def test_scan_plans_from_snapshot_not_listing(sorted_table, spark):
    """Garbage files on disk (crashed writer, pre-vacuum COW leftovers)
    must be invisible: readers plan from the snapshot's file list."""
    src = next(iter(sorted_table.snapshot_files()))
    orphan = os.path.join(sorted_table.path, src.split("/", 1)[0], "c0rphan-x.parquet")
    import shutil

    shutil.copyfile(os.path.join(sorted_table.path, src), orphan)
    assert sorted_table.scan().count() == 300  # duplicate file not double-read
    assert sorted_table.vacuum() == 1  # ...and vacuum removes exactly it
    assert not os.path.exists(orphan)


def test_commit_conflict_on_stale_base(sorted_table):
    base, files = sorted_table.snapshot()
    manifest.commit(sorted_table.path, files, base)
    with pytest.raises(manifest.CommitConflict):
        manifest.commit(sorted_table.path, files, base)


def test_bootstrap_from_data_files(sorted_table):
    """A table whose commit log vanished (or was never written — external
    tooling) bootstraps v1 from the directory listing, once."""
    import shutil

    shutil.rmtree(os.path.join(sorted_table.path, manifest.COMMITS_DIR))
    got = rows(sorted_table.scan(where="v >= 150 AND v < 153"), "k")
    assert [r[1] for r in got] == [150, 151, 152]
    version, files = sorted_table.snapshot()
    assert version == 1 and len(files) == 12


def test_corrupt_head_falls_back(sorted_table):
    """A torn head commit (only writable by non-`commit` tooling) must not
    take down reads — the previous version wins."""
    head = manifest.current_version(sorted_table.path)
    with open(manifest._version_file(sorted_table.path, head), "w") as f:
        f.write("{not json")
    got = rows(sorted_table.scan(where="v >= 10 AND v < 12"), "k")
    assert [r[1] for r in got] == [10, 11]


def test_files_metric_counts_only_surviving_buckets(sorted_table):
    """ADVICE r2: `Files: k/n` must measure zone-map skipping alone —
    bucket-pruned files are not candidates, so they don't inflate n."""
    sorted_table.scan(where="grp = 3 AND v BETWEEN 100 AND 199").collect()
    kept, total = sorted_table.last_file_skip
    assert total == 3  # one bucket survives pruning × 3 file generations
    assert kept == 1   # one generation overlaps [100, 199]


def test_rowid_offsets_from_snapshot(sorted_table):
    offs = dict(sorted_table._file_rowid_offsets())
    assert len(offs) == 12
    # per-bucket offsets are cumulative and start at 0
    by_bucket = {}
    for path, off in sorted(offs.items()):
        b = path.split(f"{BUCKET_COL}=")[1].split("/")[0]
        by_bucket.setdefault(b, []).append(off)
    for b, vals in by_bucket.items():
        assert vals[0] == 0 and vals == sorted(vals)


def test_snapshot_isolation_across_cow(sorted_table, mpp):
    """A reader planned on snapshot vN still executes correctly after a COW
    rewrite publishes vN+1 — old files stay on disk until vacuum, so no
    directory rename can yank data out from under an in-flight scan."""
    df = sorted_table.scan(where="v < 50")  # planned against current snapshot
    from duckdb_mpp_spark import dml

    assert dml.update(sorted_table, {"k": "k + 1000"}, "v >= 200") == 100
    assert df.count() == 50  # pre-rewrite plan still executes


def test_vacuum_prunes_commit_log(sorted_table):
    sorted_table.vacuum(keep_commits=1)
    vs = manifest._list_versions(sorted_table.path)
    assert len(vs) == 1
    assert vs[0] == manifest.current_version(sorted_table.path)
    # table still scans fine off the retained head
    assert sorted_table.scan().count() == 300


def test_stat_encoding_round_trip():
    cases = [
        7,
        -(2**55 + 3),
        1.5,
        "abc",
        datetime.date(2024, 1, 2),
        datetime.datetime(2024, 1, 2, 23, 30, 15),
    ]
    for v in cases:
        assert manifest._dec(manifest._enc(v)) == v
    assert manifest._enc(object()) is None
    assert manifest._dec(None) is None
