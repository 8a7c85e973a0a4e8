"""Per-file metadata manifest (manifest.py) — the persisted footer cache
behind zone-map skipping and rowid offsets.

Contract: the manifest is an advisory cache reconciled against the
directory listing; footers are opened only for unseen files, entries for
vanished files are dropped, and a corrupt manifest rebuilds. Scans must
produce identical results whether the manifest is fresh, stale, or absent.
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


def test_insert_persists_manifest(sorted_table):
    p = os.path.join(sorted_table.path, manifest.MANIFEST_FILE)
    assert os.path.exists(p)
    doc = json.load(open(p))
    # 3 inserts × 4 buckets, every entry carries rows + sort-col min/max
    assert len(doc) == 12
    for ent in doc.values():
        assert ent["rows"] > 0
        assert ent["min"] is not None and ent["max"] is not None


def test_refresh_is_incremental(sorted_table, monkeypatch):
    """A refresh with no file changes must open zero footers."""
    opened = []
    real = manifest.file_entry
    monkeypatch.setattr(
        manifest, "file_entry", lambda p, c: opened.append(p) or real(p, c)
    )
    manifest.refresh(sorted_table.path, BUCKET_COL, "v")
    assert opened == []


def test_manifest_reconciles_external_changes(sorted_table, spark):
    """Files added/removed outside the write paths (or a deleted manifest)
    are reconciled on the next refresh, and scans stay correct."""
    os.remove(os.path.join(sorted_table.path, manifest.MANIFEST_FILE))
    got = rows(sorted_table.scan(where="v >= 150 AND v < 153"), "k")
    assert [r[1] for r in got] == [150, 151, 152]
    doc = json.load(open(os.path.join(sorted_table.path, manifest.MANIFEST_FILE)))
    assert len(doc) == 12


def test_corrupt_manifest_rebuilds(sorted_table):
    with open(os.path.join(sorted_table.path, manifest.MANIFEST_FILE), "w") as f:
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


def test_rowid_offsets_from_manifest(sorted_table):
    offs = dict(sorted_table._file_rowid_offsets())
    assert len(offs) == 12
    # per-bucket offsets are cumulative and start at 0
    by_bucket = {}
    for path, off in sorted(offs.items()):
        b = path.split(f"{BUCKET_COL}=")[1].split("/")[0]
        by_bucket.setdefault(b, []).append(off)
    for b, vals in by_bucket.items():
        assert vals[0] == 0 and vals == sorted(vals)


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
