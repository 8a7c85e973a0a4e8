"""Persisted band-key-bucketed index (r7) — the storage half of
incremental dedup's daily-crawl contract.

Covers: write/read roundtrip fidelity, genuine partition pruning (the
bucket filter must reach the file index as a PartitionFilter, not a
post-scan filter), append-mode daily union-in, and value-identity of the
gate path against the in-memory formulation.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.dedup import (
    band_bucket_expr,
    incremental_dedup,
    minhash_bands,
    read_band_index,
    write_band_index,
)
from duckdb_mpp_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_text(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def bands(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return minhash_bands(docs).localCheckpoint()


@pytest.fixture()
def index_dir():
    d = tempfile.mkdtemp(prefix="band_index_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("doc_id", "band", "band_key").collect()
    )


def test_roundtrip(spark, bands, index_dir):
    write_band_index(bands, index_dir)
    back = read_band_index(spark, index_dir)
    assert _rows(back) == _rows(bands)


def test_bucket_pruning_reaches_file_index(spark, bands, index_dir):
    write_band_index(bands, index_dir)
    # a single-doc batch touches at most N_BANDS buckets of 64
    one = bands.where(F.col("doc_id") == bands.agg(F.min("doc_id")).collect()[0][0])
    pruned = read_band_index(spark, index_dir, batch_bands=one)
    p = plan_text(pruned)
    assert "band_bucket" in p and "PartitionFilters" in p, p
    # the pruned read must return exactly the hit buckets' contents
    hit = {r[0] for r in one.select(band_bucket_expr().alias("b")).distinct().collect()}
    assert len(hit) <= 4
    expect = _rows(
        bands.where(band_bucket_expr().isin(list(hit)))
    )
    assert _rows(pruned) == expect


def test_append_mode_unions_new_bands(spark, bands, index_dir):
    old = bands.where(F.col("doc_id") % 2 == 0)
    new = bands.where(F.col("doc_id") % 2 != 0)
    write_band_index(old, index_dir)
    write_band_index(new, index_dir, mode="append")
    assert _rows(read_band_index(spark, index_dir)) == _rows(bands)


def test_incremental_dedup_over_persisted_index_value_identical(
    spark, bands, index_dir
):
    batch = bands.where(F.col("doc_id") % 7 == 0)
    idx_mem = bands.where(F.col("doc_id") % 7 != 0)
    write_band_index(idx_mem, index_dir)
    idx_disk = read_band_index(spark, index_dir, batch_bands=batch)
    got = sorted(
        tuple(r) for r in incremental_dedup(idx_disk, batch).collect()
    )
    want = sorted(
        tuple(r) for r in incremental_dedup(idx_mem, batch).collect()
    )
    assert got == want and len(got) > 0


def test_min_doc_only_layout_lossless_for_verdicts(spark, bands, index_dir):
    """min-doc-per-key storage (the gate layout) must yield identical
    verdicts AND identical dup_of ids, including across append
    generations (several per-key min rows)."""
    batch = bands.where(F.col("doc_id") % 7 == 0)
    idx_mem = bands.where(F.col("doc_id") % 7 != 0)
    # two append generations, split mid-corpus
    g1 = idx_mem.where(F.col("doc_id") % 3 == 1)
    g2 = idx_mem.where(F.col("doc_id") % 3 != 1)
    write_band_index(g1, index_dir, n_buckets=8, min_doc_only=True)
    write_band_index(g2, index_dir, n_buckets=8, mode="append", min_doc_only=True)
    idx_disk = read_band_index(spark, index_dir, batch_bands=batch, n_buckets=8)
    got = sorted(
        tuple(r)
        for r in incremental_dedup(idx_disk, batch, prefilter=False).collect()
    )
    want = sorted(
        tuple(r) for r in incremental_dedup(idx_mem, batch).collect()
    )
    assert got == want and len(got) > 0


def test_append_schema_drift_rejected_and_hint_preserved(spark, bands, index_dir):
    """r10 (review): the layout meta records the DATA schema so reads skip
    footer inference. Appends must NEVER rewrite that hint with their own
    frame's schema (it must describe every generation's files) — a
    type-drifted appender is rejected loudly, and a clean append leaves
    the recorded hint intact."""
    import json
    import os

    from duckdb_mpp_spark.operators.dedup import _BAND_INDEX_META

    g1 = bands.where(F.col("doc_id") % 3 == 1)
    write_band_index(g1, index_dir, n_buckets=8)
    meta_path = os.path.join(index_dir, _BAND_INDEX_META)
    with open(meta_path) as f:
        recorded = json.load(f)["schema"]
    assert recorded  # overwrite recorded the hint

    # clean append: same columns/types -> accepted, hint unchanged
    g2 = bands.where(F.col("doc_id") % 3 != 1)
    write_band_index(g2, index_dir, n_buckets=8, mode="append")
    with open(meta_path) as f:
        assert json.load(f)["schema"] == recorded

    # drifted append: doc_id INT vs the layout's BIGINT -> loud rejection
    drifted = g2.withColumn("doc_id", F.col("doc_id").cast("int"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed-schema"):
        write_band_index(drifted, index_dir, n_buckets=8, mode="append")
