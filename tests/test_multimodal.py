"""Multimodal plumbing: binary payload round-trip, resize contract,
frame sampling, and the decode stub's explicit NotImplementedError."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.multimodal import (
    decode_media,
    resize_media,
    sample_frames,
    with_binary_payload,
)
from duckdb_mpp_spark.sources import load_table

SF_DIR = os.environ.get("MPP_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_real_decode_is_marked_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG")


def test_resize_contract(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = resize_media(with_binary_payload(docs), 8, 4)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "meta"]
    rows = out.select(F.length("payload").alias("n"), "meta.width", "meta.height").collect()
    assert rows and all(r.n == 32 and r.width == 8 and r.height == 4 for r in rows)


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    frames = sample_frames(with_binary_payload(docs))
    # every sampled frame index is a stride multiple; per-doc frame count
    # matches ceil(len/16) sampled at stride 4
    per_doc = {r.doc_id: r.cnt for r in frames.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    lens = {r.doc_id: r.n for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    import math

    for doc_id, n in lens.items():
        expected = len(range(0, math.ceil(n / 16), 4))
        assert per_doc.get(doc_id, 0) == expected
    assert frames.where(F.col("frame_idx") % 4 != 0).count() == 0
