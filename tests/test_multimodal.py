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


def test_sgm_roundtrip_and_errors():
    from duckdb_mpp_spark.operators.multimodal import (
        SGM_MAGIC,
        decode_sgm,
        encode_sgm,
        register_decoder,
    )

    pixels = bytes(range(12))
    payload = encode_sgm(4, 3, 1, pixels)
    assert payload.startswith(SGM_MAGIC)
    img = decode_media(payload)  # dispatches through the registry
    assert (img["width"], img["height"], img["channels"]) == (4, 3, 1)
    assert img["pixels"] == pixels

    with pytest.raises(ValueError, match="pixel buffer"):
        encode_sgm(4, 3, 1, bytes(5))
    with pytest.raises(ValueError, match="magic"):
        decode_sgm(b"XXXX" + payload[4:])
    with pytest.raises(ValueError, match="header declares"):
        decode_media(payload[:-1])  # truncated pixel buffer
    with pytest.raises(ValueError, match="shorter than"):
        decode_sgm(b"SG")

    # pluggable: an unknown magic becomes decodable after registration
    register_decoder(b"FAKE", lambda b: {"width": 1, "height": 1, "channels": 1, "pixels": b[4:5]})
    assert decode_media(b"FAKEz")["pixels"] == b"z"


def test_sgm_decode_pipeline(spark):
    from duckdb_mpp_spark.operators.multimodal import (
        decode_sgm_features,
        encode_sgm_images,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = decode_sgm_features(encode_sgm_images(docs)).collect()
    lens = {r.doc_id: r.n for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    assert len(out) == len(lens)
    for r in out:
        n = lens[r.doc_id]
        assert r.width == 1 + n % 16 and r.height == 1 + (n // 16) % 16
        assert r.n_pixels == r.width * r.height and 0 <= r.mean_pixel <= 255
