"""Regression tests for the r11 hostile multimodal/graph sweep findings
(scripts/hostile_multimodal_graph.py; VERDICT r10 #6).

1. multimodal.py — ``decode_sgm_features`` survives CORRUPT payloads
   whose magic matches a registered decoder (truncated pixel buffer,
   header-only prefix, short header, channels overflow): each yields a
   NULL-feature row. Before the fix the decoder's ValueError escaped the
   mapInPandas batch loop and aborted the task — one bit-rotted blob
   would kill a 100 TB decode pass.
2. graph.py — ``triangles`` drops self-loops and NULL endpoints before
   orientation. A self-loop survived the (lo,hi) canonicalization as a
   degenerate u==v oriented edge and fabricated (a,a,b) "triangles" with
   every real neighbor; NULL endpoints hit the same path because Spark's
   least/greatest IGNORE NULLs, canonicalizing (NULL,x) to (x,x).
"""

import pytest

from duckdb_mpp_spark.operators.graph import triangle_counts, triangles
from duckdb_mpp_spark.operators.multimodal import (
    SGM_MAGIC, decode_sgm_features, encode_sgm,
)


def test_decode_survives_corrupt_magic_matching_payloads(spark):
    valid = encode_sgm(2, 2, 1, bytes([10, 20, 30, 40]))
    payloads = [
        valid,            # 0: decodes
        valid[:-2],       # 1: truncated pixel buffer
        valid[:9],        # 2: header-only (declares 4 pixels, has 0)
        SGM_MAGIC + b"\x00",          # 3: shorter than the header itself
        valid[:8] + bytes([255]),     # 4: channels overflow (w*h*255)
        None,             # 5: NULL binary cell
        b"",              # 6: empty
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in decode_sgm_features(df).collect()}
    assert len(rows) == 7, "every input row must come out exactly once"
    assert rows[0]["width"] == 2 and rows[0]["mean_pixel"] == 25
    for i in range(1, 7):
        assert rows[i]["width"] is None, f"payload {i} must degrade to NULLs"


def test_triangles_ignore_self_loops(spark):
    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (1, 3), (5, 5)], "doc_a long, doc_b long"
    )
    got = sorted(map(tuple, triangles(edges).collect()))
    assert got == [(1, 2, 3)], f"self-loops fabricated triangles: {got}"
    counts = {r["doc_id"]: r["n_triangles"]
              for r in triangle_counts(edges).collect()}
    assert counts == {1: 1, 2: 1, 3: 1}


def test_triangles_ignore_null_endpoints(spark):
    rows = [(1, 2), (None, 2), (1, None), (2, 3), (1, 3)]
    edges = spark.createDataFrame(rows, "doc_a long, doc_b long")
    got = sorted(map(tuple, triangles(edges).collect()))
    assert got == [(1, 2, 3)], f"NULL endpoints fabricated triangles: {got}"


def test_triangles_clean_graph_unchanged(spark):
    # the guard must not change clean-input results: K4 has 4 triangles
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "doc_a long, doc_b long",
    )
    assert triangles(edges).count() == 4
