"""ann_recall_at_k — recall@k certificate for the IVF (label-cell) ANN
path, in exact integer arithmetic.

Built in r13, gate registration deferred to r14 (the r13 rotation window
is exactly full). Evidence: crafted geometry where recall is knowable by
construction (cells aligned with true neighborhoods -> 100; a query
whose true neighbors live in ANOTHER cell -> low), edge semantics
(n_exact < k on a tiny corpus, zero-hit queries emit 0 not NULL), and
exact value equality against the DuckDB oracle on the real sf0.001
embeddings table.
"""

import os

import duckdb
import pytest

from duckdb_mpp_spark.operators.similarity import (
    ann_recall_at_k,
    ann_recall_gate_fn,
    ann_recall_oracle_sql,
)

DIM = 64


def _vec(i, base):
    """unit-ish vector near axis `base` with a tiny per-id wiggle"""
    v = [0.0] * DIM
    v[base] = 1.0
    v[(base + 7) % DIM] = 0.001 * (i % 5)
    return v


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_aligned_cells_give_full_recall(spark):
    # 3 cells, each a tight cluster around its own axis: the cell IS the
    # true neighborhood, so cell-restricted search is lossless
    rows = [
        (c * 100 + i, _vec(i, c * 10), c) for c in range(3) for i in range(8)
    ]
    out = {r.qid: r for r in ann_recall_at_k(_emb(spark, rows), k=5).collect()}
    assert out, "no queries matched the vec_id % 50 = 0 slice"
    for r in out.values():
        assert r.n_exact == 5
        assert r.recall_pct == 100, f"aligned cell lost neighbors: {r}"


def test_misassigned_cell_caps_recall(spark):
    # query 0 sits in cell 0 but its TRUE neighbors (same axis) are all
    # labeled cell 1; cell 0 holds only orthogonal vectors -> the
    # cell-restricted search can recover none of the exact top-k
    rows = (
        [(0, _vec(0, 3), 0)]
        + [(100 + i, _vec(i, 3), 1) for i in range(6)]     # true neighbors, other cell
        + [(200 + i, _vec(i, 40), 0) for i in range(6)]    # cellmates, orthogonal
    )
    out = {r.qid: r for r in ann_recall_at_k(_emb(spark, rows), k=5).collect()}
    r = out[0]
    assert r.n_exact == 5
    assert r.n_hit == 0 and r.recall_pct == 0, (
        f"orthogonal cellmates cannot be true top-k hits: {r}"
    )


def test_small_corpus_n_exact_below_k(spark):
    rows = [(0, _vec(0, 1), 0), (50, _vec(1, 1), 0), (7, _vec(2, 1), 0)]
    out = {r.qid: r for r in ann_recall_at_k(_emb(spark, rows), k=10).collect()}
    assert set(out) == {0, 50}
    for r in out.values():
        assert r.n_exact == 2, "n_exact must be the exact side's true size"
        assert r.recall_pct == 100


def test_matches_duckdb_oracle_on_sf0001_embeddings(spark):
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        pytest.skip("testdata not present")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(ann_recall_oracle_sql).fetchall())
    got = sorted(
        (r.qid, r.n_exact, r.n_hit, r.recall_pct)
        for r in ann_recall_gate_fn(spark, sf).collect()
    )
    assert got == want
    # a label-clustered corpus must land strictly between the degenerate
    # extremes in aggregate, or the fixture stopped exercising the trade
    mean = sum(r[3] for r in got) / len(got)
    assert 0 < mean <= 100
