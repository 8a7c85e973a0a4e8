"""semdedup — SemDeDup semantic deduplication within embedding cells
(Abbas et al. 2023), min-id canonical representative.

Built in r13, gate registration deferred to r14 (the r13 rotation window
is exactly full). Evidence: crafted geometry (exact duplicates in one
cell vs split across cells, below-threshold neighbors, the greedy chain
case, dead zero-norm vectors) and exact value equality against the
DuckDB oracle on the real sf0.001 embeddings table.
"""

import os

import duckdb
import pytest

from duckdb_mpp_spark.operators.similarity import (
    semdedup,
    semdedup_gate_fn,
    semdedup_oracle_sql,
)

DIM = 64


def _vec(base, eps=0.0, j=1):
    v = [0.0] * DIM
    v[base] = 1.0
    v[(base + j) % DIM] = eps
    return v


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _kept(spark, rows, **kw):
    return {r.vec_id: r.kept for r in semdedup(_emb(spark, rows), **kw).collect()}


def test_identical_vectors_same_cell_keep_min_id(spark):
    rows = [(3, _vec(0), 0), (7, _vec(0), 0), (11, _vec(0), 0),
            (20, _vec(30), 0)]  # orthogonal cellmate survives
    kept = _kept(spark, rows)
    assert kept == {3: True, 7: False, 11: False, 20: True}


def test_identical_vectors_in_different_cells_both_kept(spark):
    # SemDeDup's documented miss: cross-cluster duplicates are out of
    # scope by design — the cell join must NOT find them
    rows = [(1, _vec(0), 0), (2, _vec(0), 1)]
    assert _kept(spark, rows) == {1: True, 2: True}


def test_below_threshold_neighbors_kept(spark):
    # clearly separated directions: cos = 1/sqrt(2) ~ 0.707 < 0.95
    a = _vec(0)
    b = [x / (2 ** 0.5) for x in _vec(0)]
    b[1] = 1.0 / (2 ** 0.5)
    rows = [(1, a, 0), (2, b, 0)]
    assert _kept(spark, rows) == {1: True, 2: True}


def test_greedy_chain_drops_by_lower_id_even_if_dropped(spark):
    # a(1)~b(2) and b(2)~c(3) but a!~c: the greedy min-id rule drops BOTH
    # b (via a) and c (via b, itself dropped) — the documented variant
    theta_ab = 0.18  # cos(a,b) ~ 0.984 >= .95
    a = _vec(0)
    import math
    b = [0.0] * DIM; b[0] = math.cos(theta_ab); b[1] = math.sin(theta_ab)
    c = [0.0] * DIM; c[0] = math.cos(2 * theta_ab); c[1] = math.sin(2 * theta_ab)
    rows = [(1, a, 0), (2, b, 0), (3, c, 0)]
    kept = _kept(spark, rows)
    assert kept[1] is True and kept[2] is False
    assert kept[3] is False, "chain member must drop via its dropped neighbor"


def test_zero_norm_vector_inert(spark):
    # cosine with a dead vector is NULL (review r4 convention): it must
    # neither drop others nor be dropped
    rows = [(1, [0.0] * DIM, 0), (2, _vec(0), 0), (3, _vec(0), 0)]
    assert _kept(spark, rows) == {1: True, 2: True, 3: False}


def test_matches_duckdb_oracle_on_sf0001_embeddings(spark):
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        pytest.skip("testdata not present")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(semdedup_oracle_sql).fetchall())
    got = sorted(
        (r.vec_id, r.cell, r.kept)
        for r in semdedup_gate_fn(spark, sf).collect()
    )
    assert got == want
    n_drop = sum(1 for t in got if not t[2])
    assert 0 < n_drop < len(got), (
        "fixture must exercise both verdicts (the corpus has engineered "
        "near-duplicate embeddings)"
    )
