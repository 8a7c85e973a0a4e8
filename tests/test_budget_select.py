"""budget_select — exact token-budget corpus selection without a global
sort (quality-histogram metadata cumsum + two-phase md5-ordered prefix
sum over only the boundary quality bucket).

Built in r12, gate registration deferred to r13 (rotation frozen,
VERDICT r11 #2): this file is the correctness evidence — semantics
matrix, the all-one-quality worst case that defeats a naive global
window, and exact value equality against the DuckDB oracle on crafted
parquet and the real sf0.001 documents table.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.curation import (
    budget_select,
    budget_select_gate_fn,
    budget_select_oracle_sql,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_budget_semantics(spark):
    # high-quality docs selected first; budget 3/10 of total tokens
    hi = "The quick brown fox jumps over the lazy dog and then the " \
         "other animals watch it with great interest for a while."
    lo = "zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz"
    docs = _mk(spark, [(1, hi), (2, hi + " More of the same here."),
                       (3, lo), (4, lo), (5, lo), (6, lo), (7, lo)])
    out = {r.doc_id: r for r in budget_select(docs).collect()}
    assert len(out) == 7
    total = sum(r.n_tokens for r in out.values())
    budget = (3 * total) // 10
    picked = sum(r.n_tokens for r in out.values() if r.selected)
    assert picked <= budget
    # the selected set is a prefix of the quality order: every selected
    # doc's quality >= every unselected doc's quality, except inside the
    # boundary bucket
    sel_q = [r.quality_q for r in out.values() if r.selected]
    unsel_q = [r.quality_q for r in out.values() if not r.selected]
    if sel_q and unsel_q:
        assert max(unsel_q) <= max(sel_q)


def test_budget_covers_everything_selects_everything(spark):
    docs = _mk(spark, [(i, f"some words here {i}") for i in range(10)])
    out = budget_select(docs, budget_num=10, budget_den=1).collect()
    assert all(r.selected for r in out)


def test_zero_budget_selects_nothing(spark):
    docs = _mk(spark, [(i, f"some words here {i}") for i in range(10)])
    out = budget_select(docs, budget_num=0, budget_den=1).collect()
    assert not any(r.selected for r in out)


def test_empty_input(spark):
    docs = _mk(spark, []).where("1=0")
    assert budget_select(docs).count() == 0


def test_all_one_quality_worst_case_still_exact(spark):
    # every doc identical text -> ONE quality bucket = the boundary
    # bucket = the whole corpus; the two-phase md5 split must still
    # produce the exact greedy prefix
    docs = _mk(spark, [(i, "same exact text for every single doc here")
                       for i in range(200)])
    out = budget_select(docs).collect()
    total = sum(r.n_tokens for r in out)
    budget = (3 * total) // 10
    picked = [r for r in out if r.selected]
    assert sum(r.n_tokens for r in picked) <= budget
    # maximal prefix: adding ANY one more doc would exceed the budget
    per_doc = out[0].n_tokens
    assert (len(picked) + 1) * per_doc > budget
    # and the choice is the md5-order prefix, not arbitrary
    import hashlib
    order = sorted(
        (r.doc_id for r in out),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    want = set(order[: len(picked)])
    assert {r.doc_id for r in picked} == want


def _oracle_rows(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    return sorted(tuple(r) for r in
                  con.execute(budget_select_oracle_sql).fetchall())


def test_matches_duckdb_oracle_on_crafted_corpus(spark, tmp_path):
    rows = (
        [(i, "The quick brown fox jumps over the lazy dog repeatedly "
             f"as observer {i} takes notes on it.") for i in range(10)]
        + [(100 + i, "zz " * (5 + i)) for i in range(10)]
        + [(200, ""), (201, None), (202, "short one")]
    )
    path = str(tmp_path / "docs.parquet")
    _mk(spark, rows).write.parquet(path)
    want = _oracle_rows(path + "/*.parquet")
    got = sorted(
        (r.doc_id, r.n_tokens, r.quality_q, r.selected)
        for r in budget_select(spark.read.parquet(path)).collect()
    )
    assert got == want


def test_matches_duckdb_oracle_on_sf0001_documents(spark):
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    want = _oracle_rows(f"{sf}/documents.parquet")
    got = sorted(
        (r.doc_id, r.n_tokens, r.quality_q, r.selected)
        for r in budget_select_gate_fn(spark, sf).collect()
    )
    assert got == want
    n_sel = sum(1 for r in got if r[3])
    assert 0 < n_sel < len(got), "budget selection degenerate on the corpus"
