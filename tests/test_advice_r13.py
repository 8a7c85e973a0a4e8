"""Regression tests for the ADVICE-r12 findings fixed in round 13.

1. curation.py budget_select — a NULL doc_id landing in the boundary
   quality bucket was silently DROPPED: md5(NULL) made the two-phase
   prefix key `_pfx` NULL, and the inner equi-join `loc.join(cumo,
   "_pfx")` eliminated the row (21 in -> 20 out), violating the
   one-row-per-input-row contract and diverging from the DuckDB oracle.
   Fixed by coalescing the prefix to 'zz' (sorts after every hex pair —
   exactly where ORDER BY md5 ASC NULLS LAST places the row).
2. substrings.py cut_spans oracle — on duplicate doc_ids the oracle
   joined `kept` back against the UN-folded `words` (multiplying
   COUNT/string_agg by the number of same-id rows, grouping per
   len(ws)), while the Spark operator folds duplicate ids into one row.
   Fixed by pre-folding `words` into a per-id `totals` CTE and breaking
   string_agg position ties on tok (matching array_sort(struct(p,tok))).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.curation import budget_select
from duckdb_mpp_spark.operators.substrings import (
    cut_duplicated_spans,
    cut_spans_oracle_sql,
)


def _nsafe(t):
    """Sort key for tuples that may contain None (None sorts last)."""
    return tuple((v is None, v) for v in t)


# --- 1. budget_select NULL doc_id in the boundary bucket ---------------------

def _budget_oracle_rows(path):
    from duckdb_mpp_spark.operators.curation import budget_select_oracle_sql

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    return sorted(
        (tuple(r) for r in con.execute(budget_select_oracle_sql).fetchall()),
        key=_nsafe,
    )


def test_budget_select_keeps_null_id_row_in_boundary_bucket(spark, tmp_path):
    # every doc identical text -> ONE quality bucket == the boundary
    # bucket, so the NULL-id row MUST take the two-phase prefix-sum path
    rows = [(i, "same exact text for every single doc here") for i in range(20)]
    rows.append((None, "same exact text for every single doc here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = budget_select(docs).collect()
    assert len(out) == 21, (
        "NULL doc_id row dropped from the boundary bucket (ADVICE r12 #1)"
    )
    # and the NULL-id row got a real verdict, not a NULL one
    null_rows = [r for r in out if r.doc_id is None]
    assert len(null_rows) == 1 and null_rows[0].selected is not None


def test_budget_select_null_id_matches_duckdb_oracle(spark, tmp_path):
    # value equality including the NULL-id row's selected verdict: the
    # 'zz' prefix group must sort where the oracle's NULLS LAST does
    rows = [(i, "same exact text for every single doc here") for i in range(20)]
    rows.append((None, "same exact text for every single doc here"))
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    want = _budget_oracle_rows(path)
    got = sorted(
        ((r.doc_id, r.n_tokens, r.quality_q, r.selected)
         for r in budget_select(spark.read.parquet(path)).collect()),
        key=_nsafe,
    )
    assert got == want


def test_budget_select_null_id_mixed_buckets_oracle_equal(spark, tmp_path):
    # NULL id in a multi-bucket corpus (boundary bucket is a strict
    # subset); also re-pins the original crafted-matrix shape with the
    # NULL-id row added
    rows = (
        [(i, "The quick brown fox jumps over the lazy dog repeatedly "
             f"as observer {i} takes notes on it.") for i in range(10)]
        + [(100 + i, "zz " * (5 + i)) for i in range(10)]
        + [(None, "zz zz zz zz zz zz zz"), (201, None), (202, "short one")]
    )
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    want = _budget_oracle_rows(path)
    got = sorted(
        ((r.doc_id, r.n_tokens, r.quality_q, r.selected)
         for r in budget_select(spark.read.parquet(path)).collect()),
        key=_nsafe,
    )
    assert got == want
    assert len(got) == len(rows)


# --- 2. cut_spans oracle on duplicate doc_ids --------------------------------

def _cut_rows(df):
    return sorted(
        ((r.doc_id, r.n_tokens, r.n_kept, r.n_removed, r.text_cleaned)
         for r in df.collect()),
        key=_nsafe,
    )


def _cut_oracle_rows(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    return sorted(
        (tuple(r) for r in con.execute(cut_spans_oracle_sql()).fetchall()),
        key=_nsafe,
    )


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly k=8 words


def test_cut_spans_oracle_matches_operator_on_duplicate_ids(spark, tmp_path):
    rows = [
        # duplicate id, disjoint texts, one sharing a cross-doc 8-gram:
        # the OLD oracle's unfolded words join multiplied kept counts by
        # 2 here and could drive n_removed negative (ADVICE r12 #2)
        (7, f"intro one two {SHARED} outro three"),
        (7, "second row same id more words beyond eight total"),
        (8, f"{SHARED} tail four five six seven"),
        # duplicate id, both rows shorter than k: two tokens at the SAME
        # position p exercise the string_agg (p, tok) tiebreak
        (9, "aaa bbb"),
        (9, "ccc ddd"),
        # unique doc untouched + zero-token dup pair
        (10, "unique words only here nothing shared at all"),
        (11, ""),
        (11, None),
    ]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    want = _cut_oracle_rows(path)
    got = _cut_rows(cut_duplicated_spans(spark.read.parquet(path)))
    assert got == want
    by_id = {t[0]: t for t in got}
    # folded contract: one row per distinct id, summed n_tokens,
    # n_removed never negative
    assert len(got) == 5
    assert by_id[7][1] == 22 and by_id[7][3] >= 0
    assert by_id[9] == (9, 4, 4, 0, "aaa ccc bbb ddd")
    assert by_id[11] == (11, 0, 0, 0, "")


def test_cut_spans_oracle_unchanged_on_unique_ids(spark, tmp_path):
    # the fix must be value-identical in the unique-id regime the r13
    # gate runs in (same crafted corpus as test_cut_spans.py)
    rows = [
        (1, f"intro one two {SHARED} outro three"),
        (2, f"{SHARED} tail four five six seven"),
        (3, "p q r s t u v w " + "p q r s t u v w"),
        (4, "tiny doc"),
        (5, "tiny doc"),
        (6, ""),
    ]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    assert _cut_oracle_rows(path) == _cut_rows(
        cut_duplicated_spans(spark.read.parquet(path))
    )


def test_budget_select_multiple_null_ids_deterministic_multiset(spark):
    # review r13: with >=2 NULL-id rows in the boundary bucket, _m and
    # doc_id both tie at NULL — without the n_tokens tiebreak the partial
    # sums land on rows nondeterministically. The construction forces a
    # REAL tie: identical word composition (equal ratios) at saturated
    # length (the quality length term caps at 100 tokens) gives the two
    # NULL rows the SAME quality_q with DIFFERENT n_tokens, and the
    # budget boundary falls between them — so the n_tokens-asc tiebreak
    # is the only thing deciding which gets selected.
    pat = "the cat runs fast"
    t100, t120 = " ".join([pat] * 25), " ".join([pat] * 30)
    rows = [(i, t100) for i in range(10)] + [(None, t100), (None, t120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # total = 1220 tokens; B = (19*1220) div 20 = 1159: the ten id'd docs
    # (cum 1000) and the 100-token NULL row (cum 1100) fit, the 120-token
    # NULL row (cum 1220) does not.
    for _ in range(3):  # nondeterminism hunts need repeats
        out = budget_select(docs, budget_num=19, budget_den=20).collect()
        assert len(out) == 12
        assert all(r.selected for r in out if r.doc_id is not None)
        nulls = sorted(
            ((r.n_tokens, r.selected) for r in out if r.doc_id is None)
        )
        assert nulls == [(100, True), (120, False)], (
            f"NULL-id tie resolved against the n_tokens tiebreak: {nulls}"
        )
