"""lm_fluency_scores — CCNet-style bigram-LM fluency scoring in exact
integer arithmetic (Stupid Backoff, alpha = 2/5, LM_SCALE quantum).

Built in r13, gate registration deferred to r14 (the r13 rotation window
is exactly full) — this file is the correctness evidence until then: an
independent pure-Python recomputation of the scoring on crafted corpora
(the drift-audit convention), edge semantics (NULL/empty/single-token
docs, NULL ids, duplicate-id pooling, OOV, backoff), and exact value
equality against the DuckDB oracle on crafted parquet and the real
sf0.001 documents table.
"""

import hashlib
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mpp_spark.operators.lm import (
    LM_SCALE,
    lm_fluency_gate_fn,
    lm_fluency_oracle_sql,
    lm_fluency_scores,
)

TRAIN_CUT = int(0.8 * 65536)
VALID_CUT = int(0.9 * 65536)


def _split_of(doc_id) -> str:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
    return "train" if h < TRAIN_CUT else ("valid" if h < VALID_CUT else "test")


def _ids_by_split(n=3000):
    out = {"train": [], "valid": [], "test": []}
    for i in range(n):
        out[_split_of(i)].append(i)
    return out


def _toks(text):
    if text is None:
        return []
    return [w for w in text.lower().strip().split(" ") if w]


def _expected(rows):
    """Independent recomputation: the operator's contract in 15 lines of
    pure Python (deliberate drift audit — NOT calling the module)."""
    ref = [_toks(t) for i, t in rows if _split_of(i) == "valid"]
    c2, c1, tot = {}, {}, 0
    for ws in ref:
        tot += len(ws)
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    pooled = {}
    for i, t in rows:
        pooled.setdefault(i, []).append(_toks(t))
    out = {}
    for i, wss in pooled.items():
        nb, ssum = 0, 0
        for ws in wss:
            for a, b in zip(ws, ws[1:]):
                nb += 1
                if c2.get((a, b), 0) > 0 and c1.get(a, 0) > 0:
                    ssum += (LM_SCALE * c2[(a, b)]) // c1[a]
                elif c1.get(b, 0) > 0:
                    ssum += (2 * LM_SCALE * c1[b]) // (5 * max(tot, 1))
        out[i] = (nb, ssum // max(nb, 1))
    return out


def _check(spark, rows, schema="doc_id long, text string"):
    got = {
        r[0]: (r.n_bigrams, r.fluency_q)
        for r in lm_fluency_scores(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert got == _expected(rows)
    return got


def test_seen_bigram_backoff_and_oov_paths(spark):
    ids = _ids_by_split()
    va = ids["valid"][0]
    tr = ids["train"][0]
    rows = [
        (va, "the cat sat on the mat"),     # reference doc
        (tr, "the cat sat"),                # both bigrams seen
        (ids["train"][1], "dog the"),       # bigram unseen, w2 'the' seen
        (ids["train"][2], "zz qq"),         # full OOV -> 0
    ]
    got = _check(spark, rows)
    assert got[ids["train"][2]] == (1, 0)
    assert got[tr][1] > got[ids["train"][1]][1] > 0, (
        "seen-bigram docs must outscore backoff docs, backoff must beat OOV"
    )


def test_empty_null_and_single_token_docs_score_zero(spark):
    ids = _ids_by_split()
    rows = [
        (ids["valid"][0], "a b c a b"),
        (ids["train"][0], ""),
        (ids["train"][1], None),
        (ids["train"][2], "solo"),
    ]
    got = _check(spark, rows)
    for i in (ids["train"][0], ids["train"][1], ids["train"][2]):
        assert got[i] == (0, 0)


def test_null_id_kept_and_duplicate_ids_pool(spark):
    ids = _ids_by_split()
    rows = [
        (ids["valid"][0], "a b c a b"),
        (None, "a b"),
        (ids["train"][0], "a b"),
        (ids["train"][0], "b c"),   # duplicate id: bigrams pool
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r[0]: (r.n_bigrams, r.fluency_q) for r in lm_fluency_scores(df).collect()}
    assert None in got, "NULL doc_id row dropped (the budget_select bug class)"
    assert got[None][0] == 1
    assert got[ids["train"][0]][0] == 2, "duplicate-id rows did not pool"
    assert len(got) == 3  # one row per DISTINCT id


def test_ref_filter_override_trains_on_everything(spark):
    ids = _ids_by_split()
    tr = ids["train"][0]
    docs = spark.createDataFrame(
        [(tr, "x y x y")], "doc_id long, text string"
    )
    # default: no valid docs -> model empty -> score 0
    assert lm_fluency_scores(docs).collect()[0].fluency_q == 0
    # explicit all-rows reference: 'x y' seen twice, c1(x)=2 -> high score
    scored = lm_fluency_scores(docs, ref_filter=F.lit(True)).collect()[0]
    assert scored.fluency_q > 0


def _oracle_rows(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    return sorted(
        tuple(r) for r in con.execute(lm_fluency_oracle_sql).fetchall()
    )


def test_matches_duckdb_oracle_on_crafted_corpus(spark, tmp_path):
    ids = _ids_by_split()
    rows = (
        [(ids["valid"][j], f"the cat {j} sat on the mat again and again")
         for j in range(4)]
        + [(ids["train"][j], "the cat sat on a hat") for j in range(3)]
        + [(ids["test"][0], ""), (ids["test"][1], "solo"),
           (ids["train"][10], "zz oov only qq")]
    )
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    want = _oracle_rows(path + "/*.parquet")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.fluency_q)
        for r in lm_fluency_scores(spark.read.parquet(path)).collect()
    )
    assert got == want


def test_matches_duckdb_oracle_on_sf0001_documents(spark):
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    want = _oracle_rows(f"{sf}/documents.parquet")
    got = [
        (r.doc_id, r.n_bigrams, r.fluency_q)
        for r in lm_fluency_gate_fn(spark, sf).collect()
    ]
    assert got == want
    # the valid slice is ~10% of the corpus and shares its token
    # distribution: real docs must mostly score nonzero or the model
    # stopped seeing the corpus
    nz = sum(1 for _, nb, fq in got if nb > 0 and fq > 0)
    assert nz > len(got) // 2
